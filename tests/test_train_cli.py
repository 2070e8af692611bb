"""Training CLI end-to-end: argparse → loader → Trainer on a tiny run."""

import json

import numpy as np
import pytest
from PIL import Image

import jax

import tokenpacker_tpu.api as api
import tokenpacker_tpu.train.train as train_cli
from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.generate import Generator
from tokenpacker_tpu.models.vlm import init_vlm
from tests.test_trainer import Tok


def test_train_cli_runs_stage1(tmp_path, monkeypatch):
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)

    class FakeLoaded:
        def __init__(self):
            self.params = params
            self.config = cfg
            self.generator = Generator(params, cfg, Tok())

    monkeypatch.setattr(
        api,
        "load_pretrained_model",
        lambda *a, **k: (Tok(), FakeLoaded(), None, cfg.model_max_length),
    )

    # tiny dataset with images at the tiny tower size
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    records = []
    for i in range(4):
        name = f"{i}.png"
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(img_dir / name)
        records.append(
            {
                "image": name,
                "conversations": [
                    {"from": "human", "value": "<image>\ncaption please"},
                    {"from": "gpt", "value": f"thing {i}"},
                ],
            }
        )
    data = tmp_path / "data.json"
    data.write_text(json.dumps(records))

    # shrink dataset images to the tiny tower geometry
    import tokenpacker_tpu.data.dataset as ds_mod

    orig = ds_mod.process_image

    def small(img, aspect, patch_num):
        crops, hb, wb = orig(img, aspect, patch_num)
        s = cfg.vision.image_size
        return crops[:, :, :s, :s].copy(), hb, wb

    monkeypatch.setattr(ds_mod, "process_image", small)

    out = tmp_path / "out"
    train_cli.main(
        [
            "--stage", "pretrain",
            "--version", "plain",
            "--model-path", "fake",
            "--data-path", str(data),
            "--image-folder", str(img_dir),
            "--learning-rate", "1e-3",
            "--per-device-batch-size", "1",
            "--model-max-length", "64",
            "--output-dir", str(out),
        ]
    )
    ckpts = list(out.glob("checkpoint-*/mm_projector.bin"))
    assert ckpts, "stage-1 CLI run produced no adapter checkpoint"
