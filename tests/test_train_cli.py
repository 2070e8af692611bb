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
    for i in range(8):  # one global batch at bs 1 x 8 devices
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

    # the CLI threads cfg.vision.image_size into the dataset natively

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


def test_train_cli_qlora_roundtrip(tmp_path, monkeypatch):
    """--bits 8 --lora-enable end-to-end: QLoRA training over an int8 frozen
    base produces a reference-layout LoRA checkpoint (adapter_model.bin +
    adapter_config.json + non_lora_trainables.bin) that
    api.load_pretrained_model's LoRA branch loads back for generation."""
    import os

    import torch

    import jax.numpy as jnp

    from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX
    from tokenpacker_tpu.io.hf_export import export_vlm_state_dict
    from tokenpacker_tpu.models.splice import build_splice_plan

    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    real_loader = api.load_pretrained_model  # capture BEFORE monkeypatching

    class FakeLoaded:
        def __init__(self):
            self.params = params
            self.config = cfg
            self.generator = Generator(params, cfg, Tok())

    monkeypatch.setattr(
        api, "load_pretrained_model",
        lambda *a, **k: (Tok(), FakeLoaded(), None, cfg.model_max_length),
    )
    # quantize threshold below tiny kernel sizes
    import functools

    import tokenpacker_tpu.ops.quantize as qmod

    orig_q = qmod.quantize_tree
    monkeypatch.setattr(qmod, "quantize_tree", functools.partial(orig_q, min_size=1024))

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    records = []
    for i in range(16):  # >= global batch (1 per device x 8 devices)
        name = f"{i}.png"
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(img_dir / name)
        records.append({
            "image": name,
            "conversations": [
                {"from": "human", "value": "<image>\ncaption please"},
                {"from": "gpt", "value": f"thing {i}"},
            ],
        })
    data = tmp_path / "data.json"
    data.write_text(json.dumps(records))

    # the CLI passes cfg.vision.image_size into the dataset, so tiny-tower
    # preprocessing needs no monkeypatching
    out = tmp_path / "qlora_run"
    import tokenpacker_tpu.train.train as train_cli

    train_cli.main([
        "--model-path", "fake", "--data-path", str(data),
        "--image-folder", str(img_dir), "--output-dir", str(out),
        "--stage", "finetune", "--per-device-batch-size", "1",
        "--model-max-length", "64", "--num-train-epochs", "1",
        "--bits", "8", "--lora-enable", "--lora-r", "4", "--lora-alpha", "8",
        "--learning-rate", "1e-3",
    ])
    ckpts = sorted((out).glob("checkpoint-*"))
    assert ckpts, "no LoRA checkpoint written"
    ck = ckpts[-1]
    assert (ck / "adapter_model.bin").exists()
    assert (ck / "adapter_config.json").exists()
    assert (ck / "non_lora_trainables.bin").exists()
    ad = torch.load(ck / "adapter_model.bin", weights_only=True)
    assert any("lora_A" in k for k in ad)

    # round-trip through the public loader's LoRA branch: base dir + adapter
    base_dir = tmp_path / "base"
    base_dir.mkdir()
    sd = export_vlm_state_dict(params, cfg)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
               base_dir / "pytorch_model.bin")
    (base_dir / "config.json").write_text(json.dumps(cfg.to_hf_dict()))
    monkeypatch.setattr(api, "_load_tokenizer", lambda p: Tok())
    monkeypatch.setattr(api.TokenPackerVLMConfig, "from_json",
                        classmethod(lambda c, p: cfg))
    (ck / "config.json").write_text(json.dumps(cfg.to_hf_dict()))
    _, model, _, _ = real_loader(str(ck), model_base=str(base_dir), dtype=jnp.float32)
    # the merged params must differ from the raw base (adapters + trained
    # projector actually loaded)
    d0 = np.abs(
        np.asarray(model.params["projector"]["mlp"]["fc1"]["kernel"], np.float32)
        - np.asarray(params["projector"]["mlp"]["fc1"]["kernel"], np.float32)
    ).max()
    assert d0 > 1e-6, "projector from non_lora_trainables not applied"

    ids = np.array([1, 17, IMAGE_TOKEN_INDEX, 40], dtype=np.int64)
    plan = build_splice_plan([ids], [[(1, 1)]], cfg.tokens_per_view, "single", 7, 8, 0, pad_to=16)
    res = model.generator.generate(
        {
            "token_ids": plan.token_ids,
            "is_image": plan.is_image,
            "image_slot": plan.image_slot,
            "lengths": plan.lengths,
            "images": rng.standard_normal((1, 56, 56, 3)).astype(np.float32),
        },
        max_new_tokens=3,
        temperature=0.0,
    )
    assert len(res.sequences[0]) >= 1
