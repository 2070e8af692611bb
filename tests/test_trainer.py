"""End-to-end Trainer smoke test: tiny dataset JSON + images on disk,
two-stage recipe, checkpoint save/resume artifacts."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax

from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.data.dataset import SupervisedDataset, collate
from tokenpacker_tpu.models.vlm import init_vlm
from tokenpacker_tpu.train.step import TrainConfig
from tokenpacker_tpu.train.trainer import RunConfig, Trainer
from tests.test_preprocess import WordTok


class Tok(WordTok):
    def convert_tokens_to_ids(self, t):
        return self._id(t)

    def decode(self, ids, skip_special_tokens=True):
        inv = {v: k for k, v in self.vocab.items()}
        return " ".join(inv.get(i, "?") for i in ids)


@pytest.fixture
def tiny_data(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    records = []
    rng = np.random.default_rng(0)
    for i in range(8):
        name = f"im{i}.png"
        arr = rng.integers(0, 255, (40, 52, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / name)
        records.append(
            {
                "id": str(i),
                "image": name,
                "conversations": [
                    {"from": "human", "value": "<image>\nwhat is this"},
                    {"from": "gpt", "value": f"object {i}"},
                ],
            }
        )
    # two text-only samples
    for i in range(2):
        records.append(
            {
                "id": f"t{i}",
                "conversations": [
                    {"from": "human", "value": "hello"},
                    {"from": "gpt", "value": "hi there"},
                ],
            }
        )
    data_path = tmp_path / "data.json"
    data_path.write_text(json.dumps(records))
    return str(data_path), str(img_dir)


def test_dataset_and_collate(tiny_data):
    data_path, img_dir = tiny_data
    cfg = tiny_vlm_config()
    tok = Tok()
    ds = SupervisedDataset(data_path, tok, image_folder=img_dir, version="v1")
    assert len(ds) == 10
    assert len(ds.lengths) == 10
    assert sum(1 for l in ds.modality_lengths if l < 0) == 2
    # note: tiny config's vision size is 56, but process_image emits 336
    item = ds[0]
    assert item["image"].shape[1:] == (3, 336, 336)
    batch = collate([ds[8], ds[9]], cfg.tokens_per_view, 5, 6, 0)
    assert batch["token_ids"].shape[0] == 2
    assert not batch["is_image"].any()  # text-only samples splice nothing


def test_trainer_two_stage(tiny_data, tmp_path, monkeypatch):
    """Run stage 1 then stage 2 on the tiny config; check artifacts."""
    data_path, img_dir = tiny_data
    cfg = tiny_vlm_config()
    tok = Tok()

    # shrink images to the tiny tower size via a custom dataset subclass
    import tokenpacker_tpu.data.dataset as ds_mod

    class TinyDS(SupervisedDataset):
        def __getitem__(self, i):
            item = super().__getitem__(i)
            if "image" in item:
                s = cfg.vision.image_size
                item["image"] = item["image"][:, :, :s, :s].copy()
            return item

    ds = TinyDS(data_path, tok, image_folder=img_dir, version="v1")
    params = init_vlm(jax.random.PRNGKey(0), cfg)

    out1 = tmp_path / "stage1"
    tcfg = TrainConfig(stage="pretrain", learning_rate=1e-3)
    rcfg = RunConfig(
        output_dir=str(out1),
        per_device_batch_size=1,
        save_steps=100,
        tp=1,
        seq_pad_to=64,
    )
    trainer = Trainer(cfg, tcfg, rcfg, params, ds, tok)
    params_after = trainer.train()
    # stage-1 artifact: reference-format mm_projector.bin
    ckpts = [p for p in os.listdir(out1) if p.startswith("checkpoint-")]
    assert ckpts, "no checkpoint saved"
    assert os.path.exists(os.path.join(out1, ckpts[0], "mm_projector.bin"))

    out2 = tmp_path / "stage2"
    tcfg2 = TrainConfig(stage="finetune", learning_rate=1e-4, mm_projector_lr=2e-4)
    rcfg2 = RunConfig(
        output_dir=str(out2), per_device_batch_size=1, save_steps=100, tp=1, seq_pad_to=64
    )
    trainer2 = Trainer(cfg, tcfg2, rcfg2, jax.device_get(params_after), ds, tok)
    trainer2.train()
    ckpts2 = [p for p in os.listdir(out2) if p.startswith("checkpoint-")]
    assert ckpts2
    assert os.path.isdir(os.path.join(out2, ckpts2[0], "state"))


def test_async_save_resume_roundtrip(tiny_data, tmp_path):
    """Async checkpoint (write overlaps training) commits a readable state:
    params round-trip exactly through save_checkpoint -> try_resume."""
    data_path, img_dir = tiny_data
    cfg = tiny_vlm_config()
    tok = Tok()
    ds = SupervisedDataset(data_path, tok, image_folder=img_dir, version="v1")
    params = init_vlm(jax.random.PRNGKey(1), cfg)

    out = tmp_path / "async-run"
    tcfg = TrainConfig(stage="finetune", learning_rate=1e-4)
    rcfg = RunConfig(output_dir=str(out), per_device_batch_size=1,
                     save_steps=100, tp=1, seq_pad_to=64, async_save=True)
    trainer = Trainer(cfg, tcfg, rcfg, params, ds, tok)
    trainer.save_checkpoint(step=7)  # returns while the write is in flight
    trainer.finish_pending_saves()

    trainer2 = Trainer(cfg, tcfg, rcfg, init_vlm(jax.random.PRNGKey(2), cfg),
                       ds, tok)
    step, _ = trainer2.try_resume()
    assert step == 7
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        trainer2.params, params)
