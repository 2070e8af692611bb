"""load_pretrained_model integration: save a tiny checkpoint in the
reference HF layout, load it back through the public API, generate."""

import json
import os

import numpy as np
import pytest
import torch

import jax

import tokenpacker_tpu.api as api
from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX
from tokenpacker_tpu.io.hf_export import export_vlm_state_dict
from tokenpacker_tpu.models.splice import build_splice_plan
from tokenpacker_tpu.models.vlm import init_vlm
from tests.test_trainer import Tok


@pytest.fixture
def checkpoint(tmp_path):
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    sd = export_vlm_state_dict(params, cfg)
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        tmp_path / "pytorch_model.bin",
    )
    d = cfg.to_hf_dict()
    # persist the tiny geometry so from_json reproduces it
    d.update(
        {
            "hidden_size": cfg.lm.hidden_size,
            "intermediate_size": cfg.lm.intermediate_size,
            "num_hidden_layers": cfg.lm.num_hidden_layers,
            "num_attention_heads": cfg.lm.num_attention_heads,
            "num_key_value_heads": cfg.lm.kv_heads,
            "vocab_size": cfg.lm.vocab_size,
        }
    )
    with open(tmp_path / "config.json", "w") as f:
        json.dump(d, f)
    return tmp_path, cfg, params


def test_load_and_generate(checkpoint, monkeypatch):
    path, cfg_orig, params_orig = checkpoint
    monkeypatch.setattr(api, "_load_tokenizer", lambda p: Tok())
    # tiny config's tower geometry isn't the production ViT-L: inject it
    monkeypatch.setattr(
        api.TokenPackerVLMConfig,
        "from_json",
        classmethod(lambda cls, p: cfg_orig),
    )
    tokenizer, model, image_processor, context_len = api.load_pretrained_model(str(path))
    assert context_len == cfg_orig.model_max_length

    # weights round-tripped
    import jax.numpy as jnp

    a = np.asarray(model.params["lm"]["embed"], np.float32)
    b = np.asarray(params_orig["lm"]["embed"], np.float32)
    np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-2)  # bf16 load

    rng = np.random.default_rng(0)
    images = rng.standard_normal(
        (1, cfg_orig.vision.image_size, cfg_orig.vision.image_size, 3)
    ).astype(np.float32)
    ids = np.array([1, 17, IMAGE_TOKEN_INDEX, 40], dtype=np.int64)
    plan = build_splice_plan(
        [ids], [[(1, 1)]], cfg_orig.tokens_per_view, "single", 7, 8, 0, pad_to=16
    )
    out = model.generator.generate(
        {
            "token_ids": plan.token_ids,
            "is_image": plan.is_image,
            "image_slot": plan.image_slot,
            "lengths": plan.lengths,
            "images": images,
        },
        max_new_tokens=3,
    )
    assert len(out.sequences[0]) >= 1


def test_load_8bit(checkpoint, monkeypatch):
    path, cfg_orig, _ = checkpoint
    monkeypatch.setattr(api, "_load_tokenizer", lambda p: Tok())
    monkeypatch.setattr(
        api.TokenPackerVLMConfig, "from_json", classmethod(lambda cls, p: cfg_orig)
    )
    _, model, _, _ = api.load_pretrained_model(str(path), load_8bit=True)
    # tiny kernels fall below quantize_tree's min_size threshold, so just
    # verify the flag is plumbed and the model still works; the int8 linear
    # path itself is covered in tests/test_quantize.py
    assert model.params["lm"] is not None
