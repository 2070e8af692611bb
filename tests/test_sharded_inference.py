"""Sharded inference: prefill + chunked decode under a ('data','model') mesh
with FSDP/TP-sharded params must reproduce single-device greedy output.

This validates the multi-chip serving path (HD-7b on v5e-8, BASELINE.md):
XLA inserts the TP collectives inside prefill/decode from the param
shardings alone — no code changes in the engine.
"""

import numpy as np

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX
from tokenpacker_tpu.generate import Generator
from tokenpacker_tpu.models.splice import build_splice_plan
from tokenpacker_tpu.models.vlm import init_vlm
from tokenpacker_tpu.parallel.mesh import make_mesh
from tokenpacker_tpu.parallel.sharding import shard_params


def _batch(cfg, rng):
    images = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids = np.array([1, 17, 23, IMAGE_TOKEN_INDEX, 40, 41], dtype=np.int64)
    plan = build_splice_plan([ids], [[(1, 1)]], cfg.tokens_per_view, "single", 7, 8, 0, pad_to=24)
    return {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_slot": plan.image_slot,
        "lengths": plan.lengths,
        "images": images,
    }


def test_tp_sharded_generation_matches_single_device():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, np.random.default_rng(0))

    ref = Generator(params, cfg).generate(batch, max_new_tokens=5).sequences[0]

    mesh = make_mesh(tp=2)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        got = Generator(sharded, cfg).generate(batch, max_new_tokens=5).sequences[0]
    assert got == ref, (got, ref)


def test_tp_sharded_speculative_generation_matches_single_device():
    """Speculation composes with TP: the on-device draft->verify->accept
    chunk runs under GSPMD-sharded params (collectives inserted by XLA) and
    still emits the exact single-device greedy tokens."""
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(3), cfg)
    batch = _batch(cfg, np.random.default_rng(3))

    ref = Generator(params, cfg).generate(batch, max_new_tokens=8).sequences[0]

    mesh = make_mesh(tp=2)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        got = Generator(sharded, cfg).generate(
            batch, max_new_tokens=8, speculative=3
        ).sequences[0]
    assert got == ref, (got, ref)
