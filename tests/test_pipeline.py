"""Pipeline parallelism (parallel/pipeline.py): exactness vs the single-
device `llama_apply` scan, forward and gradients, on dp×pp and pp-only
meshes. Beyond-reference parallelism (the reference's DeepSpeed configs
shard optimizer state only — /root/reference/scripts/zero2.json)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import LMConfig
from tokenpacker_tpu.models.llama import (
    init_llama,
    llama_apply,
    make_attention_bias,
)
from tokenpacker_tpu.parallel.pipeline import (
    make_pp_mesh,
    pipeline_llama_hidden,
    pp_param_shardings,
)


def _small_cfg(layers=8):
    return LMConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=160,
        num_hidden_layers=layers,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
    )


def _inputs(cfg, batch, t, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((batch, t, cfg.hidden_size)), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t), (batch, t))
    # ragged lengths exercise the key_valid masking through the pipeline
    lengths = rng.integers(t // 2, t + 1, size=batch)
    key_valid = jnp.asarray(np.arange(t)[None, :] < lengths[:, None])
    return x, positions, key_valid


def _reference_hidden(params, cfg, x, positions, key_valid):
    bias = make_attention_bias(positions, key_valid, jnp.zeros((), jnp.int32),
                               x.shape[1])
    h, _ = llama_apply(params, cfg, x, positions, bias, cache=None,
                       use_flash=False)
    return h


@pytest.mark.parametrize("dp,pp,m", [(1, 4, 4), (2, 4, 2), (1, 8, 2)])
def test_pipeline_forward_matches_scan(dp, pp, m):
    cfg = _small_cfg(layers=8)
    params = init_llama(jax.random.PRNGKey(0), cfg, jnp.float32)
    batch = dp * m * 2
    x, positions, key_valid = _inputs(cfg, batch, t=24)

    want = _reference_hidden(params, cfg, x, positions, key_valid)

    # explicit device subset: make_pp_mesh is strict about dp*pp == n
    # (ADVICE r3), so a smaller mesh must name its devices
    mesh = make_pp_mesh(pp=pp, dp=dp, devices=jax.devices()[: dp * pp])
    sharded = jax.device_put(params, pp_param_shardings(params, mesh))
    got = jax.jit(
        lambda p, xx: pipeline_llama_hidden(
            p, cfg, xx, positions, key_valid, mesh, num_microbatches=m
        )
    )(sharded, x)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_grads_match_scan():
    cfg = _small_cfg(layers=8)
    params = init_llama(jax.random.PRNGKey(0), cfg, jnp.float32)
    mesh = make_pp_mesh(pp=4, dp=2)
    m = 2
    batch = 2 * m * 2
    x, positions, key_valid = _inputs(cfg, batch, t=16, seed=1)
    tgt = jnp.asarray(
        np.random.default_rng(2).standard_normal((batch, 16, cfg.hidden_size)),
        jnp.float32,
    )
    mask = key_valid[..., None].astype(jnp.float32)

    def ref_loss(p):
        h = _reference_hidden(p, cfg, x, positions, key_valid)
        return jnp.mean(((h - tgt) * mask) ** 2)

    def pp_loss(p):
        h = pipeline_llama_hidden(p, cfg, x, positions, key_valid, mesh,
                                  num_microbatches=m)
        return jnp.mean(((h - tgt) * mask) ** 2)

    want_l, want_g = jax.value_and_grad(ref_loss)(params)
    sharded = jax.device_put(params, pp_param_shardings(params, mesh))
    got_l, got_g = jax.jit(jax.value_and_grad(pp_loss))(sharded)

    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    flat_w, tdef_w = jax.tree_util.tree_flatten(want_g)
    flat_g, tdef_g = jax.tree_util.tree_flatten(got_g)
    # equal treedefs first: a leaf missing from the pipeline grad must fail
    # loudly, not silently truncate the zip (ADVICE r3)
    assert tdef_w == tdef_g, (tdef_w, tdef_g)
    for w, g in zip(flat_w, flat_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=3e-4, atol=3e-5)


def test_pipeline_rejects_bad_divisibility():
    cfg = _small_cfg(layers=6)  # 6 % 4 != 0
    params = init_llama(jax.random.PRNGKey(0), cfg, jnp.float32)
    mesh = make_pp_mesh(pp=4, dp=2)
    x, positions, key_valid = _inputs(cfg, 8, t=8)
    with pytest.raises(ValueError, match="stages"):
        pipeline_llama_hidden(params, cfg, x, positions, key_valid, mesh,
                              num_microbatches=2)
    cfg8 = _small_cfg(layers=8)
    params8 = init_llama(jax.random.PRNGKey(0), cfg8, jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        pipeline_llama_hidden(params8, cfg8, x[:6], positions[:6],
                              key_valid[:6], mesh, num_microbatches=2)


def test_make_pp_mesh_rejects_underused_devices():
    """Regression (ADVICE r3): an explicit dp with dp*pp < n must raise, not
    silently idle the remaining devices."""
    with pytest.raises(ValueError, match="!="):
        make_pp_mesh(pp=2, dp=2)  # 4 < the 8 virtual devices
