"""Large-M w8a8 GEMM kernel (ops/s8_gemm.py): exactness of the integer
machinery in interpret mode, tie-tolerant checks of the dynamic activation
quantization, padding, leading-dim handling, and the quantized vision tower
forward (the opt-in int8 serving mode for the vision path — the
bitsandbytes-8bit slot, reference builder.py:29-40, at batched shapes).

Note on tolerances: the per-row activation scale is computed in f32 inside
the kernel; a 1-ulp difference vs a host-side reference can flip
jnp.round() at exact .5 ties, moving single quantized values by one unit.
The exactness test therefore drives the kernel with integer-valued rows
whose absmax is exactly 127 (scale == 1.0, no division rounding); the
dynamic tests use statistical bounds sized to one quant-unit flips.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from tokenpacker_tpu.ops.quantize import quantize_int8


def _exact_x(rng, m, k):
    """Integer-valued f32 activations with per-row absmax exactly 127 so
    the kernel's dynamic scale is exactly 1.0."""
    x = rng.integers(-126, 127, (m, k)).astype(np.float32)
    x[:, 0] = 127.0
    return x


def test_s8_gemm_exact_integer_path():
    """With scale == 1 the whole kernel (quant staging, int8 MXU dot, scale
    product) must reproduce the integer matmul exactly."""
    from tokenpacker_tpu.ops.s8_gemm import s8_gemm

    rng = np.random.default_rng(0)
    for m, k, n in [(300, 256, 384), (64, 512, 128), (1029, 128, 256)]:
        x = _exact_x(rng, m, k)
        w = rng.standard_normal((k, n)).astype(np.float32)
        q, scale = quantize_int8(jnp.asarray(w))
        got = np.asarray(
            s8_gemm(jnp.asarray(x), q, scale.reshape(1, -1), interpret=True)
        )
        ref = (x.astype(np.int64) @ np.asarray(q, np.int64)).astype(
            np.float32
        ) * np.asarray(scale, np.float32).reshape(1, -1)
        assert got.shape == (m, n)
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_s8_gemm_dynamic_scheme_close():
    """Random activations: the kernel matches a host-side reference of the
    same scheme up to 1-unit round ties, and the scheme's error vs the dense
    float product stays small."""
    from tokenpacker_tpu.ops.s8_gemm import s8_gemm

    rng = np.random.default_rng(1)
    m, k, n = 320, 256, 128
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    q, scale = quantize_int8(jnp.asarray(w))
    got = np.asarray(s8_gemm(jnp.asarray(x), q, scale.reshape(1, -1), interpret=True))

    ax = np.maximum(np.abs(x).max(axis=1, keepdims=True), np.float32(1e-8)).astype(
        np.float32
    ) / np.float32(127.0)
    xq = np.round(x / ax).astype(np.int64)
    ref = (xq @ np.asarray(q, np.int64)).astype(np.float32) * ax * np.asarray(
        scale, np.float32
    ).reshape(1, -1)
    # elementwise bound: a 1-unit tie flip in one xq element moves the
    # output by at most ax_row * 127 * w_scale_col (= ax_row * col absmax)
    bound = ax * 127.0 * np.asarray(scale, np.float32).reshape(1, -1) + 1e-5
    assert (np.abs(got - ref) <= bound).all()
    # and flips must be rare
    flipped = (np.abs(got - ref) > 1e-5).mean()
    assert flipped < 0.01, flipped

    full = x @ w
    err = np.abs(got - full).mean() / (np.abs(full).mean() + 1e-9)
    assert err < 0.05, err


def test_w8a8_gemm_leading_dims_and_bf16():
    from tokenpacker_tpu.ops.s8_gemm import w8a8_gemm

    rng = np.random.default_rng(2)
    b, t, k, n = 2, 160, 256, 128
    x = jnp.asarray(rng.standard_normal((b, t, k)), jnp.bfloat16)
    w = rng.standard_normal((k, n)).astype(np.float32)
    q, scale = quantize_int8(jnp.asarray(w))
    got = w8a8_gemm(x, {"q": q, "scale": scale}, interpret=True)
    assert got.shape == (b, t, n)
    assert got.dtype == jnp.bfloat16
    full = np.asarray(x.reshape(-1, k), np.float32) @ w
    err = np.abs(np.asarray(got, np.float32).reshape(-1, n) - full).mean() / (
        np.abs(full).mean() + 1e-9
    )
    assert err < 0.05, err


def test_quantized_tower_forward_close():
    """quantize_tower_int8 + the standard forward (weight-only dequant path
    on CPU): features stay close to the dense tower — the quantized tree is
    scan-compatible and the projector input distribution is preserved."""
    import jax

    from tokenpacker_tpu.config import VisionConfig
    from tokenpacker_tpu.models.clip_vit import (
        clip_tower_features,
        init_clip_vit,
        quantize_tower_int8,
    )

    cfg = VisionConfig(
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=5,
        num_attention_heads=4,
        image_size=70,
        patch_size=14,
        select_layer=-2,
        multi_layers=(2, 3),
    )
    params = init_clip_vit(jax.random.PRNGKey(0), cfg, jnp.float32)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 70, 70, 3), jnp.float32)
    feats, multi = clip_tower_features(params, cfg, images)
    qparams = quantize_tower_int8(params)
    qfeats, qmulti = clip_tower_features(qparams, cfg, images)
    assert qfeats.shape == feats.shape and qmulti.shape == multi.shape

    def rel(a, b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        return np.abs(a - b).mean() / (np.abs(b).mean() + 1e-9)

    assert rel(qfeats, feats) < 0.05, rel(qfeats, feats)
    assert rel(qmulti, multi) < 0.05, rel(qmulti, multi)
