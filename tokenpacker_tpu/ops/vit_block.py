"""Fused ViT transformer block: LN1 → QKV → attention → O → +res → LN2 →
MLP(quick-GELU) → +res as ONE Pallas kernel per layer (grid over images).

Why: with the attention kernel (ops/vit_attention.py) shipped, the vision
path measured 360.5 img/s against a 430 img/s non-attention floor
(docs/vision_perf.md). The residual gap is HBM traffic between the block's
ops: the [N, 577, 1024] hidden stream makes ~8 round trips per layer
(LN reads/writes, projection inputs, residual adds) that XLA cannot fully
fuse across the fp32 LayerNorm islands and the attention kernel boundary.
Holding one image's whole block in VMEM leaves exactly one read and one
write of the hidden stream per layer.

The kernel needs ~50 MB of VMEM blocks (qkv/o 8 MB + MLP 16.8 MB weights,
double-buffered by the pipeline, + activations), which exceeds the 16 MB
default scoped-vmem stack — callers must raise `xla_tpu_scoped_vmem_limit_kib`
on the OUTERMOST jit (generate's engine entry points do this via _fd_jit;
see ops/fused_decode.py for the discovery history).

Numerics match models/clip_vit._block: fp32 LayerNorm islands, bf16 dots
with f32 accumulation, fp32 softmax via the exp2/ones-column trick
(identical to ops/vit_attention._kernel), quick-GELU in the compute dtype.
Opt-in via TOKENPACKER_VIT_BLOCK=1 (models/clip_vit._block dispatch).

Reference parity note: the tower this accelerates is HF CLIPVisionModel
(reference llava/model/multimodal_encoder/clip_encoder.py:7-89), frozen in
every recipe — forward-only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LOG2E = 1.4426950408889634


def _ln(x, scale, bias, eps):
    """fp32 LayerNorm island over the last axis (ops/layers.layer_norm)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _kernel(
    x_ref,  # [1, T, W]
    ln1_s_ref, ln1_b_ref,  # [1, W]
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    ln2_s_ref, ln2_b_ref,
    w1_ref, b1_ref,  # [W, F], [1, F]
    w2_ref, b2_ref,  # [F, W], [1, W]
    o_ref,  # [1, T, W]
    *,
    num_heads: int,
    eps: float,
):
    x0 = x_ref[0]  # [T, W] bf16
    dtype = x0.dtype
    t, w = x0.shape
    d = w // num_heads
    scale = d**-0.5

    xn = _ln(x0, ln1_s_ref[0], ln1_b_ref[0], eps).astype(dtype)
    q = (_dot(xn, wq_ref[...]) + bq_ref[0].astype(jnp.float32)).astype(dtype)
    k = (_dot(xn, wk_ref[...]) + bk_ref[0].astype(jnp.float32)).astype(dtype)
    v = (_dot(xn, wv_ref[...]) + bv_ref[0].astype(jnp.float32)).astype(dtype)

    # per-head attention, identical math to ops/vit_attention._kernel
    ones = jnp.ones((t, 1), dtype)
    heads_out = []
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, sl]
        kh = k[:, sl]
        vh = jnp.concatenate([v[:, sl], ones], axis=1)  # [T, d+1]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * _LOG2E)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m).astype(dtype)
        out = _dot(p, vh)  # [T, d+1]; out[:, d] = row sum of the bf16 probs
        heads_out.append((out[:, :d] * (1.0 / out[:, d : d + 1])).astype(dtype))
    attn = jnp.concatenate(heads_out, axis=1)  # [T, W]

    x1 = x0 + (_dot(attn, wo_ref[...]) + bo_ref[0].astype(jnp.float32)).astype(dtype)

    xn2 = _ln(x1, ln2_s_ref[0], ln2_b_ref[0], eps).astype(dtype)
    h32 = _dot(xn2, w1_ref[...]) + b1_ref[0].astype(jnp.float32)
    # quick-GELU (ops/layers.quick_gelu) computed in f32 before the cast:
    # jax.nn.sigmoid plants f32 scalar broadcasts into bf16 vectors, which
    # fail mosaic verification; in f32 throughout it lowers cleanly
    h1 = (h32 * (1.0 / (1.0 + jnp.exp(-1.702 * h32)))).astype(dtype)
    y = (_dot(h1, w2_ref[...]) + b2_ref[0].astype(jnp.float32)).astype(dtype)
    o_ref[0] = x1 + y


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "interpret"))
def vit_block(x, p, num_heads: int, eps: float, interpret: bool = False):
    """One pre-LN CLIP block for x [N, T, W]; p = models/clip_vit layer
    params (single layer, unstacked leaves)."""
    n, t, w = x.shape
    f = p["mlp"]["fc1"]["kernel"].shape[-1]
    row = lambda a: a.reshape(1, -1)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    args = [
        row(p["ln1"]["scale"]), row(p["ln1"]["bias"]),
        p["attn"]["q"]["kernel"], row(p["attn"]["q"]["bias"]),
        p["attn"]["k"]["kernel"], row(p["attn"]["k"]["bias"]),
        p["attn"]["v"]["kernel"], row(p["attn"]["v"]["bias"]),
        p["attn"]["o"]["kernel"], row(p["attn"]["o"]["bias"]),
        row(p["ln2"]["scale"]), row(p["ln2"]["bias"]),
        p["mlp"]["fc1"]["kernel"], row(p["mlp"]["fc1"]["bias"]),
        p["mlp"]["fc2"]["kernel"], row(p["mlp"]["fc2"]["bias"]),
    ]
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, eps=eps),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, t, w), lambda i: (i, 0, 0)),
            full((1, w)), full((1, w)),
            full((w, w)), full((1, w)), full((w, w)), full((1, w)),
            full((w, w)), full((1, w)), full((w, w)), full((1, w)),
            full((1, w)), full((1, w)),
            full((w, f)), full((1, f)),
            full((f, w)), full((1, w)),
        ],
        out_specs=pl.BlockSpec((1, t, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, t, w), x.dtype),
        interpret=interpret,
    )(x, *args)
