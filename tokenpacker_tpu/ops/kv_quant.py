"""int8 KV-cache quantization (per-position, per-head absmax).

Beyond-reference serving feature (the reference's HF decode keeps fp16
caches — llava/model/language_model/llava_llama.py:120-140): storing K/V
as int8 with one f32 scale per (position, kv-head) halves the cache's HBM
footprint AND the per-step cache read traffic. On one v5e chip this is
what lets HD-length (S=2048) multi-slot serving fit beside int8 weights
(bf16 caches at B=8 S=2048 are 8.6 GB; int8+scales are 4.3 GB).

Scheme: x[..., h, :] (a head's row) is stored as
    q = round(x / s),  s = max(|x|) / 127
and every consumer dequantizes as q * s. In the fused decode kernel the
scale factors OUT of the per-head contraction, so dequant costs two
[S, H] elementwise multiplies instead of materializing bf16 K/V (see
ops/fused_decode.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_kv(x):
    """x: [..., d] float → (int8 [..., d], f32 scale [...]).

    Per-row (last-axis) absmax scaling; zero rows get scale eps/127 so
    dequant reproduces exact zeros."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(x32 / scale[..., None]).astype(jnp.int8)
    return q, scale


def dequantize_kv(q, scale, dtype=jnp.bfloat16):
    """Inverse of quantize_kv: int8 [..., d] * f32 scale [...] → dtype."""
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)
