"""TokenPacker projector — point-to-region cross-attention, TPU-native.

Reproduces the math of the reference projector
(`llava/model/multimodal_projector/builder.py:39-137`) with a different,
MXU-friendly formulation:

The reference reshapes tokens with `divide_feature` into a
[(s*s) x (regions*N) x C] layout and runs `nn.MultiheadAttention` with
query seq-len 1 per region — i.e. thousands of tiny attention problems.
Here the same computation is a single batched einsum chain over a
[N, regions, s*s, heads, head_dim] layout: one softmax over the s*s axis and
two batched matmuls, which XLA fuses and tiles onto the MXU directly.

Math (identical to reference forward, builder.py:107-137):
  1. key   = LN(k_proj(x_multi)),  value = LN(v_proj(x_multi))
     where k/v_proj = Linear(4C→C) → GELU → Linear(C→C)     (builder.py:61-75)
  2. coarse query = bilinear-downsample (fp32) of the penultimate features
     from raw_grid² → grid_size², then LN(q_proj(·)), q_proj bias-free
     (builder.py:59,117-120)
  3. each coarse query attends over its own s×s region of keys/values with a
     standard h-head scaled-dot-product (packed-QKV MultiheadAttention
     semantics: builder.py:77,126-130)
  4. out → MLP Linear(C→hidden) → GELU → Linear(hidden→hidden) (builder.py:79-83)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import ProjectorConfig
from tokenpacker_tpu.ops.layers import (
    bilinear_downsample_2d,
    gelu,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)


def init_tokenpacker(key, cfg: ProjectorConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 10)
    e = cfg.embed_dim
    return {
        "q_proj": init_linear(keys[0], cfg.kv_dim, e, bias=False, dtype=dtype),
        "k_proj": {
            "fc1": init_linear(keys[1], cfg.kv_input_dim, e, dtype=dtype),
            "fc2": init_linear(keys[2], e, e, dtype=dtype),
        },
        "v_proj": {
            "fc1": init_linear(keys[3], cfg.kv_input_dim, e, dtype=dtype),
            "fc2": init_linear(keys[4], e, e, dtype=dtype),
        },
        "ln_q": init_layer_norm(e, dtype),
        "ln_k": init_layer_norm(e, dtype),
        "ln_v": init_layer_norm(e, dtype),
        "attn": {
            "q": init_linear(keys[5], e, e, dtype=dtype),
            "k": init_linear(keys[6], e, e, dtype=dtype),
            "v": init_linear(keys[7], e, e, dtype=dtype),
            "o": init_linear(keys[8], e, e, dtype=dtype),
        },
        "mlp": {
            "fc1": init_linear(keys[9], e, cfg.hidden_size, dtype=dtype),
            "fc2": init_linear(
                jax.random.fold_in(key, 99), cfg.hidden_size, cfg.hidden_size, dtype=dtype
            ),
        },
    }


def _regionize(x, grid: int, s: int):
    """[N, grid*grid, C] row-major → [N, (grid/s)², s², C] grouping each
    coarse region's s×s fine tokens (the `divide_feature` permutation,
    reference builder.py:96-105, as a reshape/transpose)."""
    n, _, c = x.shape
    g = grid // s
    x = x.reshape(n, g, s, g, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [N, g, g, s, s, C]
    return x.reshape(n, g * g, s * s, c)


def tokenpacker_forward(params, cfg: ProjectorConfig, x, x_multi):
    """x: [N, raw_grid², C] penultimate features; x_multi: [N, raw_grid², 4C].

    Returns [N, num_queries, hidden_size] LLM-space visual tokens.
    """
    eps = cfg.ln_eps
    s = cfg.scale_factor
    g = cfg.grid_size
    h = cfg.num_heads
    e = cfg.embed_dim
    d = e // h
    n = x.shape[0]

    # keys / values from the 4-level concat features
    key = layer_norm(params["ln_k"], gelu_mlp(params["k_proj"], x_multi), eps)
    value = layer_norm(params["ln_v"], gelu_mlp(params["v_proj"], x_multi), eps)

    # coarse query: fp32 bilinear downsample of the raw grid (builder.py:117)
    q = x.reshape(n, cfg.raw_grid, cfg.raw_grid, -1)
    q = bilinear_downsample_2d(q, g, g).astype(x.dtype)
    q = q.reshape(n, g * g, -1)
    query = layer_norm(params["ln_q"], linear(params["q_proj"], q), eps)

    # packed-QKV MultiheadAttention projections
    qh = linear(params["attn"]["q"], query)  # [N, G, E]
    kh = linear(params["attn"]["k"], key)  # [N, T, E]
    vh = linear(params["attn"]["v"], value)

    kr = _regionize(kh, cfg.raw_grid, s).reshape(n, g * g, s * s, h, d)
    vr = _regionize(vh, cfg.raw_grid, s).reshape(n, g * g, s * s, h, d)
    qr = qh.reshape(n, g * g, h, d)

    logits = jnp.einsum("nghd,ngshd->nghs", qr, kr) * (d**-0.5)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
    out = jnp.einsum("nghs,ngshd->nghd", attn, vr).reshape(n, g * g, e)
    out = linear(params["attn"]["o"], out)

    # into LLM embedding space
    out = linear(params["mlp"]["fc1"], out)
    out = gelu(out)
    out = linear(params["mlp"]["fc2"], out)
    return out


def gelu_mlp(p, x):
    return linear(p["fc2"], gelu(linear(p["fc1"], x)))
