"""Pallas kernel for TokenPacker's point-to-region cross-attention.

The projector's core op (models/tokenpacker.py): each coarse query attends
over its own s×s region of keys/values with h heads. Shapes per image:
q [G, E], k/v [G, s², E] with G = (24/s)² regions, E = 1024, h = 8.

Kernel layout: grid over (N, region blocks). One program holds a block of
R regions' q/k/v in VMEM, computes all h heads' logits with two MXU
matmuls per head batch (folded into one [R*s², E]-style contraction), the
s²-softmax on the VPU, and writes the combined [R, E] output — attention
probabilities never touch HBM.

The jnp einsum formulation remains the reference semantics; this kernel is
selected when it measures faster (see tokenpacker.region_attention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def region_attention_reference(q, kr, vr, num_heads: int):
    """q: [N, G, E]; kr/vr: [N, G, S, E] → [N, G, E] (fp32 softmax)."""
    n, g, e = q.shape
    s = kr.shape[2]
    d = e // num_heads
    qh = q.reshape(n, g, num_heads, d)
    kh = kr.reshape(n, g, s, num_heads, d)
    vh = vr.reshape(n, g, s, num_heads, d)
    logits = jnp.einsum("nghd,ngshd->nghs", qh, kh) * (d**-0.5)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
    return jnp.einsum("nghs,ngshd->nghd", attn, vh).reshape(n, g, e)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads, d):
    """Blocks: q [1, R, E], k/v [1, R, S, E], o [1, R, E]."""
    q = q_ref[0].astype(jnp.float32)  # [R, E]
    r, e = q.shape
    k = k_ref[0].astype(jnp.float32)  # [R, S, E]
    v = v_ref[0].astype(jnp.float32)
    scale = d**-0.5

    # per head: logits[r, s] = sum_d q[r, h*d:d] * k[r, s, h*d:d]
    out = jnp.zeros((r, e), jnp.float32)
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, sl]  # [R, d]
        kh = k[:, :, sl]  # [R, S, d]
        vh = v[:, :, sl]
        logits = jnp.einsum("rd,rsd->rs", qh, kh, preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        oh = jnp.einsum("rs,rsd->rd", p, vh, preferred_element_type=jnp.float32)
        out = out.at[:, sl].set(oh)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_r", "interpret"))
def region_attention_pallas(q, kr, vr, num_heads: int, block_r: int = 16, interpret: bool = False):
    """q: [N, G, E]; kr/vr: [N, G, S, E] → [N, G, E]."""
    n, g, e = q.shape
    s = kr.shape[2]
    d = e // num_heads
    if g % block_r != 0:
        block_r = g  # fall back to one block per image
    grid = (n, g // block_r)
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_r, e), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_r, s, e), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, block_r, s, e), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_r, e), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, g, e), q.dtype),
        interpret=interpret,
    )(q, kr, vr)
