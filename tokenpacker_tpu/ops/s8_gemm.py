"""Pallas w8a8 GEMM (large-M): native int8 MXU matmuls for compute-bound
batched paths (ViT tower, LM prefill).

Motivation: the v5e MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate
(394 vs 197 T/s). The vision tower's non-attention floor is batched GEMMs at
76% bf16 MFU (docs/vision_perf.md) — the one remaining lever on that floor
is the int8 MXU path. ops/q8_matmul.s8_matmul covers the decode GEMV shape
(full-M block, M<=64); this kernel covers the opposite regime: M in the
thousands (batch 32 x 577 tokens = 18464 rows), tiled over (M, N) with K
whole.

Key design points:
- Activation quantization happens IN the kernel (per-row symmetric absmax,
  computed once per M-tile under pl.when(j==0) into persistent VMEM
  scratch), so the quantized activations never round-trip HBM — quantizing
  outside the kernel costs ~5 bytes/element of extra HBM traffic per GEMM,
  which at ViT shapes is several ms/batch32 and would eat most of the MXU
  win.
- Quantized rows are staged as EXACT INTEGERS IN BF16 (|q| <= 127 < 2^8
  mantissa) and cast to int8 at the dot — the idiom proven to hit the
  native s8 MXU path in ops/fused_decode (its w8a8 mode) without int8
  scratch reads.
- Weight scales ride into the kernel as a [1, bn] f32 block so the
  dequantized output is produced in one pass (no extra [M, N] HBM trip).
- Tile sizes keep total VMEM under the 16 MB default scoped limit unless
  TOKENPACKER_S8GEMM_BIG=1 opts into large tiles (fewer weight re-streams
  for K>=4096; the enclosing jit must then raise
  xla_tpu_scoped_vmem_limit_kib — generate._fd_compiler_options provides
  the standard options dict).

Numerics: this is the dynamic w8a8 scheme of ops/q8_matmul (per-row
activation absmax x per-out-channel weight scale; s32 accumulation is
exact) — a DIFFERENT numerics point than weight-only int8, hence opt-in
via the same TOKENPACKER_W8A8=1 gate (ops/layers.linear routes m<=64 to
the GEMV kernel and large m here). Replaces the reference's bitsandbytes
8-bit inference slot (builder.py:29-40) at batched shapes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, ws_ref, o_ref, xq_ref, ax_ref):
    @pl.when(pl.program_id(1) == 0)
    def _quantize_rows():
        xf = x_ref[...].astype(jnp.float32)
        ax = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-8)
        ax = ax / 127.0
        ax_ref[...] = ax
        # exact integers in bf16 (see module docstring); |q| <= 127 by
        # construction so no clip is needed
        xq_ref[...] = jnp.round(xf / ax).astype(jnp.bfloat16)

    acc = jax.lax.dot_general(
        xq_ref[...].astype(jnp.int8),
        w_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = (acc.astype(jnp.float32) * ax_ref[...] * ws_ref[...]).astype(
        o_ref.dtype
    )


def _pick(total: int, candidates) -> int:
    for c in candidates:
        if total % c == 0:
            return c
    return total


def _tiles(m: int, k: int, n: int):
    """(bm, bn) under the VMEM budget. Default budget: x bf16 tile <= 2 MB
    (double-buffered 4), xq scratch <= 2, w int8 tile <= 2 (x2 = 4), acc
    <= 2 — total ~12 MB, inside the 16 MB default scoped limit. BIG mode
    quadruples the x/xq budget to cut weight re-streaming at K>=4096."""
    big = os.environ.get("TOKENPACKER_S8GEMM_BIG") == "1"
    x_budget = (8 << 20) if big else (2 << 20)
    bm = _pick_cap(1024 if not big else 2048, lambda c: c * k * 2 <= x_budget)
    w_budget = (4 << 20) if big else (2 << 20)
    acc_budget = (4 << 20) if big else (2 << 20)
    bn = _pick(
        n,
        tuple(
            c
            for c in (2048, 1024, 512, 256, 128)
            if c * k <= w_budget and bm * c * 4 <= acc_budget
        ),
    )
    return bm, bn


def _pick_cap(cap: int, ok) -> int:
    c = cap
    while c > 8 and not ok(c):
        c //= 2
    return max(c, 8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def s8_gemm(x, wq, wscale, interpret: bool = False):
    """x: [M, K] bf16/f32, wq: [K, N] int8, wscale: [1, N] f32
    -> [M, N] in x.dtype (w8a8: dynamic per-row activation quant in-kernel).
    """
    m, k = x.shape
    n = wq.shape[1]
    bm, bn = _tiles(m, k, n)
    m_pad = ((m + bm - 1) // bm) * bm
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        _kernel,
        grid=(m_pad // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.bfloat16),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, wq, jnp.asarray(wscale, jnp.float32))
    return out[:m]


def w8a8_gemm(x, qleaf: dict, interpret: bool = False):
    """x: [..., K] @ int8 leaf {'q': [K, N] int8, 'scale': [..., 1, N]}
    -> [..., N] in x.dtype via the native int8 MXU path (large-M regime;
    the m<=64 decode shape is ops/q8_matmul.w8a8_matmul)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    xm = x.reshape(-1, k)
    scale = qleaf["scale"].reshape(1, -1)
    y = s8_gemm(xm, qleaf["q"], scale, interpret=interpret)
    return y.reshape(*lead, qleaf["q"].shape[1])
