"""Pallas 4-bit dequant-in-kernel matmul for the decode GEMV path.

Decode is weight-bandwidth-bound: with nf4/int4 weights the dense matrix
must never round-trip through HBM, or the 4× storage win evaporates. XLA
cannot fuse the unpack+codebook-decode chain into its dot, so it would
materialize the dense bf16 weight per step; this kernel streams the packed
uint8 weight into VMEM and decodes inline.

Layout (ops/quantize.quantize_4bit): packed [K/2, N] uint8 where packed[i]
holds W[2i] (low nibble) and W[2i+1] (high nibble); absmax [K/block, N].
The even/odd nibble split never needs an in-kernel interleave: the caller
passes x_even = x[:, 0::2] and x_odd = x[:, 1::2] transposed to [K/2, M]
(an O(M*K) reshuffle, cheap for GEMV M), and the kernel computes

  y = sum_kb (x_even[kb]^T @ decode(lo[kb]) + x_odd[kb]^T @ decode(hi[kb]))
      * absmax[kb]

because within one quantization block the scale is constant along K, so it
commutes out of the per-block partial product.

Mosaic notes: no dynamic slicing inside the kernel — the K loop is a grid
dimension (innermost, accumulating into a revisited fp32 output block) and
the per-absmax-row loop is a static unroll over sublane slices (x is passed
K-major so every slice is on sublanes, which have 8-row granularity, not
the 128-lane alignment a lane slice would need). NF4's 16-entry codebook
is decoded with a chain of selects (VPU) — small dynamic gathers don't
lower in mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tokenpacker_tpu.ops.quantize import NF4_VALUES, q4_meta

_NF4_LIST = list(NF4_VALUES)  # python constants for in-kernel selects


def _decode(idx, quant_type: str):
    """idx int32 in [0, 15] → fp32 normalized weight."""
    if quant_type == "int4":
        return (idx - 8).astype(jnp.float32) / 7.0
    out = jnp.zeros(idx.shape, jnp.float32)
    for j, c in enumerate(_NF4_LIST):
        out = jnp.where(idx == j, c, out)
    return out


def _kernel(xe_ref, xo_ref, p_ref, a_ref, o_ref, *, quant_type: str, block: int):
    """Blocks: xe/xo [bk2, M] (K-major), p [bk2, bn] uint8, a [r, 1, bn]
    (3D so r rides the unconstrained leading dim — mosaic's 8x128 tile rule
    only binds the last two dims), o [M, bn] fp32 (revisited across the K
    grid dim)."""
    kb2 = block // 2
    r = a_ref.shape[0]
    m = xe_ref.shape[1]
    bn = p_ref.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[...] = jnp.zeros((m, bn), jnp.float32)

    acc = jnp.zeros((m, bn), jnp.float32)
    for t in range(r):  # static unroll over absmax rows in this K block
        sl = slice(t * kb2, (t + 1) * kb2)
        pb = p_ref[sl, :]
        xeb = xe_ref[sl, :].astype(jnp.float32)  # [kb2, M]
        xob = xo_ref[sl, :].astype(jnp.float32)
        pb32 = pb.astype(jnp.int32)  # mosaic has no uint8->float cast
        if quant_type == "int4":
            # decode = just unpack + convert: x @ (idx - 8) = x @ idx - 8*sum(x)
            # (the -8 bias commutes out of the dot; the 1/7 scale is folded
            # into absmax by the caller) — a few VPU ops per weight instead
            # of the NF4 select chain
            wlo = (pb32 & 0xF).astype(jnp.float32)
            whi = (pb32 >> 4).astype(jnp.float32)
            correction = 8.0 * jnp.sum(xeb + xob, axis=0, keepdims=True).T  # [M, 1]
        else:
            wlo = _decode(pb32 & 0xF, quant_type)
            whi = _decode(pb32 >> 4, quant_type)
            correction = None
        part = jax.lax.dot_general(
            xeb, wlo, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            xob, whi, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [M, bn]
        if correction is not None:
            part = part - correction
        acc = acc + part * a_ref[t]
    o_ref[...] += acc


def _pick(total: int, candidates) -> int:
    for c in candidates:
        if total % c == 0:
            return c
    return total


@functools.partial(jax.jit, static_argnames=("quant_type", "block", "interpret"))
def _q4_matmul_2d(xe_t, xo_t, packed, absmax, quant_type: str, block: int,
                  interpret: bool = False):
    k2, m = xe_t.shape
    n = packed.shape[1]
    kb2 = block // 2
    bk2 = _pick(k2, (kb2 * 16, kb2 * 8, kb2 * 4, kb2 * 2, kb2))
    r = bk2 // kb2
    # fat N blocks: the kernel is grid-overhead-bound at small blocks
    # (measured 355us -> see ROADMAP; each step is ~1us of real work)
    bn = _pick(n, (5504, 4096, 2048, 1024, 512, 256, 128))
    grid = (n // bn, k2 // bk2)
    out = pl.pallas_call(
        functools.partial(_kernel, quant_type=quant_type, block=block),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bk2, m), lambda j, k: (k, 0)),
            pl.BlockSpec((bk2, m), lambda j, k: (k, 0)),
            pl.BlockSpec((bk2, bn), lambda j, k: (k, j)),
            pl.BlockSpec((r, 1, bn), lambda j, k: (k, 0, j)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
    )(xe_t, xo_t, packed, (absmax / 7.0 if quant_type == "int4" else absmax)[:, None, :])
    return out


def q4_matmul(x, qleaf: dict, interpret: bool = False):
    """x: [..., K] @ 4-bit-packed W [K, N] → [..., N] without materializing
    the dense weight. Use for small M (decode); for prefill-sized M a dense
    dequant + XLA matmul wins on MXU utilization."""
    key, quant_type, block = q4_meta(qleaf)
    packed, absmax = qleaf[key], qleaf["absmax"]
    lead = x.shape[:-1]
    k = x.shape[-1]
    xm = x.reshape(-1, k)
    y = _q4_matmul_2d(
        xm[:, 0::2].T, xm[:, 1::2].T, packed, absmax, quant_type, block,
        interpret=interpret,
    )
    return y.astype(x.dtype).reshape(*lead, packed.shape[1])
