"""Pallas w8a8 GEMV: native int8 x int8 -> int32 MXU matmul for decode.

The default int8 serving path is WEIGHT-only: XLA fuses the int8->bf16
convert into the dot, but the per-weight convert is VPU work that costs as
much as reading bf16 weights — measured on v5e at [4096, 11008] GEMV:
238.6us (XLA convert-in-dot) vs 147.5us for this kernel's native
s8 x s8 -> s32 MXU dot (1.62x). Activations are quantized per token
(symmetric absmax int8) so both operands feed the MXU's int8 path; the s32
accumulator is exact, and scales (per-token activation x per-channel weight)
are applied outside the kernel on the [M, N] output.

This is a DIFFERENT numerics point than weight-only int8 (it adds
activation-quantization error, ~0.4% per value before the matmul's
averaging), so it is OPT-IN: set TOKENPACKER_W8A8=1 and the int8 decode
GEMV path (ops/layers.linear, small M on TPU) switches over. bnb parity
note: the reference's bitsandbytes int8 path is also a dynamic w8a8 scheme
(LLM.int8 without the outlier split), so this is closer to reference
behavior than the weight-only default.

MEASURED END-TO-END (v5e, 7B int8, B=1, S=512): 61.8 tok/s vs 84.2 for the
weight-only XLA path — the isolated 1.62x kernel win is eaten by the ~55us
per-pallas_call dispatch floor (7 GEMVs x 32 layers = 224 calls/step, same
wall as the ROADMAP q4 finding). Hence OFF by default; worth revisiting
only with fused qkv/gateup int8 layouts (4 calls/layer) or a runtime
without the per-call floor.

The kernel itself is exact (s32): tests assert bit-equality with an integer
reference; only the activation quantization changes model output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, w_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _pick(total: int, candidates) -> int:
    for c in candidates:
        if total % c == 0:
            return c
    return total


@functools.partial(jax.jit, static_argnames=("interpret",))
def s8_matmul(xq, wq, interpret: bool = False):
    """xq: [M, K] int8 (M a multiple of 8), wq: [K, N] int8 -> [M, N] int32
    (exact)."""
    m, k = xq.shape
    n = wq.shape[1]
    # both block dims must be multiples of (8, 128); K rides both x lanes
    # and w sublanes, N rides w lanes. Keep bk*bn <= ~6 MB: pallas
    # double-buffers the weight block across grid steps and scoped VMEM is
    # 16 MB (bk=2048 x bn=5504 compiled, then OOM'd VMEM at runtime)
    bn = _pick(n, (5504, 4096, 2048, 1024, 512, 256, 128))
    bk = _pick(k, tuple(c for c in (2048, 1024, 512, 256, 128)
                        if c * bn <= 6 * 1024 * 1024))
    return pl.pallas_call(
        _kernel,
        grid=(n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((m, bk), lambda j, kk: (0, kk)),
            pl.BlockSpec((bk, bn), lambda j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda j, kk: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        interpret=interpret,
    )(xq, wq)


def quantize_activations(x):
    """Per-row symmetric int8: returns (xq int8 [M, K], ax fp32 [M, 1]) with
    x ~= xq * ax."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    ax = jnp.maximum(ax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ax), -127, 127).astype(jnp.int8)
    return xq, ax


def w8a8_matmul(x, qleaf: dict, interpret: bool = False):
    """x: [..., K] bf16/f32 @ int8 weight leaf {'q': [K, N] int8, 'scale':
    [1, N] f32} -> [..., N] in x.dtype, via the native int8 MXU path."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    xm = x.reshape(-1, k)
    m = xm.shape[0]
    m_pad = max(8, ((m + 7) // 8) * 8)
    if m_pad != m:
        xm = jnp.pad(xm, ((0, m_pad - m), (0, 0)))
    xq, ax = quantize_activations(xm)
    acc = s8_matmul(xq, qleaf["q"], interpret=interpret)
    scale = jnp.squeeze(qleaf["scale"], axis=-2)[None, :]  # [1, N]
    y = acc.astype(jnp.float32) * ax * scale
    return y[:m].astype(x.dtype).reshape(*lead, qleaf["q"].shape[1])
