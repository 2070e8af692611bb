"""Pallas decode attention over the dense KV cache with length prefetch.

Replaces the XLA decode path's materialized [N, 1, 1, S] fp32 bias + full
cache read (generate.decode_step/_cb → _sdpa) with a kernel that

- receives per-sample valid lengths as PREFETCHED SCALARS: the KV block
  index maps clamp to the last needed block, so blocks past a sequence's
  length are never DMA'd from HBM (the win grows with cache headroom —
  continuous batching slots sized for the longest request);
- computes the mask from iotas in-kernel — the fp32 bias tensor is gone;
- supports the bucketed decode layout's two valid ranges (prompt
  [0, len_i) plus decoded span [span_start, span_start+span_len)) and the
  contiguous layout (span disabled) — generate.decode_step:60-83 semantics;
- optional ALiBi: per-head slopes times TRUE token positions (gap-compacted
  like models/mpt.alibi_bias_from_positions), for the MPT family.

Layouts stay the model's natural ones: q [N, H, d]; cache [N, S, Hkv, d]
viewed as [N, S, Hkv*d] — per-kv-head lane slices are d-aligned (d=128 for
the 7B/13B families). Grid (N, KV blocks) with online-softmax state in
VMEM scratch, finalized on the last block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(scalars_ref, q_ref, k_ref, v_ref, slopes_ref, o_ref,
            m_scr, l_scr, acc_scr, *,
            bk: int, hkv: int, groups: int, d: int, scale: float,
            span_start: int, alibi: bool):
    """scalars: [2, N] int32 — row 0: per-sample prompt valid length,
    row 1: per-sample total needed keys (loop/DMA bound).
    Blocks: q [1, H, d], k/v [1, bk, Hkv*d], o [1, H, d]."""
    n_i = pl.program_id(0)
    kb = pl.program_id(1)
    num_kb = pl.num_programs(1)
    len_i = scalars_ref[0, n_i]
    needed = scalars_ref[1, n_i]
    h = hkv * groups

    @pl.when(kb == 0)
    def _init():
        m_scr[...] = jnp.full((h, 1), NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros((h, 1), jnp.float32)
        acc_scr[...] = jnp.zeros((h, d), jnp.float32)

    @pl.when(kb * bk < needed)
    def _block():
        q = q_ref[0].astype(jnp.float32) * scale  # [H, d]
        k = k_ref[0]  # [bk, Hkv*d]
        v = v_ref[0]

        # logits per kv head, stacked to [H, bk]
        rows = []
        for j in range(hkv):
            sl = slice(j * d, (j + 1) * d)
            qj = q[j * groups : (j + 1) * groups]  # [g, d]
            kj = k[:, sl].astype(jnp.float32)  # [bk, d]
            rows.append(
                jax.lax.dot_general(qj, kj, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            )
        s = jnp.concatenate(rows, axis=0) if hkv > 1 else rows[0]  # [H, bk]

        kpos = kb * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        if span_start > 0:
            # bucketed layout: prompt [0, len_i) + decoded span
            # [span_start, needed); key positions in the span are compacted
            in_prompt = kpos < len_i
            in_span = (kpos >= span_start) & (kpos < needed)
            valid = in_prompt | in_span
            tok_pos = jnp.where(in_span, kpos - span_start + len_i, kpos)
        else:
            valid = kpos < needed
            tok_pos = kpos
        if alibi:
            s = s + slopes_ref[...].astype(jnp.float32) * tok_pos.astype(jnp.float32)
        s = jnp.where(valid, s, NEG_INF)

        m = m_scr[...]
        l = l_scr[...]
        acc = acc_scr[...]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)  # [H, bk]
        alpha = jnp.exp(m - m_new)
        l_scr[...] = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv_rows = []
        pb = p.astype(v.dtype)
        for j in range(hkv):
            sl = slice(j * d, (j + 1) * d)
            pj = pb[j * groups : (j + 1) * groups]  # [g, bk]
            vj = v[:, sl]  # [bk, d]
            pv_rows.append(
                jax.lax.dot_general(pj, vj, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            )
        pv = jnp.concatenate(pv_rows, axis=0) if hkv > 1 else pv_rows[0]
        acc_scr[...] = acc * alpha + pv
        m_scr[...] = m_new

    @pl.when(kb == num_kb - 1)
    def _finalize():
        l = l_scr[...]
        l_safe = jnp.where(l == 0, 1.0, l)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("groups", "span_start", "block_k", "interpret"),
)
def decode_attention(q, ck, cv, lengths, needed, slopes=None, *,
                     groups: int = 1, span_start: int = 0,
                     block_k: int = 128, interpret: bool = False):
    """q: [N, H, d]; ck/cv: [N, S, Hkv, d]; lengths: [N] prompt valid keys;
    needed: [N] total keys to visit (== lengths for contiguous caches, or
    span_start + step + 1 for the bucketed layout — same for all samples
    there). slopes: optional [H] ALiBi slopes. Returns [N, H, d]."""
    n, h, d = q.shape
    s = ck.shape[1]
    hkv = ck.shape[2]
    assert h % hkv == 0 and h // hkv == groups
    if s % block_k:
        block_k = next((b for b in (64, 32, 16, 8) if s % b == 0), None)
        if block_k is None:
            raise ValueError(
                f"decode_attention needs the cache length ({s}) divisible by 8; "
                "callers gate on this and fall back to the XLA path"
            )
    num_kb = s // block_k
    kf = ck.reshape(n, s, hkv * d)
    vf = cv.reshape(n, s, hkv * d)
    scalars = jnp.stack([lengths.astype(jnp.int32), needed.astype(jnp.int32)])
    alibi = slopes is not None
    slopes_arr = (
        slopes.astype(jnp.float32).reshape(h, 1)
        if alibi
        else jnp.zeros((h, 1), jnp.float32)
    )

    def kv_index(ni, kb, scalars_ref):
        # clamp to the last needed block: blocks past a sequence's length
        # revisit the previous index, so no new DMA is issued
        last = jnp.maximum((scalars_ref[1, ni] + block_k - 1) // block_k - 1, 0)
        return (ni, jnp.minimum(kb, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, num_kb),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda ni, kb, sref: (ni, 0, 0)),
            pl.BlockSpec((1, block_k, hkv * d), kv_index),
            pl.BlockSpec((1, block_k, hkv * d), kv_index),
            pl.BlockSpec((h, 1), lambda ni, kb, sref: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda ni, kb, sref: (ni, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel, bk=block_k, hkv=hkv, groups=groups, d=d, scale=d**-0.5,
        span_start=span_start, alibi=alibi,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, d), q.dtype),
        interpret=interpret,
    )(scalars, q, kf, vf, slopes_arr)


def decode_attention_reference(q, ck, cv, lengths, needed, slopes=None,
                               groups: int = 1, span_start: int = 0):
    """jnp oracle with identical semantics (fp32 softmax)."""
    n, h, d = q.shape
    s = ck.shape[1]
    hkv = ck.shape[2]
    k = jnp.repeat(ck, groups, axis=2) if groups > 1 else ck
    v = jnp.repeat(cv, groups, axis=2) if groups > 1 else cv
    logits = jnp.einsum("nhd,nshd->nhs", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (d**-0.5)
    kpos = jnp.arange(s)[None, None, :]
    if span_start > 0:
        in_prompt = kpos < lengths[:, None, None]
        in_span = (kpos >= span_start) & (kpos < needed[:, None, None])
        valid = in_prompt | in_span
        tok_pos = jnp.where(in_span, kpos - span_start + lengths[:, None, None], kpos)
    else:
        valid = kpos < needed[:, None, None]
        tok_pos = kpos
    if slopes is not None:
        logits = logits + slopes.astype(jnp.float32)[None, :, None] * tok_pos
    logits = jnp.where(valid, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("nhs,nshd->nhd", probs.astype(q.dtype), v)
