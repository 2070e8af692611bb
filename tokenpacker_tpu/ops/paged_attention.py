"""Pallas paged decode attention (vLLM-style) for the paged KV pool.

The XLA paged path (ops/paged_kv._paged_layer) gathers each sequence's
pages into a dense [N, MP*ps, H, D] tensor every layer — at 8 slots x 1024
max positions that is ~64 MB of HBM gather traffic per layer before the
attention even runs. This kernel reads pages IN PLACE: the page table rides
scalar prefetch, the KV block index maps translate (sequence, logical
block) -> physical page, and blocks past a sequence's length are clamped to
the previous index so they are never DMA'd.

Layout: q [N, H, d]; pool k/v [P, ps, H, d] viewed as [P, ps, H*d] (the
page dimension is the block dimension, one page per grid step); page_table
[N, MP] int32; lengths [N] = number of valid keys (including the token
written this step). Per-kv-head lane slices are d-aligned. Online-softmax
state lives in VMEM scratch across the logical-block grid dimension, same
structure as ops/decode_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(meta_ref, q_ref, k_ref, v_ref, *rest, ps: int, hkv: int,
            groups: int, d: int, scale: float, int8_kv: bool):
    """meta: [N, MP+1] int32 — page table rows with the length appended.
    Blocks: q [1, H, d], k/v [1, ps, Hkv*d] (one physical page), o [1, H, d].

    int8_kv: k/v pages are int8 with per-(position, kv-head) absmax scales
    (ops/kv_quant) riding as extra [1, ps, Hkv] f32 blocks. The scales are
    never applied to K/V directly — they COMMUTE into the [H, ps] logit and
    probability matrices (q·(k·s) == (q·k)·s per position), expanded from
    kv-heads to heads by one tiny MXU dot — so the dequant costs O(H·ps)
    VPU work per block instead of O(Hkv·ps·d)."""
    if int8_kv:
        ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    n_i = pl.program_id(0)
    jb = pl.program_id(1)
    num_jb = pl.num_programs(1)
    mp = num_jb
    length = meta_ref[n_i, mp]
    h = hkv * groups

    @pl.when(jb == 0)
    def _init():
        m_scr[...] = jnp.full((h, 1), NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros((h, 1), jnp.float32)
        acc_scr[...] = jnp.zeros((h, d), jnp.float32)

    @pl.when(jb * ps < length)
    def _block():
        q = q_ref[0].astype(jnp.float32) * scale  # [H, d]
        k = k_ref[0]  # [ps, Hkv*d]
        v = v_ref[0]
        if int8_kv:
            # kv-head → head expansion matrix (row g·j + g' selects kv-head
            # j), built from iotas in-kernel — a captured jnp constant is
            # rejected by pallas_call
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (h, hkv), 0)
            cols_i = jax.lax.broadcasted_iota(jnp.int32, (h, hkv), 1)
            expand = (rows_i // groups == cols_i).astype(jnp.float32)  # [H, Hkv]
            ks_full = jax.lax.dot_general(
                expand, ks_ref[0].astype(jnp.float32),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )  # [H, ps]
            vs_full = jax.lax.dot_general(
                expand, vs_ref[0].astype(jnp.float32),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
        rows = []
        for j in range(hkv):
            sl = slice(j * d, (j + 1) * d)
            qj = q[j * groups : (j + 1) * groups]
            rows.append(
                jax.lax.dot_general(qj, k[:, sl].astype(jnp.float32),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            )
        s = jnp.concatenate(rows, axis=0) if hkv > 1 else rows[0]  # [H, ps]
        if int8_kv:
            s = s * ks_full
        kpos = jb * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
        s = jnp.where(kpos < length, s, NEG_INF)

        m = m_scr[...]
        l = l_scr[...]
        acc = acc_scr[...]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_scr[...] = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if int8_kv:
            pb = p * vs_full  # f32; V stays int8 and is cast at the dot
        else:
            pb = p.astype(v.dtype)
        pv_rows = []
        for j in range(hkv):
            sl = slice(j * d, (j + 1) * d)
            vj = v[:, sl].astype(jnp.float32) if int8_kv else v[:, sl]
            pv_rows.append(
                jax.lax.dot_general(pb[j * groups : (j + 1) * groups], vj,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            )
        pv = jnp.concatenate(pv_rows, axis=0) if hkv > 1 else pv_rows[0]
        acc_scr[...] = acc * alpha + pv
        m_scr[...] = m_new

    @pl.when(jb == num_jb - 1)
    def _finalize():
        l = l_scr[...]
        l_safe = jnp.where(l == 0, 1.0, l)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "interpret"))
def paged_attention(q, k_pages, v_pages, page_table, lengths, *,
                    k_scales=None, v_scales=None,
                    groups: int = 1, interpret: bool = False):
    """q: [N, H, d]; k/v_pages: [P, ps, Hkv, d]; page_table: [N, MP] int32
    (physical page per logical block; unmapped blocks point at the reserved
    null page 0); lengths: [N] valid keys. k/v_scales: [P, ps, Hkv] f32
    when the pages are int8-quantized (ops/kv_quant). Returns [N, H, d]."""
    n, h, d = q.shape
    p_total, ps, hkv, _ = k_pages.shape
    mp = page_table.shape[1]
    assert h % hkv == 0 and h // hkv == groups
    int8_kv = k_scales is not None
    kf = k_pages.reshape(p_total, ps, hkv * d)
    vf = v_pages.reshape(p_total, ps, hkv * d)
    meta = jnp.concatenate(
        [page_table.astype(jnp.int32), lengths.astype(jnp.int32)[:, None]], axis=1
    )  # [N, MP+1]

    def kv_index(ni, jb, meta_ref):
        length = meta_ref[ni, mp]
        last = jnp.maximum((length + ps - 1) // ps - 1, 0)
        jc = jnp.minimum(jb, last)
        return (meta_ref[ni, jc], 0, 0)

    in_specs = [
        pl.BlockSpec((1, h, d), lambda ni, jb, meta_ref: (ni, 0, 0)),
        pl.BlockSpec((1, ps, hkv * d), kv_index),
        pl.BlockSpec((1, ps, hkv * d), kv_index),
    ]
    operands = [meta, q, kf, vf]
    if int8_kv:
        in_specs += [
            pl.BlockSpec((1, ps, hkv), kv_index),
            pl.BlockSpec((1, ps, hkv), kv_index),
        ]
        operands += [k_scales, v_scales]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, mp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, d), lambda ni, jb, meta_ref: (ni, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel, ps=ps, hkv=hkv, groups=groups, d=d, scale=d**-0.5,
        int8_kv=int8_kv,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, d), q.dtype),
        interpret=interpret,
    )(*operands)
