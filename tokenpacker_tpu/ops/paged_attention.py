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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(meta_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
            ps: int, hkv: int, groups: int, d: int, scale: float):
    """meta: [N, MP+1] int32 — page table rows with the length appended.
    Blocks: q [1, H, d], k/v [1, ps, Hkv*d] (one physical page), o [1, H, d]."""
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
        kpos = jb * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
        s = jnp.where(kpos < length, s, NEG_INF)

        m = m_scr[...]
        l = l_scr[...]
        acc = acc_scr[...]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_scr[...] = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pb = p.astype(v.dtype)
        pv_rows = []
        for j in range(hkv):
            sl = slice(j * d, (j + 1) * d)
            pv_rows.append(
                jax.lax.dot_general(pb[j * groups : (j + 1) * groups], v[:, sl],
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
                    groups: int = 1, interpret: bool = False):
    """q: [N, H, d]; k/v_pages: [P, ps, Hkv, d]; page_table: [N, MP] int32
    (physical page per logical block; unmapped blocks point at the reserved
    null page 0); lengths: [N] valid keys. Returns [N, H, d]."""
    n, h, d = q.shape
    p_total, ps, hkv, _ = k_pages.shape
    mp = page_table.shape[1]
    assert h % hkv == 0 and h // hkv == groups
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, mp),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda ni, jb, meta_ref: (ni, 0, 0)),
            pl.BlockSpec((1, ps, hkv * d), kv_index),
            pl.BlockSpec((1, ps, hkv * d), kv_index),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda ni, jb, meta_ref: (ni, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel, ps=ps, hkv=hkv, groups=groups, d=d, scale=d**-0.5,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, d), q.dtype),
        interpret=interpret,
    )(meta, q, kf, vf)
