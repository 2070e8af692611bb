"""Paged KV cache — block-table attention for serving (vLLM-style).

BASELINE.json's north star calls for "prefill+decode with paged KV": instead
of one contiguous [B, S_max] cache per slot, K/V live in a shared pool of
fixed-size pages; each sequence owns a page table. Memory scales with the
sum of actual sequence lengths (pages allocate on demand), not
B × S_max — the difference between fitting 8 and 20 concurrent HD
requests in HBM.

Device side (jit, static shapes): per layer, the new token's K/V scatter
into (page, offset); attention gathers the sequence's pages via the page
table and runs the same masked SDPA. Host side: `PageAllocator` free list.

Layout:
  k_pages/v_pages: [L, P, page_size, H, D]   (P = total pages in the pool)
  page_table:      [B, max_pages]  int32     (physical page per logical block)
  lengths:         [B]             int32
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import LMConfig
from tokenpacker_tpu.models.llama import (
    _sdpa,
    apply_rope,
    mlp_block,
    qkv_proj,
    rope_cos_sin,
)
from tokenpacker_tpu.ops.layers import linear, rms_norm

NEG_INF = jnp.finfo(jnp.float32).min


def _use_paged_kernel() -> bool:
    """Default ON for TPU (the XLA path's page gather materializes the
    dense cache every layer); TOKENPACKER_PAGED_ATTN=xla opts out,
    =pallas forces it (interpret mode) on CPU."""
    import os

    impl = os.environ.get("TOKENPACKER_PAGED_ATTN")
    if impl == "xla":
        return False
    return impl == "pallas" or jax.default_backend() == "tpu"


class PagedKV(NamedTuple):
    k_pages: jax.Array  # [L, P, ps, H, D] (bf16, or int8 quantized)
    v_pages: jax.Array
    page_table: jax.Array  # [B, MP] int32
    lengths: jax.Array  # [B] int32
    # per-(position, kv-head) absmax scales when pages are int8
    # (ops/kv_quant): [L, P, ps, H] f32; None for float pools
    k_scales: jax.Array | None = None
    v_scales: jax.Array | None = None

    @classmethod
    def create(cls, cfg: LMConfig, num_pages: int, page_size: int, batch: int,
               max_pages_per_seq: int, dtype=jnp.bfloat16):
        shape = (cfg.num_hidden_layers, num_pages, page_size, cfg.kv_heads, cfg.head_dim)
        scales = (None, None)
        if dtype == jnp.int8:
            scales = tuple(jnp.zeros(shape[:-1], jnp.float32) for _ in range(2))
        return cls(
            jnp.zeros(shape, dtype),
            jnp.zeros(shape, dtype),
            jnp.zeros((batch, max_pages_per_seq), jnp.int32),
            jnp.zeros((batch,), jnp.int32),
            *scales,
        )

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[2]


class PageAllocator:
    """Host-side refcounted free list over the physical page pool. Page 0
    is reserved as the null page (unmapped logical blocks point at it).

    Refcounts exist for prefix caching (serve/prefix_cache.py): a cached
    block is referenced both by the cache and by every sequence whose page
    table maps it; the page returns to the free list only when the last
    reference is released."""

    def __init__(self, num_pages: int):
        self.free = list(range(num_pages - 1, 0, -1))
        self.refs: dict[int, int] = {}

    def alloc(self, n: int = 1) -> list[int]:
        if len(self.free) < n:
            raise RuntimeError("paged KV pool exhausted")
        out = [self.free.pop() for _ in range(n)]
        for p in out:
            self.refs[p] = 1
        return out

    def incref(self, page: int) -> None:
        p = int(page)
        if p not in self.refs:
            raise RuntimeError(f"incref of untracked page {p}")
        self.refs[p] += 1

    def release(self, pages) -> None:
        for p in pages:
            p = int(p)
            if p == 0:
                continue
            # fail fast on double release: silently re-appending an
            # untracked page to the free list would hand the same physical
            # page to two sequences and corrupt shared KV (ADVICE r4)
            if p not in self.refs:
                raise RuntimeError(
                    f"release of untracked page {p} (double free?)")
            left = self.refs[p] - 1
            if left <= 0:
                del self.refs[p]
                self.free.append(p)
            else:
                self.refs[p] = left

    def available(self) -> int:
        return len(self.free)


def _paged_layer(p, cfg: LMConfig, x, cos, sin, bias, kp, vp, page_table, cur_lens,
                 write_page, ks=None, vs=None):
    """One decode-layer over the paged cache. x: [N, 1, D].

    write_page: [N] physical page each sequence writes its new K/V into —
    inactive slots are routed to the reserved null page 0 by the caller so
    their (stale) page tables never corrupt re-allocated pages.
    ks/vs: [P, ps, H] f32 scale pages when kp/vp are int8 (ops/kv_quant)."""
    n = x.shape[0]
    ps = kp.shape[1]  # kp is layer-sliced: [P, ps, H, D]
    int8_pages = kp.dtype == jnp.int8
    h = rms_norm(p["input_ln"], x, cfg.rms_norm_eps)
    q, k, v = qkv_proj(p["attn"], cfg, h)  # fused-qkv aware (load_8bit layout)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    # scatter the new K/V into (page, offset)
    off = cur_lens % ps
    if int8_pages:
        from tokenpacker_tpu.ops.kv_quant import quantize_kv

        k_st, k_sc = quantize_kv(k[:, 0])  # [N, H, D] int8, [N, H] f32
        v_st, v_sc = quantize_kv(v[:, 0])
        kp = kp.at[write_page, off].set(k_st)
        vp = vp.at[write_page, off].set(v_st)
        ks = ks.at[write_page, off].set(k_sc)
        vs = vs.at[write_page, off].set(v_sc)
    else:
        kp = kp.at[write_page, off].set(k[:, 0].astype(kp.dtype))
        vp = vp.at[write_page, off].set(v[:, 0].astype(vp.dtype))

    if _use_paged_kernel():
        # vLLM-style Pallas paged attention: pages read in place via the
        # scalar-prefetched table — no [N, MP*ps, H, D] gather tensor.
        # int8 pools pass their scale pages; the kernel folds them into the
        # logit/probability matrices (never dequantizing K/V).
        from tokenpacker_tpu.ops.paged_attention import paged_attention

        attn = paged_attention(
            q[:, 0], kp, vp, page_table, cur_lens + 1,
            k_scales=ks if int8_pages else None,
            v_scales=vs if int8_pages else None,
            groups=cfg.num_attention_heads // cfg.kv_heads,
            interpret=jax.default_backend() != "tpu",
        )[:, None]
    else:
        # gather this sequence's pages: [N, MP, ps, H, D] → [N, S_max, H, D]
        kg = kp[page_table].reshape(n, -1, cfg.kv_heads, cfg.head_dim)
        vg = vp[page_table].reshape(n, -1, cfg.kv_heads, cfg.head_dim)
        if int8_pages:
            from tokenpacker_tpu.ops.kv_quant import dequantize_kv

            kg = dequantize_kv(kg, ks[page_table].reshape(n, -1, cfg.kv_heads), q.dtype)
            vg = dequantize_kv(vg, vs[page_table].reshape(n, -1, cfg.kv_heads), q.dtype)
            attn = _sdpa(q, kg, vg, bias)
        else:
            attn = _sdpa(q, kg.astype(q.dtype), vg.astype(q.dtype), bias)

    x = x + linear(p["attn"]["o"], attn.reshape(n, 1, -1))
    h2 = rms_norm(p["post_ln"], x, cfg.rms_norm_eps)
    h2 = mlp_block(p["mlp"], cfg, h2)
    return x + h2, kp, vp, ks, vs


def paged_decode_step(params, cfg, paged: PagedKV, tokens, active):
    """One token across all sequences over the paged cache.

    tokens: [N]; paged.lengths are the current sequence lengths (= write
    positions). Returns (logits, new PagedKV with lengths advanced where
    active). cfg: TokenPackerVLMConfig.
    """
    from tokenpacker_tpu.models.lm_api import lm_embed, lm_logits

    lm_cfg = cfg.lm
    n = tokens.shape[0]
    mp = paged.page_table.shape[1]
    ps = paged.page_size
    s_max = mp * ps
    cur_lens = paged.lengths
    positions = cur_lens[:, None]
    emb = lm_embed(params["lm"], lm_cfg, tokens[:, None])
    cos, sin = rope_cos_sin(positions, lm_cfg.head_dim, lm_cfg.rope_theta)

    key_idx = jnp.arange(s_max)[None, :]
    key_valid = key_idx <= cur_lens[:, None]
    bias = jnp.where(key_valid[:, None, None, :], 0.0, NEG_INF).astype(jnp.float32)

    # Inactive slots may hold stale page tables whose pages have been freed
    # and re-allocated; route their writes to the reserved null page 0.
    rows = jnp.arange(n)
    ps_sz = paged.page_size
    write_page = jnp.where(active, paged.page_table[rows, cur_lens // ps_sz], 0)

    int8_pages = paged.k_pages.dtype == jnp.int8

    def step(carry, xs):
        x = carry
        layer_params, kp, vp, *scales = xs
        x, kp, vp, ks, vs = _paged_layer(
            layer_params, lm_cfg, x, cos, sin, bias, kp, vp, paged.page_table, cur_lens,
            write_page, *scales,
        )
        return x, (kp, vp, ks, vs) if int8_pages else (kp, vp)

    xs = (params["lm"]["layers"], paged.k_pages, paged.v_pages)
    if int8_pages:
        xs += (paged.k_scales, paged.v_scales)
    x, out = jax.lax.scan(step, emb, xs)
    x = rms_norm(params["lm"]["norm"], x, lm_cfg.rms_norm_eps)
    logits = lm_logits(params["lm"], lm_cfg, x[:, 0])
    new_lens = cur_lens + active.astype(cur_lens.dtype)
    if int8_pages:
        nkp, nvp, nks, nvs = out
        return logits, PagedKV(nkp, nvp, paged.page_table, new_lens, nks, nvs)
    nkp, nvp = out
    return logits, PagedKV(nkp, nvp, paged.page_table, new_lens)


paged_decode_step_jit = jax.jit(paged_decode_step, static_argnames=("cfg",))


def _paged_verify_layer(p, cfg: LMConfig, x, cos, sin, bias, kp, vp, page_table,
                        write_page, write_off, ks=None, vs=None):
    """Verify-layer over the paged cache: x [N, T, D], K/V for all T tokens
    scatter into (write_page, write_off) [N, T]. Attention uses the page
    GATHER path (the Pallas paged kernel is single-token); plain decode
    rounds keep the kernel."""
    n, t, _ = x.shape
    int8_pages = kp.dtype == jnp.int8
    h = rms_norm(p["input_ln"], x, cfg.rms_norm_eps)
    q, k, v = qkv_proj(p["attn"], cfg, h)  # fused-qkv aware (load_8bit layout)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if int8_pages:
        from tokenpacker_tpu.ops.kv_quant import dequantize_kv, quantize_kv

        k_st, k_sc = quantize_kv(k)  # [N, T, H, D] int8, [N, T, H] f32
        v_st, v_sc = quantize_kv(v)
        kp = kp.at[write_page, write_off].set(k_st)
        vp = vp.at[write_page, write_off].set(v_st)
        ks = ks.at[write_page, write_off].set(k_sc)
        vs = vs.at[write_page, write_off].set(v_sc)
        kg = dequantize_kv(
            kp[page_table].reshape(n, -1, cfg.kv_heads, cfg.head_dim),
            ks[page_table].reshape(n, -1, cfg.kv_heads), q.dtype,
        )
        vg = dequantize_kv(
            vp[page_table].reshape(n, -1, cfg.kv_heads, cfg.head_dim),
            vs[page_table].reshape(n, -1, cfg.kv_heads), q.dtype,
        )
    else:
        kp = kp.at[write_page, write_off].set(k.astype(kp.dtype))
        vp = vp.at[write_page, write_off].set(v.astype(vp.dtype))
        kg = kp[page_table].reshape(n, -1, cfg.kv_heads, cfg.head_dim).astype(q.dtype)
        vg = vp[page_table].reshape(n, -1, cfg.kv_heads, cfg.head_dim).astype(q.dtype)
    attn = _sdpa(q, kg, vg, bias)
    x = x + linear(p["attn"]["o"], attn.reshape(n, t, -1))
    h2 = rms_norm(p["post_ln"], x, cfg.rms_norm_eps)
    h2 = mlp_block(p["mlp"], cfg, h2)
    return x + h2, kp, vp, ks, vs


def paged_verify_step(params, cfg, paged: PagedKV, tokens, active):
    """Speculative verify over the paged cache: score T = k+1 tokens per
    sequence in one forward (the paged sibling of speculative.verify_step_cb).

    tokens: [N, T] — last accepted token + drafts (-1 padding). Writes K/V at
    positions lengths+j through the page tables (the caller must have mapped
    pages covering lengths+T-1 — PagedContinuousBatcher._grow_pages grows
    with a k-token lookahead when speculating). Inactive slots write to the
    reserved null page 0. Returns (logits [N, T, V], PagedKV with lengths
    UNCHANGED — the host advances each sequence by its own acceptance).
    Rejected-token page entries are overwritten before ever becoming
    attendable (the next round writes [len', len'+k] before attending)."""
    from tokenpacker_tpu.models.lm_api import lm_embed, lm_logits

    lm_cfg = cfg.lm
    n, t = tokens.shape
    mp = paged.page_table.shape[1]
    ps = paged.page_size
    s_max = mp * ps
    cur_lens = paged.lengths
    offs = jnp.arange(t, dtype=jnp.int32)
    positions = cur_lens[:, None] + offs[None, :]  # [N, T]
    emb = lm_embed(params["lm"], lm_cfg, tokens)
    cos, sin = rope_cos_sin(positions, lm_cfg.head_dim, lm_cfg.rope_theta)

    key_idx = jnp.arange(s_max)[None, None, :]
    ok = key_idx <= positions[:, :, None]  # [N, T, S] causal per fed token
    bias = jnp.where(ok[:, None], 0.0, NEG_INF).astype(jnp.float32)

    rows = jnp.arange(n)[:, None]
    in_range = positions // ps < mp  # past-capacity writes go to null page 0
    blocks = jnp.minimum(positions // ps, mp - 1)
    write_page = jnp.where(
        active[:, None] & in_range, paged.page_table[rows, blocks], 0
    )  # [N, T]
    write_off = positions % ps

    int8_pages = paged.k_pages.dtype == jnp.int8

    def step(carry, xs):
        x = carry
        layer_params, kp, vp, *scales = xs
        x, kp, vp, ks, vs = _paged_verify_layer(
            layer_params, lm_cfg, x, cos, sin, bias, kp, vp, paged.page_table,
            write_page, write_off, *scales,
        )
        return x, (kp, vp, ks, vs) if int8_pages else (kp, vp)

    xs = (params["lm"]["layers"], paged.k_pages, paged.v_pages)
    if int8_pages:
        xs += (paged.k_scales, paged.v_scales)
    x, out = jax.lax.scan(step, emb, xs)
    x = rms_norm(params["lm"]["norm"], x, lm_cfg.rms_norm_eps)
    logits = lm_logits(params["lm"], lm_cfg, x)
    if int8_pages:
        nkp, nvp, nks, nvs = out
        return logits, PagedKV(nkp, nvp, paged.page_table, cur_lens, nks, nvs)
    nkp, nvp = out
    return logits, PagedKV(nkp, nvp, paged.page_table, cur_lens)


paged_verify_step_jit = jax.jit(paged_verify_step, static_argnames=("cfg",))


def insert_prefill(paged: PagedKV, small_cache, seq: int, page_ids, length,
                   first_block: int = 0):
    """Copy a batch-1 prefilled contiguous cache (k/v [L, 1, L_pad, H, D])
    into freshly allocated pages and map them in sequence `seq`'s table.

    first_block > 0 (prefix-cache suffix admission): only rows
    [first_block·ps, first_block·ps + len(page_ids)·ps) of the small cache
    are copied, into table blocks [first_block, ...); the caller maps the
    shared prefix blocks separately (map_blocks). L_pad must cover the
    copied range and be a multiple of page_size.
    """
    ps = paged.page_size
    l_pad = small_cache.k.shape[2]
    n_pages = len(page_ids)
    start = first_block * ps
    assert l_pad % ps == 0, "prefill pad must be a multiple of page_size"
    assert start + n_pages * ps <= l_pad, "page ids exceed the prefilled range"
    ids = jnp.asarray(page_ids, jnp.int32)
    layers = paged.k_pages.shape[0]
    kp = paged.k_pages.at[:, ids].set(
        small_cache.k[:, 0, start:start + n_pages * ps].reshape(
            layers, n_pages, ps, *paged.k_pages.shape[3:])
    )
    vp = paged.v_pages.at[:, ids].set(
        small_cache.v[:, 0, start:start + n_pages * ps].reshape(
            layers, n_pages, ps, *paged.v_pages.shape[3:])
    )
    table = paged.page_table.at[seq, first_block:first_block + n_pages].set(ids)
    lens = paged.lengths.at[seq].set(length)
    out = paged._replace(k_pages=kp, v_pages=vp, page_table=table, lengths=lens)
    if paged.k_scales is not None:
        # int8 pool: the admission prefill produced an int8 small cache
        # (models/llama.kv_cache_dtype reads the same env) with matching scales
        h = paged.k_scales.shape[3]
        out = out._replace(
            k_scales=paged.k_scales.at[:, ids].set(
                small_cache.k_scale[:, 0, start:start + n_pages * ps].reshape(
                    layers, n_pages, ps, h)
            ),
            v_scales=paged.v_scales.at[:, ids].set(
                small_cache.v_scale[:, 0, start:start + n_pages * ps].reshape(
                    layers, n_pages, ps, h)
            ),
        )
    return out


def map_blocks(paged: PagedKV, seq: int, start_block: int, page_ids) -> PagedKV:
    """Map a run of physical pages into a sequence's table starting at
    logical block `start_block` (prefix-cache sharing: the same physical
    page may appear in several sequences' tables — reads are position-gated
    and writes only ever target blocks past the shared prefix)."""
    if len(page_ids) == 0:
        return paged
    return paged._replace(
        page_table=paged.page_table.at[
            seq, start_block:start_block + len(page_ids)
        ].set(jnp.asarray(page_ids, jnp.int32))
    )


@jax.jit
def _gather_prefix_rows(pages, ids):
    """[L, P, ps, …] pages + [m] ids → [L, m·ps, …] contiguous rows."""
    layers = pages.shape[0]
    return pages[:, ids].reshape(layers, ids.shape[0] * pages.shape[2], *pages.shape[3:])


def gather_prefix(paged: PagedKV, page_ids, l_pad: int):
    """Materialize `page_ids`' cached content into a batch-1 dense KVCache
    of width l_pad (rows [0, m·ps) filled, the rest zeros) so a suffix-only
    prefill (generate.prefill_chunk at offset m·ps) can attend to the
    shared prefix. Returns a models.llama.KVCache with length 0 (the
    chunked-prefill convention: the chunk call sets its own offset)."""
    from tokenpacker_tpu.models.llama import KVCache

    ids = jnp.asarray(page_ids, jnp.int32)
    m = len(page_ids)
    ps = paged.page_size

    def dense(pages):
        rows = _gather_prefix_rows(pages, ids)
        out = jnp.zeros((pages.shape[0], l_pad, *pages.shape[3:]), pages.dtype)
        return out.at[:, : m * ps].set(rows)[:, None]

    scales = (None, None)
    if paged.k_scales is not None:
        scales = (dense(paged.k_scales), dense(paged.v_scales))
    return KVCache(
        dense(paged.k_pages), dense(paged.v_pages), jnp.asarray(0, jnp.int32), *scales
    )


def map_page(paged: PagedKV, seq: int, logical_block: int, page_id: int):
    """Map one more physical page into a sequence's table (on-demand growth)."""
    return paged._replace(
        page_table=paged.page_table.at[seq, logical_block].set(page_id)
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "first_block", "chunk_len"),
    donate_argnums=(0,),
)
def prefix_admit(paged: PagedKV, params, cfg, shared_ids, fresh_ids, visual,
                 token_chunk, is_image_chunk, image_slot_chunk, seq, true_len,
                 first_block: int, chunk_len: int):
    """One-dispatch warm admission (prefix-cache hit): gather the shared
    pages into a dense prefix, prefill ONLY the suffix chunk against it,
    scatter the suffix K/V into the fresh pages, map the full table row and
    set the length — the whole device side of a prefix-hit admission as a
    single jitted program. The eager sequence (gather + chunk + 4-6 page
    inserts + table map) costs ~15 dispatches; over a high-latency link
    that overhead dominates warm-admission TTFT. The pool is donated (the
    output aliases its storage).

    Returns (last-token logits [1, V], new PagedKV). cfg is the VLM config;
    seq/true_len are traced scalars so slots don't retrace."""
    from tokenpacker_tpu.generate import prefill_chunk
    from tokenpacker_tpu.models.lm_api import lm_logits

    ps = paged.page_size
    start = first_block * ps
    l_pad = start + chunk_len
    small = gather_prefix(paged, shared_ids, l_pad)
    hidden, small = prefill_chunk(
        params, cfg, small, visual, token_chunk, is_image_chunk,
        image_slot_chunk, start, chunk_len,
    )
    idx = jnp.clip(true_len - 1 - start, 0, chunk_len - 1)
    last = jax.lax.dynamic_index_in_dim(hidden, idx, axis=1)  # [1, 1, D]
    logits = lm_logits(params["lm"], cfg.lm, last[:, 0])

    n_fresh = fresh_ids.shape[0]
    layers = paged.k_pages.shape[0]

    def put(pages, rows):
        seg = rows[:, 0, start:start + n_fresh * ps].reshape(
            layers, n_fresh, ps, *pages.shape[3:])
        return pages.at[:, fresh_ids].set(seg)

    table = paged.page_table.at[seq, :first_block].set(shared_ids)
    table = table.at[
        jnp.full((n_fresh,), seq), first_block + jnp.arange(n_fresh)
    ].set(fresh_ids)
    out = paged._replace(
        k_pages=put(paged.k_pages, small.k),
        v_pages=put(paged.v_pages, small.v),
        page_table=table,
        lengths=paged.lengths.at[seq].set(true_len),
    )
    if paged.k_scales is not None:
        out = out._replace(
            k_scales=put(paged.k_scales, small.k_scale),
            v_scales=put(paged.v_scales, small.v_scale),
        )
    return logits, out
