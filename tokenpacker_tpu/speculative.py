"""Speculative decoding via prompt-lookup (n-gram) drafting.

Beyond-reference serving feature (the reference decodes strictly one token
per forward, llava_llama.py:120-140 via HF generate): decode is
weight-bandwidth-bound, so a verify step that feeds k+1 tokens costs almost
the same HBM traffic as a 1-token step — every accepted draft token is a
nearly-free extra token. Drafts come from prompt-lookup (the continuation of
the EARLIEST earlier occurrence of the trailing n-gram — earliest maximizes
the available continuation on repetitive runs), which needs no draft model
and shines on the VLM serving workloads that quote/repeat prompt text (OCR
readout, captions, re-asked questions).

TPU-native design: drafting, verification, and acceptance all run on device
inside one `lax.while_loop` (`speculative_chunk`) — static shapes throughout
(fixed k, fixed token buffers, acceptance via cumprod-of-matches), one host
round trip per chunk rather than per round. Guarantees greedy parity: a
draft token is accepted only when it equals the verify step's own argmax, so
emitted tokens are exactly the plain-decode sequence.

Cache discipline: a verify round at decode step s writes KV for all k+1 fed
tokens (slots prefill_len+s .. +s+k). Rejected-draft slots hold stale K/V,
but the next round starts at s' = s+a+1 <= s+k+1 and itself writes slots
[s', s'+k] before attending, so stale slots are always overwritten before
they ever become attendable.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import TokenPackerVLMConfig
from tokenpacker_tpu.generate import _fd_jit
from tokenpacker_tpu.models.llama import KVCache
from tokenpacker_tpu.models.lm_api import lm_apply, lm_embed, lm_logits

NEG_INF = jnp.finfo(jnp.float32).min


def _fd_verify_mode(params, cfg, cache):
    """Fused-kernel dispatch for verify steps: the decode gate
    (generate._fused_decode_mode) plus a TOKENPACKER_FD_VERIFY=0 opt-out
    (decoupled so an on-chip verify regression can't take plain decode
    down with it)."""
    import os

    if os.environ.get("TOKENPACKER_FD_VERIFY", "1") in ("0", "off"):
        return None
    from tokenpacker_tpu.generate import _fused_decode_mode

    return _fused_decode_mode(params, cfg, cache)


def _verify_fused(params, cfg: TokenPackerVLMConfig, cache, tokens, lengths,
                  step, prefill_len: int, interpret: bool):
    """_verify semantics on the fused whole-stack kernel
    (ops/fused_decode.fused_verify_hidden): all T = k+1 fed tokens run in
    ONE weight-streaming pass — the kernel's in-chunk causal block scores
    the drafts, so a verify round costs ~a plain fused step instead of the
    XLA path's per-layer dispatch chain."""
    from tokenpacker_tpu.ops.fused_decode import fused_verify_hidden
    from tokenpacker_tpu.ops.layers import rms_norm

    n, t = tokens.shape
    offs = jnp.arange(t, dtype=jnp.int32)
    emb = lm_embed(params["lm"], cfg.lm, tokens)  # [N, T, D]
    positions = lengths[:, None] + step + offs[None, :]
    start2 = jnp.full_like(lengths, prefill_len)
    wpos0 = start2 + step
    out = fused_verify_hidden(
        params["lm"], cfg.lm, emb, cache.k, cache.v,
        lengths, start2, wpos0, wpos0, positions, interpret=interpret,
        k_scale=cache.k_scale, v_scale=cache.v_scale,
        slot_lora=params["lm"].get("fd_slot_lora"),
    )
    hidden, nk, nv = out[:3]
    nks, nvs = out[3:] if len(out) == 5 else (None, None)
    hidden = rms_norm(params["lm"]["norm"], hidden, cfg.lm.rms_norm_eps)
    logits = lm_logits(params["lm"], cfg.lm, hidden)
    # match the XLA path's returned length (cache_at.length + t)
    return logits, KVCache(nk, nv, prefill_len + step + t, nks, nvs)


def _verify(params, cfg: TokenPackerVLMConfig, cache, tokens, lengths, step,
            prefill_len: int):
    """Score k+1 tokens in one forward over the bucket-padded cache.

    tokens: [N, T] — the last accepted token followed by T-1 draft tokens.
    logits[:, j] is the next-token distribution after tokens[:, j], exactly
    what a sequence of T decode_step calls (generate.decode_step) would
    produce at steps step..step+T-1. Writes KV at slots prefill_len+step+j;
    query positions are lengths+step+j (RoPE/ALiBi stay exact under bucket
    padding, same per-sample position discipline as decode_step).

    Dispatches to the fused whole-stack kernel for quantized llama params
    on TPU (same gate as generate.decode_step, TOKENPACKER_FD_VERIFY=0
    opts out); the XLA per-layer path otherwise.
    """
    mode = _fd_verify_mode(params, cfg, cache)
    if mode:
        return _verify_fused(
            params, cfg, cache, tokens, lengths, step, prefill_len,
            interpret=mode == "interpret",
        )
    s_max = cache.k.shape[2]
    n, t = tokens.shape
    offs = jnp.arange(t, dtype=jnp.int32)
    positions = lengths[:, None] + step + offs[None, :]
    emb = lm_embed(params["lm"], cfg.lm, tokens)

    key_idx = jnp.arange(s_max)[None, None, :]
    prompt_ok = key_idx < lengths[:, None, None]  # [N, 1, S]
    dec_ok = (key_idx >= prefill_len) & (
        key_idx <= prefill_len + step + offs[None, :, None]
    )  # [1|N, T, S] — causal among the fed tokens
    ok = prompt_ok | dec_ok
    bias = jnp.where(ok[:, None], 0.0, NEG_INF).astype(jnp.float32)

    key_positions = None
    if cfg.lm.model_family == "mpt":
        ki = jnp.arange(s_max)[None, :]
        key_positions = jnp.where(
            ki >= prefill_len, ki - prefill_len + lengths[:, None], ki
        )

    cache_at = cache._replace(length=prefill_len + step)
    hidden, new_cache = lm_apply(
        params["lm"], cfg.lm, emb, positions, bias, cache_at,
        key_positions=key_positions,
    )
    logits = lm_logits(params["lm"], cfg.lm, hidden)
    return logits, new_cache


# _fd_jit: carries the fused kernel's compiler options (scoped-vmem limit)
# when it is the outermost jit — required since _verify can contain the
# fused whole-stack kernel
verify_step = partial(_fd_jit, static_argnames=("cfg", "prefill_len"))(_verify)


def _propose_ngram(ctx, ctx_len, k: int, ngram: int):
    """On-device prompt lookup. ctx: [S] int32 true token sequence (prompt +
    generated; -1 at image-placeholder/pad positions so they never match),
    ctx_len: scalar count of valid tokens. Returns (draft [k] int32,
    dk scalar int32 in [0, k]) — the continuation of the EARLIEST earlier
    occurrence of ctx[ctx_len-ngram : ctx_len] (earliest maximizes the
    available continuation on repetitive runs, matching the prompt-lookup
    reference heuristic).
    """
    s = ctx.shape[0]
    idx = jnp.arange(s, dtype=jnp.int32)
    suffix = jax.lax.dynamic_slice(ctx, (jnp.maximum(ctx_len - ngram, 0),), (ngram,))
    eq = idx < ctx_len - ngram  # window strictly before the suffix occurrence
    for j in range(ngram):
        eq &= jnp.roll(ctx, -j) == suffix[j]
    any_match = jnp.any(eq) & (ctx_len > ngram)
    best = jnp.argmax(eq).astype(jnp.int32)  # earliest match
    start = best + ngram
    # ctx is allocated with >= k slack past the max ctx_len (speculative_chunk
    # / Generator), so start+k never exceeds S and no clamp-shift can occur
    draft = jax.lax.dynamic_slice(ctx, (start,), (k,))
    dk = jnp.where(any_match, jnp.minimum(k, ctx_len - start), 0).astype(jnp.int32)
    return draft, dk


def propose_ngram_host(ctx: list[int], k: int, ngram: int = 2) -> list[int]:
    """Host mirror of `_propose_ngram` (streaming path): earliest earlier
    match of the trailing n-gram, continuation truncated to what exists."""
    if len(ctx) <= ngram or k <= 0:
        return []
    suffix = ctx[-ngram:]
    for i in range(len(ctx) - ngram):
        if ctx[i : i + ngram] == suffix:
            return list(ctx[i + ngram : i + ngram + k])
    return []


@partial(_fd_jit, static_argnames=("cfg",))
def verify_step_cb(params, cfg: TokenPackerVLMConfig, cache, tokens, cur_lens, active):
    """Continuous-batching verify step: score T = k+1 tokens PER SLOT in one
    forward over slot-contiguous caches (the speculative sibling of
    generate.decode_step_cb — each slot's acceptance advances independently,
    which the per-sample cache offsets support naturally).

    tokens: [N, T] — slot's last accepted token followed by its drafts
    (pad with -1 for slots with fewer drafts; they are never accepted).
    Writes K/V at cur_lens[i]+j; query j attends [0, cur_lens[i]+j].
    Returns (logits [N, T, V], new_cache) with lengths UNCHANGED — the host
    advances each slot by its own acceptance count. `active` is accepted for
    signature symmetry; inactive slots' writes land past their cur_len and
    are overwritten before ever becoming attendable (same invariant as the
    rejected-draft slots)."""
    del active
    mode = _fd_verify_mode(params, cfg, cache)
    if mode:
        from tokenpacker_tpu.ops.fused_decode import fused_verify_hidden
        from tokenpacker_tpu.ops.layers import rms_norm

        n, t = tokens.shape
        offs = jnp.arange(t, dtype=jnp.int32)
        emb = lm_embed(params["lm"], cfg.lm, tokens)
        zeros = jnp.zeros_like(cur_lens)
        out = fused_verify_hidden(
            params["lm"], cfg.lm, emb, cache.k, cache.v,
            cur_lens, zeros, zeros, cur_lens,
            cur_lens[:, None] + offs[None, :], interpret=mode == "interpret",
            k_scale=cache.k_scale, v_scale=cache.v_scale,
            slot_lora=params["lm"].get("fd_slot_lora"),
        )
        hidden, nk, nv = out[:3]
        nks, nvs = out[3:] if len(out) == 5 else (None, None)
        hidden = rms_norm(params["lm"]["norm"], hidden, cfg.lm.rms_norm_eps)
        logits = lm_logits(params["lm"], cfg.lm, hidden)
        return logits, KVCache(nk, nv, cur_lens, nks, nvs)
    s_max = cache.k.shape[2]
    n, t = tokens.shape
    offs = jnp.arange(t, dtype=jnp.int32)
    positions = cur_lens[:, None] + offs[None, :]
    emb = lm_embed(params["lm"], cfg.lm, tokens)
    key_idx = jnp.arange(s_max)[None, None, :]
    ok = key_idx <= positions[:, :, None]  # [N, T, S] causal per query
    bias = jnp.where(ok[:, None], 0.0, NEG_INF).astype(jnp.float32)
    cache_at = cache._replace(length=cur_lens)
    hidden, new_cache = lm_apply(params["lm"], cfg.lm, emb, positions, bias, cache_at)
    logits = lm_logits(params["lm"], cfg.lm, hidden)
    return logits, new_cache._replace(length=cur_lens)


def accept_greedy(preds_row, draft_row, dk: int, eos: int) -> list[int]:
    """Shared host-side acceptance: longest prefix of drafts matching the
    verify argmax, plus the bonus token; truncated at EOS. preds_row [T],
    draft_row [T-1] (the fed drafts). Returns the emitted burst."""
    burst = [int(preds_row[0])]
    for j in range(dk):
        if int(preds_row[j]) != int(draft_row[j]) or burst[-1] == eos:
            break
        burst.append(int(preds_row[j + 1]))
    return burst


@partial(
    _fd_jit,
    static_argnames=("cfg", "prefill_len", "n_max", "k", "ngram"),
    # the KV cache and ctx buffer are threaded through chunk calls; donating
    # them lets the while-loop carry alias the input (7B bf16 + an undonated
    # cache copy measured 56 MB past one v5e's HBM)
    donate_argnums=(2, 3),
)
def speculative_chunk(
    params, cfg: TokenPackerVLMConfig, cache, ctx, ctx_len, lengths, last_tok,
    step0, prefill_len: int, n_max: int, k: int, ngram: int = 2,
):
    """Generate >= n_max greedy tokens on device via draft->verify rounds
    (batch 1 — the latency path where speculation matters; throughput uses
    the continuous batcher).

    ctx: [S_ctx] int32 running token sequence (see _propose_ngram); must have
    at least n_max + k slack past its final ctx_len. ctx_len: scalar int32
    count of valid tokens in ctx (prompt true length + tokens generated so
    far). lengths: [1] int32 true prompt lengths (verify query positions,
    same as decode_step). last_tok: scalar int32 last emitted token. step0:
    the decode step that consumes last_tok (generate.decode_chunk
    convention). Cache needs capacity prefill_len + step0 + n_max + k + 1.

    Returns (out [n_max+k] int32, produced, cache, ctx, ctx_len, last_tok,
    rounds). out[:produced] are the emitted tokens, exactly the plain greedy
    sequence (n_max <= produced <= n_max+k — the last round may overshoot;
    callers truncate). rounds counts verify forwards: produced/rounds is the
    measured speedup factor over one-token decode.
    """

    def cond(carry):
        return carry[5] < n_max

    def body(carry):
        cache, ctx, ctx_len, last_tok, step, produced, rounds, out = carry
        draft, dk = _propose_ngram(ctx, ctx_len, k, ngram)
        tokens = jnp.concatenate([last_tok[None], draft])[None]  # [1, k+1]
        logits, cache = _verify(params, cfg, cache, tokens, lengths, step, prefill_len)
        preds = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # [k+1]
        # accept the longest prefix of drafts that match the model's own
        # argmax, plus the "bonus" token after it: emitted = preds[:a+1]
        match = (jnp.arange(k) < dk) & (preds[:k] == draft)
        a = jnp.sum(jnp.cumprod(match.astype(jnp.int32))).astype(jnp.int32)
        # write all k+1 preds; only `a+1` count — the rest are overwritten by
        # the next round (same trick as the KV slots)
        out = jax.lax.dynamic_update_slice(out, preds, (produced,))
        ctx = jax.lax.dynamic_update_slice(ctx, preds, (ctx_len,))
        adv = a + 1
        return (cache, ctx, ctx_len + adv, preds[a], step + adv,
                produced + adv, rounds + 1, out)

    out0 = jnp.zeros((n_max + k,), jnp.int32)
    zero = jnp.zeros((), jnp.int32)
    carry = (cache, ctx, ctx_len.astype(jnp.int32), last_tok.astype(jnp.int32),
             step0.astype(jnp.int32), zero, zero, out0)
    cache, ctx, ctx_len, last_tok, _, produced, rounds, out = jax.lax.while_loop(
        cond, body, carry
    )
    return out, produced, cache, ctx, ctx_len, last_tok, rounds


def make_ctx(token_ids_row, is_image_row, true_len: int, capacity: int):
    """Build the [capacity] int32 lookup buffer for speculative_chunk from a
    splice-plan row: image-placeholder positions and bucket padding become -1.
    A -1 can still match another -1 (a suffix that itself spans an image
    region may match an earlier image region), but such drafts are just
    rejected by verify — argmax is always >= 0 — so this only costs draft
    quality, never parity."""
    ctx = np.full((capacity,), -1, np.int32)
    row = np.asarray(token_ids_row, np.int64).copy()
    row[np.asarray(is_image_row, bool)] = -1
    row[true_len:] = -1
    n = min(len(row), capacity)
    ctx[:n] = row[:n].astype(np.int32)
    return ctx
