"""Beam search decoding — HF-faithful semantics, compiled as ONE program.

Every reference eval CLI exposes ``--num_beams`` and forwards it to HF
``model.generate`` (e.g. llava/eval/model_vqa_loader.py:181,220,
llava/eval/model_vqa.py:150,189; llava/eval/mmmu/eval/utils/model_utils.py:52
even hardcodes ``num_beams=5``), so a user migrating from the reference can
ask for beams anywhere. The reference gets the algorithm for free from HF's
``GenerationMixin``; this module is the TPU-native equivalent.

Parity target is transformers 4.57's vectorized ``_beam_search``
(generation/utils.py:3113): running vs finished beam sets, top-``2k``
continuations per step, additive ``-1e9`` masking, and the early-stopping
heuristic — a formulation that is already static-shaped, so it maps
directly onto ``lax.while_loop``:

- the WHOLE search (decode steps + candidate selection + finished-beam
  bookkeeping) is one jitted program per (bucket, num_beams,
  max_new_tokens) — no per-step host round trips (HF pays a host sync per
  step for its python loop);
- beam reorder is a batch-axis gather on the KV cache
  (``_reorder_cache`` in HF), which XLA fuses with the decode step's cache
  update;
- the decode step itself is generate.decode_step, so beams ride whatever
  path the params select (XLA per-layer, or the fused whole-stack kernel
  for int8 trees — the batch×beam product is the kernel's batch dim);
- the search is BATCHED (unlike the reference's batch-1 eval loops): n
  requests × k beams decode as one n·k-row step, with the per-sample
  candidate selection vmapped. A sample that finishes early is frozen
  (per-sample state keeps its value while the rest of the batch runs),
  which makes each sample's result exactly its batch-1 result.

Matched semantics (verified token-exact against transformers 4.57 in
tests/test_beam.py): do_sample=False, length_penalty (any float),
early_stopping in {False, True, "never"}, EOS-or-max-length stopping,
finished sequences INCLUDE their terminal EOS (4.57 behavior). Sampled
beam search (do_sample=True + num_beams>1) is not implemented — the only
reference path using it is dead code (mmmu model_utils.py vs the actually
imported model_utils_ind, run_llava.py:16) — callers fall back to plain
sampling.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import TokenPackerVLMConfig
from tokenpacker_tpu.generate import _fd_jit, decode_step, device_batch, prefill

_NEG = jnp.float32(-1.0e9)


def _tile_cache(cache, k: int):
    """[L, n, ...] prefill cache → [L, n·k, ...] sample-major (each sample's
    k beams are adjacent rows; all beams share their sample's prompt)."""
    rep = lambda a: None if a is None else jnp.repeat(a, k, axis=1)
    return cache._replace(
        k=rep(cache.k), v=rep(cache.v),
        k_scale=rep(cache.k_scale), v_scale=rep(cache.v_scale),
    )


def _gather_cache(cache, idx, lo: int = 0, hi: int | None = None):
    """Reorder the beam axis — HF's ``reorder_cache`` as a device gather
    (idx is flat over the n·k rows).

    [lo, hi) restricts the reorder to the decoded span: the tiled prompt
    region is bit-identical across a sample's beams (and idx never crosses
    samples), so reordering it is a no-op — skipping it cuts the per-step
    gather traffic from O(S_max) to O(max_new) rows (scripts/bench_beam.py
    measures the difference)."""
    def take(a):
        if a is None:
            return None
        if lo == 0 and hi is None:
            return jnp.take(a, idx, axis=1)
        span = jnp.take(a[:, :, lo:hi], idx, axis=1)
        return a.at[:, :, lo:hi].set(span)

    return cache._replace(
        k=take(cache.k), v=take(cache.v),
        k_scale=take(cache.k_scale), v_scale=take(cache.v_scale),
    )


def _select(st, logits, t, *, k, vocab, max_new, eos, lp, early_stopping):
    """One candidate-selection round for ONE sample (HF
    _get_top_k_continuations + _get_running_beams_for_next_iteration +
    _update_finished_beams + _check_early_stop_heuristic). ``t`` is the
    column the chosen tokens land in; masking is ADDITIVE -1e9 terms,
    matching HF's arithmetic exactly so tie-breaking agrees. vmapped over
    the batch by the caller."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    acc = logp + st["run_scores"][:, None]  # [k, V]
    vals, idx = jax.lax.top_k(acc.reshape(-1), 2 * k)
    src = idx // vocab
    tok = (idx % vocab).astype(jnp.int32)
    cand_seqs = jnp.take(st["run_seqs"], src, axis=0).at[:, t].set(tok)
    # stopping criteria on each candidate: EOS, or the sequence hits
    # max_length (prompt + t + 1 == prompt + max_new)
    hits = (tok == eos) | (t + 1 >= max_new)

    # ---- finished-beam update (only top-k-ranked candidates may finish)
    pen = vals / (t + 1).astype(jnp.float32) ** lp
    did_finish = hits & (jnp.arange(2 * k) < k)
    fin = pen + (~did_finish).astype(jnp.float32) * _NEG
    fin = fin + (~st["unsat"]).astype(jnp.float32) * _NEG
    if early_stopping is True:
        fin = fin + jnp.all(st["fin_flags"]).astype(jnp.float32) * _NEG
    m_scores = jnp.concatenate([st["fin_scores"], fin])
    fvals, fidx = jax.lax.top_k(m_scores, k)
    gather = lambda a, b: jnp.take(jnp.concatenate([a, b], 0), fidx, axis=0)
    fin_seqs = gather(st["fin_seqs"], cand_seqs)
    fin_lens = gather(st["fin_lens"], jnp.full((2 * k,), t + 1, jnp.int32))
    fin_flags = gather(st["fin_flags"], did_finish)

    # ---- running beams for the next step (finished candidates demoted)
    rvals, ridx = jax.lax.top_k(vals + hits.astype(jnp.float32) * _NEG, k)

    # ---- early-stop heuristic (HF _check_early_stop_heuristic): can the
    # best running beam still beat the worst finished one?
    if early_stopping == "never" and lp > 0:
        best_len = jnp.float32(max_new)
    else:
        best_len = (t + 1).astype(jnp.float32)
    best_possible = rvals[0] / best_len**lp
    worst = jnp.where(fin_flags, jnp.min(fvals), _NEG)
    unsat = st["unsat"] & jnp.any(best_possible > worst)
    unfinished = unsat & ~jnp.all(hits)
    if early_stopping is True:
        unfinished = unfinished & ~jnp.all(fin_flags)

    return {
        "tok": jnp.take(tok, ridx), "src": jnp.take(src, ridx),
        "run_scores": rvals, "run_seqs": jnp.take(cand_seqs, ridx, axis=0),
        "fin_scores": fvals, "fin_seqs": fin_seqs, "fin_lens": fin_lens,
        "fin_flags": fin_flags, "unsat": unsat, "unfinished": unfinished,
    }


@partial(_fd_jit, static_argnames=(
    "cfg", "k", "max_new", "prefill_len", "lp", "early_stopping"),
    # donate the tiled cache: it is consumed by the search, and without
    # donation XLA copies the full k/v (+scale) buffers into the while
    # carry — 4 GB of copies at n·k=32 S=512 int8, which OOMs one v5e
    donate_argnums=(1,))
def _beam_loop(params, cache, logits0, lengths, *, cfg, k, max_new,
               prefill_len, lp, early_stopping):
    """The whole search for n samples × k beams as one program.

    cache: [L, n·k, ...] (tiled prompt prefill; DONATED — consumed).
    logits0: [n, V] prompt next-token logits. lengths: [n] true prompt
    lengths. Returns (fin_seqs [n, k, max_new], fin_scores [n, k],
    fin_lens [n, k], cache) with each sample's finished slots topk-sorted
    by score. The spent cache is returned ONLY so the donated input has an
    output to alias with — without an aliased output XLA reports the
    donation "not usable" and copies the full k/v buffers into the while
    carry anyway (callers drop it).
    """
    n, vocab = logits0.shape
    eos = cfg.lm.eos_token_id
    sel = jax.vmap(partial(
        _select, k=k, vocab=vocab, max_new=max_new, eos=eos, lp=lp,
        early_stopping=early_stopping), in_axes=(0, 0, None))
    beams = {
        "tok": jnp.zeros((n, k), jnp.int32),
        "src": jnp.broadcast_to(jnp.arange(k), (n, k)),
        # beam 0 starts at 0, the rest at -1e9 (all beams are identical
        # until the first selection — this keeps the top-2k diverse)
        "run_scores": jnp.broadcast_to(
            jnp.where(jnp.arange(k) == 0, 0.0, _NEG), (n, k)),
        "run_seqs": jnp.zeros((n, k, max_new), jnp.int32),
        "fin_scores": jnp.full((n, k), _NEG),
        "fin_seqs": jnp.zeros((n, k, max_new), jnp.int32),
        "fin_lens": jnp.zeros((n, k), jnp.int32),
        "fin_flags": jnp.zeros((n, k), bool),
        "unsat": jnp.ones((n,), bool), "unfinished": jnp.ones((n,), bool),
    }
    # step 0 selects from the prefill logits (HF's first iteration forwards
    # the prompt on all k identical beams — same logits row, broadcast)
    beams = sel(beams, jnp.broadcast_to(logits0[:, None], (n, k, vocab)),
                jnp.asarray(0, jnp.int32))
    lengths_flat = jnp.repeat(lengths, k)  # sample-major, matches the cache

    def body(st):
        cache, t, beams = st["cache"], st["t"], st["beams"]
        flat_src = (jnp.arange(n)[:, None] * k + beams["src"]).reshape(-1)
        cache = _gather_cache(cache, flat_src,
                              prefill_len, prefill_len + max_new)
        logits, cache = decode_step(
            params, cfg, cache, beams["tok"].reshape(-1), lengths_flat,
            t - 1, prefill_len)
        new = sel(beams, logits.reshape(n, k, vocab), t)
        # freeze samples that already stopped: their per-sample state keeps
        # its value while the rest of the batch runs, so each sample's
        # result is exactly its batch-1 result (the cache keeps updating —
        # frozen rows are never read back)
        live = beams["unfinished"]
        pick = lambda a, b: jnp.where(
            live.reshape((n,) + (1,) * (a.ndim - 1)), a, b)
        beams = jax.tree.map(pick, new, beams)
        return {"cache": cache, "t": t + 1, "beams": beams}

    st = jax.lax.while_loop(
        lambda st: jnp.any(st["beams"]["unfinished"]) & (st["t"] < max_new),
        body,
        {"cache": cache, "t": jnp.asarray(1, jnp.int32), "beams": beams},
    )
    b = st["beams"]
    return b["fin_seqs"], b["fin_scores"], b["fin_lens"], st["cache"]


def beam_generate(
    params,
    cfg: TokenPackerVLMConfig,
    batch: dict,
    num_beams: int,
    max_new_tokens: int = 128,
    length_penalty: float = 1.0,
    early_stopping: bool | str = False,
) -> tuple[list[list[int]], list[float]]:
    """Beam-search a batch of requests (images optional).

    Returns (per-sample generated ids — terminal EOS included when the beam
    ended on one, prompt excluded; per-sample sequence score =
    sum-logprobs / len**penalty).
    """
    n, l = batch["token_ids"].shape
    dev = device_batch(batch, cfg.dtype)
    logits, cache = prefill(params, cfg, dev, l + max_new_tokens)
    cache = _tile_cache(cache, num_beams)
    lengths = dev["lengths"].astype(jnp.int32)
    seqs, scores, lens, _spent = _beam_loop(
        params, cache, logits, lengths, cfg=cfg, k=num_beams,
        max_new=max_new_tokens, prefill_len=l, lp=float(length_penalty),
        early_stopping=early_stopping,
    )
    seqs, scores, lens = (np.asarray(seqs), np.asarray(scores), np.asarray(lens))
    # finished slots are kept topk-sorted by score — best is slot 0
    return (
        [[int(x) for x in seqs[i, 0, : lens[i, 0]]] for i in range(n)],
        [float(s) for s in scores[:, 0]],
    )
