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
  for int8 trees — its batch dim is the beam dim).

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
    """[L, 1, ...] prefill cache → [L, k, ...] (all beams share the prompt)."""
    rep = lambda a: None if a is None else jnp.repeat(a, k, axis=1)
    return cache._replace(
        k=rep(cache.k), v=rep(cache.v),
        k_scale=rep(cache.k_scale), v_scale=rep(cache.v_scale),
    )


def _gather_cache(cache, idx):
    """Reorder the beam axis — HF's ``reorder_cache`` as a device gather."""
    take = lambda a: None if a is None else jnp.take(a, idx, axis=1)
    return cache._replace(
        k=take(cache.k), v=take(cache.v),
        k_scale=take(cache.k_scale), v_scale=take(cache.v_scale),
    )


def _select(st, logits, *, k, vocab, max_new, eos, lp, early_stopping):
    """One candidate-selection round (HF _get_top_k_continuations +
    _get_running_beams_for_next_iteration + _update_finished_beams +
    _check_early_stop_heuristic, batch=1). ``st["t"]`` is the column the
    chosen tokens land in; masking is ADDITIVE -1e9 terms, matching HF's
    arithmetic exactly so tie-breaking agrees."""
    t = st["t"]
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
        "cache": st["cache"], "t": t + 1,
        "tok": jnp.take(tok, ridx), "src": jnp.take(src, ridx),
        "run_scores": rvals, "run_seqs": jnp.take(cand_seqs, ridx, axis=0),
        "fin_scores": fvals, "fin_seqs": fin_seqs, "fin_lens": fin_lens,
        "fin_flags": fin_flags, "unsat": unsat, "unfinished": unfinished,
    }


@partial(_fd_jit, static_argnames=(
    "cfg", "k", "max_new", "prefill_len", "lp", "early_stopping"))
def _beam_loop(params, cache, logits0, lengths, *, cfg, k, max_new,
               prefill_len, lp, early_stopping):
    vocab = cfg.lm.vocab_size
    eos = cfg.lm.eos_token_id
    sel = partial(_select, k=k, vocab=vocab, max_new=max_new, eos=eos,
                  lp=lp, early_stopping=early_stopping)
    st = {
        "cache": cache, "t": jnp.asarray(0, jnp.int32),
        "tok": jnp.zeros((k,), jnp.int32), "src": jnp.arange(k),
        # beam 0 starts at 0, the rest at -1e9 (all beams are identical
        # until the first selection — this keeps the top-2k diverse)
        "run_scores": jnp.where(jnp.arange(k) == 0, 0.0, _NEG),
        "run_seqs": jnp.zeros((k, max_new), jnp.int32),
        "fin_scores": jnp.full((k,), _NEG),
        "fin_seqs": jnp.zeros((k, max_new), jnp.int32),
        "fin_lens": jnp.zeros((k,), jnp.int32),
        "fin_flags": jnp.zeros((k,), bool),
        "unsat": jnp.asarray(True), "unfinished": jnp.asarray(True),
    }
    # step 0 selects from the prefill logits (HF's first iteration forwards
    # the prompt on all k identical beams — same logits row, broadcast)
    st = sel(st, jnp.broadcast_to(logits0, (k, vocab)))

    def body(st):
        cache = _gather_cache(st["cache"], st["src"])
        logits, cache = decode_step(
            params, cfg, cache, st["tok"], lengths, st["t"] - 1, prefill_len)
        return sel({**st, "cache": cache}, logits)

    st = jax.lax.while_loop(
        lambda st: st["unfinished"] & (st["t"] < max_new), body, st)
    return st["fin_seqs"], st["fin_scores"], st["fin_lens"]


def beam_generate(
    params,
    cfg: TokenPackerVLMConfig,
    batch: dict,
    num_beams: int,
    max_new_tokens: int = 128,
    length_penalty: float = 1.0,
    early_stopping: bool | str = False,
) -> tuple[list[int], float]:
    """Beam-search one request (batch 1; images optional).

    Returns (generated ids — terminal EOS included when the beam ended on
    one, prompt excluded; sequence score = sum-logprobs / len**penalty).
    """
    n, l = batch["token_ids"].shape
    if n != 1:
        raise ValueError(f"beam search is per-request (got batch {n})")
    dev = device_batch(batch, cfg.dtype)
    logits, cache = prefill(params, cfg, dev, l + max_new_tokens)
    cache = _tile_cache(cache, num_beams)
    lengths = jnp.broadcast_to(dev["lengths"], (num_beams,)).astype(jnp.int32)
    seqs, scores, lens = _beam_loop(
        params, cache, logits[0], lengths, cfg=cfg, k=num_beams,
        max_new=max_new_tokens, prefill_len=l, lp=float(length_penalty),
        early_stopping=early_stopping,
    )
    seqs, scores, lens = (np.asarray(seqs), np.asarray(scores), np.asarray(lens))
    best = 0  # finished slots are kept topk-sorted by score
    return [int(x) for x in seqs[best, : lens[best]]], float(scores[best])
