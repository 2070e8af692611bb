"""Measure speculative decoding (prompt-lookup drafts) on the real TPU chip.

Reports three single-stream 7B int8 numbers (one JSON line each; int8 is
the single-chip serving configuration — 7B bf16 + speculation buffers does
not fit one v5e's 15.75 GB):
  - plain decode tok/s (decode_chunk baseline)
  - speculative tok/s on random weights (greedy decode of a random LM cycles,
    so prompt-lookup accepts often — treat as a repetitive-workload point,
    not a floor; the true zero-acceptance floor is plain * step/verify-round
    cost, derivable from the full-accept line's round time)
  - speculative tok/s at full acceptance (rigged repeater weights — the
    upper bound: one verify round per k+1 emitted tokens)

Measured v5e (7B int8, B=1, k=4): plain 97.5 tok/s; random-weights 243.4;
full-accept 313.3 (16 rounds for 66 tokens -> verify round ~= 1.28x a plain
step, so break-even needs ~0.3 accepted drafts/round). Real-text acceptance
is workload-dependent (OCR readout / quoting workloads sit near the top). All timing follows
CLAUDE.md tunnel rules: each measurement is ONE jitted program (decode_chunk
/ speculative_chunk are single fori/while programs) and fetches one scalar;
warm and measured calls use different inputs to defeat memoization.

Usage: python scripts/bench_speculative.py [--k 4] [--n 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _prompt_plan(cfg, seed: int, pad_to: int = 64):
    from tokenpacker_tpu.models.splice import build_splice_plan

    rng = np.random.default_rng(seed)
    # a prompt with internal repetition so n-gram lookup has material
    phrase = rng.integers(100, 2000, size=12)
    ids = np.concatenate([[1], phrase, rng.integers(100, 2000, size=8), phrase]).astype(np.int64)
    plan = build_splice_plan([ids], [[]], cfg.tokens_per_view, "single", 0, 0, 0, pad_to=pad_to)
    return {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_slot": plan.image_slot,
        "lengths": plan.lengths,
        "images": None,
    }


def _prefill(params, cfg, batch, s_max):
    from tokenpacker_tpu.generate import prefill

    dev = {
        "token_ids": jnp.asarray(batch["token_ids"]),
        "is_image": jnp.asarray(batch["is_image"]),
        "image_slot": jnp.asarray(batch["image_slot"]),
        "lengths": jnp.asarray(batch["lengths"], jnp.int32),
        "images": None,
    }
    logits, cache = prefill(params, cfg, dev, s_max)
    tok = jnp.argmax(logits[0]).astype(jnp.int32)
    return dev, tok, cache


def bench_plain(params, cfg, n: int):
    from tokenpacker_tpu.generate import decode_chunk

    l = 64
    times = []
    for seed in (11, 12):  # warm on one prompt, measure on another
        batch = _prompt_plan(cfg, seed)
        dev, tok, cache = _prefill(params, cfg, batch, l + n + 1)
        t0 = time.perf_counter()
        toks, _, _ = decode_chunk(
            params, cfg, cache, tok[None], dev["lengths"], jnp.asarray(0, jnp.int32),
            l, n, jax.random.PRNGKey(seed), 0.0, None,
        )
        float(jnp.sum(toks))
        times.append(time.perf_counter() - t0)
    return n / times[-1]


def bench_spec(params, cfg, n: int, k: int):
    from tokenpacker_tpu.speculative import make_ctx, speculative_chunk

    l = 64
    results = []
    for seed in (21, 22):
        batch = _prompt_plan(cfg, seed)
        dev, tok, cache = _prefill(params, cfg, batch, l + n + 2 * k + 2)
        cap = l + n + 4 * k + 8
        ctx = jnp.asarray(
            make_ctx(batch["token_ids"][0], batch["is_image"][0],
                     int(batch["lengths"][0]), cap)
        )
        ctx_len = dev["lengths"][0]
        ctx = jax.lax.dynamic_update_slice(ctx, tok[None], (ctx_len,))
        t0 = time.perf_counter()
        out, produced, _, _, _, _, rounds = speculative_chunk(
            params, cfg, cache, ctx, ctx_len + 1, dev["lengths"], tok,
            jnp.asarray(0, jnp.int32), l, n, k,
        )
        produced = float(produced)
        dt = time.perf_counter() - t0
        results.append((produced / dt, produced, float(rounds)))
    return results[-1]


def bench_spec_batched(params, cfg, k: int, slots: int, rounds: int = 48):
    """Aggregate UPPER BOUND for speculative continuous batching: `slots`
    concurrent sequences each verify k+1 tokens per round, full acceptance
    simulated by advancing every slot's length k+1 per round. One chained
    fori_loop program (tunnel-proof); content is self-fed predictions."""
    from tokenpacker_tpu.models.llama import KVCache
    from tokenpacker_tpu.speculative import verify_step_cb

    lm = cfg.lm
    s_max = 512
    start = 64
    assert start + rounds * (k + 1) <= s_max

    import functools

    from tokenpacker_tpu.generate import _fd_jit

    # _fd_jit: the outermost jit must carry the fused kernel's compiler
    # options when verify_step_cb dispatches to it (generate._fd_jit)
    @functools.partial(_fd_jit, static_argnames=("n_rounds",))
    def loop(params, cache, fed, active, n_rounds: int):
        def body(i, carry):
            cache, fed = carry
            logits, cache = verify_step_cb(params, cfg, cache, fed, cache.length, active)
            preds = jnp.argmax(logits, -1).astype(jnp.int32)  # [N, k+1]
            cache = KVCache(cache.k, cache.v, cache.length + (k + 1))
            return cache, preds

        cache, fed = jax.lax.fori_loop(0, n_rounds, body, (cache, fed))
        return jnp.sum(fed)

    active = jnp.ones((slots,), bool)
    times = []
    for seed in (31, 32):
        cache = KVCache(
            jnp.zeros((lm.num_hidden_layers, slots, s_max, lm.kv_heads, lm.head_dim), jnp.bfloat16),
            jnp.zeros((lm.num_hidden_layers, slots, s_max, lm.kv_heads, lm.head_dim), jnp.bfloat16),
            jnp.full((slots,), start, jnp.int32),
        )
        fed = jax.random.randint(jax.random.PRNGKey(seed), (slots, k + 1), 100, 2000, jnp.int32)
        t0 = time.perf_counter()
        float(loop(params, cache, fed, active, rounds))
        times.append(time.perf_counter() - t0)
    return slots * (k + 1) * rounds / times[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--skip-plain", action="store_true")
    ap.add_argument("--slots", type=int, default=0,
                    help="also measure the batched verify aggregate upper "
                         "bound at this many slots")
    args = ap.parse_args()

    from tokenpacker_tpu.config import TokenPackerVLMConfig
    from tokenpacker_tpu.models.vlm import init_vlm
    from tokenpacker_tpu.ops.quantize import fuse_llama_layers
    from tokenpacker_tpu.utils.bench_params import int8_params_like, repeater_params_like

    cfg = TokenPackerVLMConfig()
    shapes = jax.eval_shape(lambda: init_vlm(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    # fused qkv/gateup layout (the load_8bit serving shape): required for the
    # fused whole-stack kernel to serve decode AND verify steps
    shapes = {**shapes, "lm": jax.eval_shape(fuse_llama_layers, shapes["lm"])}
    print(json.dumps({
        "fused_decode": os.environ.get("TOKENPACKER_FUSED_DECODE", "1"),
        "fd_verify": os.environ.get("TOKENPACKER_FD_VERIFY", "1"),
    }), flush=True)

    params = int8_params_like(shapes, seed=1)
    if not args.skip_plain:
        plain = bench_plain(params, cfg, args.n)
        print(json.dumps({"metric": "decode_tok_s_plain", "value": round(plain, 1)}), flush=True)

    tps, produced, rounds = bench_spec(params, cfg, args.n, args.k)
    print(json.dumps({
        "metric": "decode_tok_s_spec_random_weights", "value": round(tps, 1),
        "k": args.k, "produced": produced, "rounds": rounds,
    }), flush=True)
    del params

    params = repeater_params_like(shapes, seed=1, quant="int8")
    tps, produced, rounds = bench_spec(params, cfg, args.n, args.k)
    print(json.dumps({
        "metric": "decode_tok_s_spec_full_accept", "value": round(tps, 1),
        "k": args.k, "produced": produced, "rounds": rounds,
    }), flush=True)

    if args.slots > 0:
        agg = bench_spec_batched(params, cfg, args.k, args.slots)
        print(json.dumps({
            "metric": "agg_tok_s_spec_batched_upper_bound", "value": round(agg, 1),
            "k": args.k, "slots": args.slots,
        }), flush=True)


if __name__ == "__main__":
    main()
