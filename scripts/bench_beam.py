"""Measure on-device beam search (beam.py) at 7B int8 serving geometry.

The reference's beams run through HF GenerationMixin — a python loop with a
host sync + full-cache reorder per step, batch 1. Ours compiles the WHOLE
search as one program (beam._beam_loop): per step, a fused B=n·k decode
plus on-device top-2k selection and a span-only cache gather (only the
decoded rows differ across beams — the tiled prompt is identical). This
script quantifies the beam machinery directly: the same 64 decode steps
are timed with and without it (same decode_step, same cache shapes).

Timing is tunnel-proof (CLAUDE.md): the 64-step search is ONE jitted call
with a data dependency, single scalar fetch, salted between calls.

Usage: python scripts/bench_beam.py [n:k ...]      (default: 1:4)
Env:   SMAX (cache length, default 512), FILL (prompt len, default 100),
       TOKENPACKER_KV_CACHE=int8 for the int8-KV composition, PLAIN=0 to
       skip the no-beam baseline loop.

Measured envelope (v5e, 7B int8 weights + int8 KV, S=512): n·k=16 fits,
n·k=32 OOMs — unlike the plain decode loop (in-place dynamic_update_slice,
B=32 fine), the beam body's permutation gather+scatter over the carried
cache makes XLA double-buffer it (~4.3 GB ×2 beside the 6.8 GB weights).
Measured 2026-08-20 (v5e, 7B int8 + int8 KV, S=512): 1:4 69.7 tok/s
(+8.2% over plain B=4); 4:4 146.0 agg steps/s = 27.39 ms/step, +17.9%
over the plain B=16 loop at identical shapes (23.23 ms/step) — the
selection + span-restricted cache gather cost ~4 ms/step at n·k=16.
"""
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _int8_params_on_device
from tokenpacker_tpu.beam import _beam_loop
from tokenpacker_tpu.config import TokenPackerVLMConfig
from tokenpacker_tpu.generate import _fd_jit, decode_step
from tokenpacker_tpu.models.llama import KVCache, kv_cache_dtype


def main(shapes):
    s_max = int(os.environ.get("SMAX", "512"))
    fill = int(os.environ.get("FILL", "100"))
    n_steps = 64
    cfg = TokenPackerVLMConfig()
    # eos_token_id=-1: no sampled id can match, so every run does exactly
    # n_steps selection rounds (random weights would otherwise hit EOS at
    # an uncontrolled step and skew the timing)
    cfg = dataclasses.replace(
        cfg, lm=dataclasses.replace(cfg.lm, eos_token_id=-1))
    params = _int8_params_on_device(cfg, jnp.bfloat16)
    dtype = kv_cache_dtype(jnp.bfloat16)
    rng = np.random.default_rng(0)

    @functools.partial(_fd_jit, static_argnames=("cfg", "prefill_len", "b"))
    def plain_loop(params, cache, lengths, salt, *, cfg, prefill_len, b):
        toks = jnp.full((b,), 11, jnp.int32) + salt * 0

        def body(i, carry):
            cache, toks = carry
            logits, cache = decode_step(
                params, cfg, cache, toks, lengths, i, prefill_len)
            return cache, jnp.argmax(logits, -1).astype(jnp.int32)

        cache, toks = jax.lax.fori_loop(0, n_steps, body, (cache, toks))
        return jnp.sum(toks)

    out = {}
    for n, k in shapes:
        lengths = jnp.full((n,), fill, jnp.int32)
        logits0 = jnp.asarray(
            rng.standard_normal((n, cfg.lm.vocab_size)), jnp.float32)

        def beam(cache, salt):
            _, scores, lens, _spent = _beam_loop(
                params, cache, logits0 + salt, lengths, cfg=cfg, k=k,
                max_new=n_steps, prefill_len=fill, lp=1.0,
                early_stopping=False)
            return float(jnp.sum(scores)), np.asarray(lens)

        # fresh cache per call (created OUTSIDE the timed region):
        # _beam_loop DONATES it, exactly as beam_generate hands over the
        # prefill-tiled cache
        make = lambda: jax.block_until_ready(
            KVCache.create(cfg.lm, n * k, s_max, dtype=dtype))
        t0 = time.perf_counter()
        _, lens = beam(make(), jnp.float32(0.0))
        print(f"n={n} k={k}: beam compile+first {time.perf_counter() - t0:.1f}s")
        cache = make()
        t0 = time.perf_counter()
        _, lens = beam(cache, jnp.float32(1.0))
        dt_beam = time.perf_counter() - t0
        assert int(lens.min()) == n_steps, lens
        print(f"n={n} k={k}: beam search {n * n_steps / dt_beam:.1f} agg "
              f"steps/s ({dt_beam / n_steps * 1e3:.2f} ms/step, "
              f"{n_steps / dt_beam:.1f} per-request tok/s)")
        out[f"beam_tokens_per_sec_n{n}_k{k}"] = round(n * n_steps / dt_beam, 1)

        if os.environ.get("PLAIN", "1") == "0":
            continue
        flat_lengths = jnp.repeat(lengths, k)
        cache = make()  # plain_loop does not donate; reused across calls
        t0 = time.perf_counter()
        float(plain_loop(params, cache, flat_lengths, jnp.asarray(0),
                         cfg=cfg, prefill_len=fill, b=n * k))
        print(f"n={n} k={k}: plain compile+first {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        float(plain_loop(params, cache, flat_lengths, jnp.asarray(1),
                         cfg=cfg, prefill_len=fill, b=n * k))
        dt_plain = time.perf_counter() - t0
        print(f"n={n} k={k}: plain B={n * k} decode "
              f"{n_steps / dt_plain:.1f} steps/s "
              f"({dt_plain / n_steps * 1e3:.2f} ms/step) — beam overhead "
              f"{(dt_beam / dt_plain - 1) * 100:.1f}%")
        out[f"beam_overhead_pct_n{n}_k{k}"] = round(
            (dt_beam / dt_plain - 1) * 100, 1)
    return out


if __name__ == "__main__":
    from tokenpacker_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    shapes = [tuple(int(x) for x in a.split(":")) for a in sys.argv[1:]]
    main(shapes or [(1, 4)])
