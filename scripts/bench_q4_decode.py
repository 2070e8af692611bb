"""Re-measure 4-bit decode (VERDICT r4 #4): docs/kernels.md carried 44.1
tok/s for int4 (a round-2 manual run) while the round-4 driver bench
recorded 37.7 — this script reproduces bench.py's int4 section EXACTLY
(same cache/fill/loop/params builder) with N repeats for a variance band,
plus the same protocol for nf4 (never re-measured since round 2).

Usage: python scripts/bench_q4_decode.py [reps=5] [int4|nf4 ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(quant_type: str, reps: int):
    from tokenpacker_tpu.config import TokenPackerVLMConfig
    from tokenpacker_tpu.generate import _fd_compiler_options, decode_step_cb
    from tokenpacker_tpu.models.llama import KVCache
    from tokenpacker_tpu.models.vlm import init_vlm
    from tokenpacker_tpu.utils.bench_params import q4_params_like

    cfg = TokenPackerVLMConfig()
    dtype = jnp.bfloat16
    lm = cfg.lm
    shapes = jax.eval_shape(lambda: init_vlm(jax.random.PRNGKey(0), cfg, dtype))
    params = q4_params_like(shapes, lm, quant_type=quant_type, fused=True)

    s_max, n_steps, b = 512, 64, 1
    cache = KVCache(
        jnp.zeros((lm.num_hidden_layers, b, s_max, lm.kv_heads, lm.head_dim), dtype),
        jnp.zeros((lm.num_hidden_layers, b, s_max, lm.kv_heads, lm.head_dim), dtype),
        jnp.full((b,), 100, jnp.int32),
    )

    # default mirrors production (generate._fd_jit._params_can_fuse): 4-bit
    # trees never trace the fused kernel, and the scoped-vmem raise costs
    # the q4 GEMV 15% (44.1 -> 37.5 tok/s, root cause of VERDICT r4 #4)
    copts = None
    if os.environ.get("Q4_VMEM_KIB"):  # A/B the scoped-vmem raise
        v = os.environ["Q4_VMEM_KIB"]
        copts = (_fd_compiler_options() if v == "fd"
                 else {"xla_tpu_scoped_vmem_limit_kib": int(v)})

    @functools.partial(jax.jit, compiler_options=copts)
    def loop(params, cache, toks, active, salt):
        toks = toks + salt * 0

        def body(i, carry):
            cache, toks = carry
            logits, cache = decode_step_cb(params, cfg, cache, toks, cache.length, active)
            return cache, jnp.argmax(logits, -1).astype(jnp.int32)

        cache, toks = jax.lax.fori_loop(0, n_steps, body, (cache, toks))
        return jnp.sum(toks)

    toks = jnp.ones((b,), jnp.int32)
    active = jnp.ones((b,), bool)
    t0 = time.perf_counter()
    float(loop(params, cache, toks, active, jnp.asarray(0)))
    print(f"[{quant_type}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    rates = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(loop(params, cache, toks, active, jnp.asarray(i + 1)))
        rates.append(n_steps / (time.perf_counter() - t0))
        print(f"[{quant_type}] rep {i}: {rates[-1]:.1f} tok/s", flush=True)
    rates.sort()
    print(f"[{quant_type}] median {rates[len(rates)//2]:.1f} "
          f"min {rates[0]:.1f} max {rates[-1]:.1f} tok/s over {reps} reps",
          flush=True)


def main():
    from tokenpacker_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    types = sys.argv[2:] or ["int4", "nf4"]
    print(f"backend={jax.default_backend()} fused="
          f"{os.environ.get('TOKENPACKER_FUSED_DECODE', '1')}", flush=True)
    for t in types:
        bench(t, reps)


if __name__ == "__main__":
    main()
