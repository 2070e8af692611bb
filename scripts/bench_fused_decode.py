"""Measure the fused whole-stack decode kernel vs the XLA per-layer path.

7B int8 (the load_8bit serving configuration, fused qkv/gateup layout),
decode over slot-contiguous caches (decode_step_cb semantics) at B=1 and
B=8. Timing is tunnel-proof: N steps chained in one jitted fori_loop with a
data dependency, single scalar fetch (CLAUDE.md).

Usage: python scripts/bench_fused_decode.py [batch ...]
Env: TOKENPACKER_FUSED_DECODE=0 to measure only the XLA path.
     GEOM=13b to measure vicuna-13B geometry (40 layers, D=5120, F=13824 —
     the MLP column/k-split path in the kernel; ~12.7 GB int8 weights, so
     B=1 only on one v5e unless TOKENPACKER_KV_CACHE=int8).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import _int8_params_on_device
from tokenpacker_tpu.config import TokenPackerVLMConfig
from tokenpacker_tpu.models.llama import KVCache


def bench(batch: int, s_max: int = None, n_steps: int = 64, fill: int = None):
    s_max = s_max or int(os.environ.get("SMAX", "512"))
    fill = fill or int(os.environ.get("FILL", "200"))
    from tokenpacker_tpu import generate as gen

    if os.environ.get("GEOM", "7b").lower() == "13b":
        from tokenpacker_tpu.config import preset_config

        cfg = preset_config("tokenpacker-13b-144token")
    else:
        cfg = TokenPackerVLMConfig()
    params = _int8_params_on_device(cfg, jnp.bfloat16)
    lm = cfg.lm
    from tokenpacker_tpu.models.llama import kv_cache_dtype

    # honors TOKENPACKER_KV_CACHE=int8 (ops/kv_quant): since round 4 int8
    # caches COMPOSE with the fused kernel (int8 staging + factored scales;
    # the dispatch gate also extends to S=2048 for int8)
    def fresh_cache():
        return KVCache.create(
            lm, batch, s_max, dtype=kv_cache_dtype(jnp.bfloat16)
        )._replace(length=jnp.full((batch,), fill, jnp.int32))

    from tokenpacker_tpu.generate import _fd_compiler_options

    copts = _fd_compiler_options()
    # the override only applies where TPU flags are legal (copts is None on
    # CPU backends, which reject unknown XLA options — generate.py:41)
    if copts is not None and os.environ.get("TOKENPACKER_FD_VMEM_KIB"):
        copts = {"xla_tpu_scoped_vmem_limit_kib": int(os.environ["TOKENPACKER_FD_VMEM_KIB"])}

    # donate the cache AND return it: donation only removes the 4 GB
    # copy-into-carry when the cache is also an OUTPUT the input can alias
    # (a scalar-only return leaves "shares 0B with arguments" and XLA must
    # copy the read-only parameter into a writable temp — measured OOM at
    # B=8 S=2048 int8: 19.16G of 15.75G). Callers fetch only the scalar.
    @functools.partial(jax.jit, compiler_options=copts, donate_argnums=(1,))
    def loop(params, cache, toks, active, salt):
        toks = toks + salt * 0

        def body(i, carry):
            cache, toks = carry
            logits, cache = gen.decode_step_cb(params, cfg, cache, toks, cache.length, active)
            return cache, jnp.argmax(logits, -1).astype(jnp.int32)

        cache, toks = jax.lax.fori_loop(0, n_steps, body, (cache, toks))
        return jnp.sum(toks), cache

    toks = jnp.ones((batch,), jnp.int32)
    active = jnp.ones((batch,), bool)
    t0 = time.perf_counter()
    r = float(loop(params, fresh_cache(), toks, active, jnp.asarray(0))[0])
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s (sum={r})", flush=True)
    cache = jax.block_until_ready(fresh_cache())  # built OUTSIDE the timed window
    t0 = time.perf_counter()
    float(loop(params, cache, toks, active, jnp.asarray(1))[0])
    dt = time.perf_counter() - t0
    tps = n_steps * batch / dt
    ms = dt / n_steps * 1e3
    return tps, ms


def main():
    # persist compiles: the B>=16 fused programs take ~1000 s to build
    from tokenpacker_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    batches = [int(a) for a in sys.argv[1:]] or [1, 8]
    mode = os.environ.get("TOKENPACKER_FUSED_DECODE", "1")
    os.environ["TOKENPACKER_FUSED_DECODE"] = mode
    print(f"backend={jax.default_backend()} fused={mode} "
          f"kv={os.environ.get('TOKENPACKER_KV_CACHE', 'bf16')}")
    for b in batches:
        tps, ms = bench(b)
        print(f"B={b}: {tps:.1f} agg tok/s  ({ms:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
