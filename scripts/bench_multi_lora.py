"""On-chip cost of multi-LoRA serving: batched decode with the slot-LoRA
overlay through BOTH dispatches — the XLA path and (round 5) the fused
whole-stack kernel with in-kernel adapter composition — against their
no-adapter baselines, with argmax-chain token-sum parity per params set.

The adapter cost per step is reading all n adapters' weights (the fused
kernel stages 128-padded slabs: ~Σ_t NRp_t·(in_t+out_t) bytes/layer) plus
the masked low-rank dots; this script measures it at serving-realistic
ranks.

Usage: python scripts/bench_multi_lora.py [n_adapters=2] [r=16] [batch=8]
Env: ONLY=lora runs just the adapter rows (reuse cached base compiles);
     TOKENPACKER_KV_CACHE=int8 composes with the int8 KV cache.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    n_adapters = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    s_max, fill, n_steps = 512, 200, 64

    from bench import _int8_params_on_device
    from tokenpacker_tpu.config import TokenPackerVLMConfig
    from tokenpacker_tpu.generate import _fd_compiler_options, decode_step_cb
    from tokenpacker_tpu.models.llama import KVCache, kv_cache_dtype
    from tokenpacker_tpu.serve.multi_lora import Adapter, SlotLora, target_dims
    from tokenpacker_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = TokenPackerVLMConfig()
    params = _int8_params_on_device(cfg, jnp.bfloat16)

    rng = np.random.default_rng(0)
    dims = target_dims(cfg.lm)
    nl = cfg.lm.num_hidden_layers

    def mk_adapter():
        lora = {}
        for tgt, (din, dout) in dims.items():
            lora[tgt] = (
                rng.standard_normal((nl, din, r), np.float32) * 0.01,
                rng.standard_normal((nl, r, dout), np.float32) * 0.01,
            )
        return Adapter(lora, r)

    adapters = {f"ad{i}": mk_adapter() for i in range(n_adapters)}
    sl = SlotLora(params, cfg, adapters, num_slots=batch)
    for b in range(batch):  # every slot on a (cycling) adapter: worst case
        sl.set_slot(b, f"ad{b % n_adapters}")
    overlay = sl.overlay(params)
    a_bytes = sum(
        a.nbytes + bb.nbytes for a, bb in sl.stacks.values()
    )
    print(f"n={n_adapters} r={r} B={batch}: adapter stacks {a_bytes/1e6:.0f} MB")

    import functools

    def make_loop():
        @functools.partial(jax.jit, compiler_options=_fd_compiler_options(),
                           donate_argnums=(1,))
        def loop(p, cache, toks, active, salt):
            toks = toks + salt * 0

            def body(i, carry):
                cache, toks = carry
                logits, cache = decode_step_cb(p, cfg, cache, toks, cache.length, active)
                return cache, jnp.argmax(logits, -1).astype(jnp.int32)

            cache, toks = jax.lax.fori_loop(0, n_steps, body, (cache, toks))
            return jnp.sum(toks), cache

        return loop

    def fresh_cache():
        return KVCache.create(
            cfg.lm, batch, s_max, dtype=kv_cache_dtype(jnp.bfloat16)
        )._replace(length=jnp.full((batch,), fill, jnp.int32))

    toks = jnp.ones((batch,), jnp.int32)
    active = jnp.ones((batch,), bool)
    sums = {}
    configs = (
        ("xla base", params, "0"),
        ("xla + slot-lora", overlay, "0"),
        ("fused base", params, "1"),
        ("fused + slot-lora", overlay, "1"),  # round 5: in-kernel adapters
    )
    only = os.environ.get("ONLY")  # e.g. ONLY=lora to skip the base rows
    rows = {}
    keys = {
        "xla base": f"xla_agg_tokens_per_sec_b{batch}",
        "xla + slot-lora": f"xla_lora_agg_tokens_per_sec_b{batch}",
        "fused base": f"fused_agg_tokens_per_sec_b{batch}",
        "fused + slot-lora": f"fused_lora_agg_tokens_per_sec_b{batch}",
    }
    for name, p, fused in configs:
        if only and only not in name:
            continue
        os.environ["TOKENPACKER_FUSED_DECODE"] = fused
        jax.clear_caches()  # the dispatch env is read at trace time
        loop = make_loop()
        t0 = time.perf_counter()
        s = float(loop(p, fresh_cache(), toks, active, jnp.asarray(0))[0])
        print(f"  {name}: compile+first {time.perf_counter()-t0:.1f}s (sum={s})")
        sums[name] = s
        cache = jax.block_until_ready(fresh_cache())
        t0 = time.perf_counter()
        float(loop(p, cache, toks, active, jnp.asarray(1))[0])
        dt = time.perf_counter() - t0
        rows[keys[name]] = round(n_steps * batch / dt, 1)
        print(f"  {name}: {n_steps*batch/dt:.1f} agg tok/s ({dt/n_steps*1e3:.2f} ms/step)",
              flush=True)
    # greedy parity: the argmax-chained token sums must agree per params set
    # (at B>1 long chains can diverge on near-tie argmax flips under the
    # kernel's bf16-reorder — scripts/check_fd_lora_parity.py is the
    # step-level adjudicator; the sums are still printed for the record)
    for a, b in (("xla base", "fused base"),
                 ("xla + slot-lora", "fused + slot-lora")):
        if a in sums and b in sums:
            tag = "OK" if sums[a] == sums[b] else "MISMATCH"
            print(f"  token-sum parity [{a}] vs [{b}]: {tag} "
                  f"({sums[a]} vs {sums[b]})", flush=True)
    return rows


if __name__ == "__main__":
    main()
