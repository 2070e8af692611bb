"""Per-slot single-step logit parity for the fused kernel's slot-LoRA
composition vs the XLA slot-LoRA path, on-chip.

The 64-step argmax-chain token sums (scripts/bench_multi_lora.py) are a
chaos-amplifying statistic: one near-tie flip early in a chain diverges the
rest. This script compares ONE decode step's logits per slot — if the
adapter configs' fused-vs-XLA deltas sit in the same band as the base
configs' (the known f32-vs-bf16 accumulation reorder, ~1e-3), the chain
mismatch is tie-break chaos, not a slot/adapter indexing bug (a wrong mask
or slab offset would blow specific slots' deltas up by orders).

Usage: python scripts/check_fd_lora_parity.py [n_adapters=2] [r=16] [batch=8]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    n_adapters = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8

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
        return Adapter({
            tgt: (rng.standard_normal((nl, din, r), np.float32) * 0.01,
                  rng.standard_normal((nl, r, dout), np.float32) * 0.01)
            for tgt, (din, dout) in dims.items()
        }, r)

    adapters = {f"ad{i}": mk_adapter() for i in range(n_adapters)}
    sl = SlotLora(params, cfg, adapters, num_slots=batch)
    for b in range(batch):
        sl.set_slot(b, f"ad{b % n_adapters}")
    overlay = sl.overlay(params)

    s_max, fill = 512, 200
    # non-trivial cache content: deterministic pseudo-random bf16 rows
    import functools

    @functools.partial(jax.jit, compiler_options=_fd_compiler_options())
    def one_step(p, toks):
        k = 0.05 * jax.random.normal(
            jax.random.PRNGKey(2),
            (cfg.lm.num_hidden_layers, batch, s_max, cfg.lm.kv_heads, cfg.lm.head_dim),
            jnp.bfloat16)
        v = 0.05 * jax.random.normal(
            jax.random.PRNGKey(3), k.shape, jnp.bfloat16)
        cache = KVCache(k, v, jnp.full((batch,), fill, jnp.int32))
        logits, _ = decode_step_cb(p, cfg, cache, toks, cache.length,
                                   jnp.ones((batch,), bool))
        return logits

    toks = (jnp.arange(batch) * 17 % cfg.lm.vocab_size).astype(jnp.int32)

    out = {}
    for name, p, fused in (("base", params, None), ("lora", overlay, None)):
        for mode in ("0", "1"):
            os.environ["TOKENPACKER_FUSED_DECODE"] = mode
            jax.clear_caches()
            out[(name, mode)] = np.asarray(
                jax.device_get(one_step(p, toks)), np.float32)
    for name in ("base", "lora"):
        d = np.abs(out[(name, "0")] - out[(name, "1")])
        scale = np.abs(out[(name, "0")]).max(axis=-1)
        per_slot = d.max(axis=-1) / (scale + 1e-9)
        agree = (out[(name, "0")].argmax(-1) == out[(name, "1")].argmax(-1))
        print(f"{name}: per-slot rel max|dlogit| ="
              f" {[f'{x:.2e}' for x in per_slot]} argmax agree={agree.tolist()}")


if __name__ == "__main__":
    main()
