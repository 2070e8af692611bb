"""On-chip parity check: fused whole-stack decode kernel vs the XLA path.

Full 7B geometry, random int8 weights (fused qkv/gateup layout), random
bf16 cache prefix: N decode steps through _decode_step_cb_fused and
_decode_step_cb_xla from the same state, comparing greedy tokens per step
and logit deltas. Numerics differ only by accumulation order (kernel: f32
chunk accumulators over bf16 sub-dots; XLA: one fused dot), so tokens must
match except where the top-2 logit gap is below the numerical noise.

Usage: python scripts/check_fused_parity.py [batch] [steps]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench import _int8_params_on_device
from tokenpacker_tpu.config import TokenPackerVLMConfig
from tokenpacker_tpu.models.llama import KVCache


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    s_max, fill = 512, 200

    os.environ.setdefault("TOKENPACKER_FUSED_DECODE", "1")
    from tokenpacker_tpu import generate as gen

    cfg = TokenPackerVLMConfig()
    params = _int8_params_on_device(cfg, jnp.bfloat16)
    lm = cfg.lm

    @jax.jit
    def mk_cache(key):
        shape = (lm.num_hidden_layers, batch, s_max, lm.kv_heads, lm.head_dim)
        k = 0.3 * jax.random.normal(key, shape, jnp.bfloat16)
        v = 0.3 * jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.bfloat16)
        return k, v

    k0, v0 = mk_cache(jax.random.PRNGKey(0))
    lens = jnp.full((batch,), fill, jnp.int32)
    active = jnp.ones((batch,), bool)
    toks = jnp.arange(1, batch + 1, dtype=jnp.int32)

    # fixed pseudo-random token feed: the two chains run SEQUENTIALLY (a
    # second live cache pair at B=8 OOMs the chip next to the int8 params),
    # so the fed tokens must not depend on either chain's outputs
    feed = np.asarray(
        jax.random.randint(jax.random.PRNGKey(9), (steps, batch), 5, 30000), np.int32
    )

    def run_chain(step_fn):
        cache = KVCache(k0, v0, lens)
        outs = []
        for i in range(steps):
            logits, cache = step_fn(
                params, cfg, cache, jnp.asarray(feed[i]), cache.length, active
            )
            outs.append(np.asarray(logits, np.float32))
        del cache
        return outs

    fused_logits = run_chain(gen._decode_step_cb_fused)
    xla_logits = run_chain(gen._decode_step_cb_xla)

    mismatch = close_call = 0
    for i, (lf32, lx32) in enumerate(zip(fused_logits, xla_logits)):
        af, ax = lf32.argmax(-1), lx32.argmax(-1)
        dmax = float(np.abs(lf32 - lx32).max())
        # tolerate argmax flips only where the XLA top-2 gap is tiny
        for b in range(batch):
            if af[b] != ax[b]:
                top2 = np.partition(lx32[b], -2)[-2:]
                gap = float(top2[1] - top2[0])
                if gap < 0.05:
                    close_call += 1
                else:
                    mismatch += 1
                    print(f"step {i} b={b}: fused={af[b]} xla={ax[b]} gap={gap:.4f}")
        print(f"step {i}: max|dlogits|={dmax:.4f} tokens fused={af.tolist()} xla={ax.tolist()}",
              flush=True)
    print(f"parity: {steps} steps x {batch} slots, {mismatch} real mismatches, "
          f"{close_call} sub-noise argmax flips")
    if mismatch:
        raise SystemExit(1)
    print("FUSED DECODE PARITY OK")


if __name__ == "__main__":
    main()
