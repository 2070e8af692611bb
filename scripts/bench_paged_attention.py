"""A/B: Pallas paged-attention kernel vs XLA gather, bf16 vs int8 pools.

Round-2 measured the bf16 kernel at 291.8 vs 186.0 agg tok/s (int8 7B
weights, 8 slots, 512 positions, mixed fill, page_size 64). Round-4 adds
int8 pools to the kernel — the per-(position, kv-head) scales fold into the
logit/probability matrices in-kernel, so K/V stream as int8 (half the page
DMA) and are never dequantized. This script measures all four
pool-dtype × implementation combinations at that serving shape.

Run: python scripts/bench_paged_attention.py   (real TPU)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tokenpacker_tpu.config import TokenPackerVLMConfig
from tokenpacker_tpu.ops.paged_kv import PagedKV, paged_decode_step


def make_pool(cfg, dtype, slots, ps, mp, lengths, seed=0):
    """A fully-mapped pool with random content at the given fill levels."""
    num_pages = slots * mp + 1
    paged = PagedKV.create(cfg.lm, num_pages, ps, slots, mp, dtype)
    kshape = paged.k_pages.shape
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)

    if dtype == jnp.int8:
        rand_i8 = jax.jit(
            lambda k: jax.random.randint(k, kshape, -127, 128, jnp.int8))
        rand_sc = jax.jit(
            lambda k: jax.random.uniform(k, kshape[:-1], jnp.float32, 0.005, 0.03))
        paged = paged._replace(
            k_pages=rand_i8(keys[0]), v_pages=rand_i8(keys[1]),
            k_scales=rand_sc(keys[2]), v_scales=rand_sc(keys[3]),
        )
    else:
        rand = jax.jit(
            lambda k: (jax.random.normal(k, kshape, jnp.float32) * 0.05).astype(dtype))
        paged = paged._replace(k_pages=rand(keys[0]), v_pages=rand(keys[1]))

    table = np.arange(1, slots * mp + 1, dtype=np.int32).reshape(slots, mp)
    return paged._replace(
        page_table=jnp.asarray(table), lengths=jnp.asarray(lengths, jnp.int32)
    )


def main():
    from tokenpacker_tpu.models.vlm import init_vlm
    from tokenpacker_tpu.ops.quantize import fuse_llama_layers
    from tokenpacker_tpu.utils.bench_params import int8_params_like
    from tokenpacker_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = TokenPackerVLMConfig()
    shapes = jax.eval_shape(lambda: init_vlm(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    shapes = {**shapes, "lm": jax.eval_shape(fuse_llama_layers, shapes["lm"])}
    params = int8_params_like(shapes)

    slots, ps, s_max, n_steps = 8, 64, 512, 32
    mp = s_max // ps
    lengths = np.array([100, 480, 256, 320, 64, 200, 400, 150], np.int32)
    active = jnp.ones((slots,), bool)
    out = {}
    for dt_name, dtype in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
        for impl in ("xla", "pallas"):
            os.environ["TOKENPACKER_PAGED_ATTN"] = impl
            paged = make_pool(cfg, dtype, slots, ps, mp, lengths)
            toks = jnp.ones((slots,), jnp.int32)

            @jax.jit  # fresh jit per config: the impl env var is read at trace
            def loop(params, paged, toks, salt):
                toks = toks + salt * 0

                def body(i, c):
                    paged, toks = c
                    logits, paged = paged_decode_step(params, cfg, paged, toks, active)
                    return paged, jnp.argmax(logits, -1).astype(jnp.int32)

                paged, toks = jax.lax.fori_loop(0, n_steps, body, (paged, toks))
                return jnp.sum(toks)

            tsum = float(loop(params, paged, toks, jnp.asarray(0)))
            t0 = time.perf_counter()
            float(loop(params, paged, toks, jnp.asarray(1)))
            dt = time.perf_counter() - t0
            key = f"paged_{dt_name}_{impl}"
            out[key + "_agg_tok_s"] = round(slots * n_steps / dt, 1)
            out[key + "_token_sum"] = int(tsum)  # greedy-chain parity signal
            print(json.dumps({k: v for k, v in out.items() if k.startswith(key)}),
                  flush=True)
            del paged
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
