"""Measure the fused ViT block kernel vs the shipped attention-kernel path.

Replicates bench.py's vision headline loop (batch 32, 10 chained iters, one
scalar fetch) with TOKENPACKER_VIT_BLOCK toggled by argv.

Usage: python scripts/probe_vit_block.py [fused|xla] [batch]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
if mode == "fused":
    os.environ["TOKENPACKER_VIT_BLOCK"] = "1"
else:
    os.environ.pop("TOKENPACKER_VIT_BLOCK", None)

import jax
import jax.numpy as jnp

from bench import _device_random_like
from tokenpacker_tpu.config import TokenPackerVLMConfig
from tokenpacker_tpu.models.clip_vit import clip_tower_features, init_clip_vit
from tokenpacker_tpu.models.tokenpacker import init_tokenpacker, tokenpacker_forward


def main():
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cfg = TokenPackerVLMConfig()
    dtype = jnp.bfloat16
    shapes = jax.eval_shape(
        lambda: {
            "v": init_clip_vit(jax.random.PRNGKey(0), cfg.vision, dtype),
            "p": init_tokenpacker(jax.random.PRNGKey(0), cfg.projector, dtype),
        }
    )
    params = _device_random_like(shapes)

    def vision_path(params, images):
        feats, multi = clip_tower_features(params["v"], cfg.vision, images)
        return tokenpacker_forward(params["p"], cfg.projector, feats, multi)

    copts = {"xla_tpu_scoped_vmem_limit_kib": 65536} if mode == "fused" else None

    @functools.partial(jax.jit, static_argnames=("n_iter",), compiler_options=copts)
    def bench_loop(params, images, n_iter: int):
        def body(i, carry):
            out = vision_path(params, images + carry)
            return jnp.max(out).astype(images.dtype) * jnp.asarray(0, images.dtype)

        return jax.lax.fori_loop(0, n_iter, body, jnp.asarray(0, images.dtype))

    n_iter = 10
    images = jax.random.normal(jax.random.PRNGKey(1), (batch, 336, 336, 3), dtype)
    t0 = time.perf_counter()
    float(bench_loop(params, images, n_iter))
    print(f"compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    float(bench_loop(params, images, n_iter))
    dt = time.perf_counter() - t0
    print(f"mode={mode} B={batch}: {batch*n_iter/dt:.1f} img/s "
          f"({dt/n_iter*1e3:.1f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
