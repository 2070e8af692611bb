"""Benchmark: ViT-L/14-336 + TokenPacker projector throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North-star vision-path metric (BASELINE.json): images/sec/chip for
tower+projector, bf16. vs_baseline is measured against the 20 images/sec
end-to-end HD target (BASELINE.md).

Measurement methodology (the chip is reached through a high-latency axon
tunnel, so per-call host timing is unreliable):
- N forward passes are chained inside ONE jitted lax.fori_loop with a data
  dependency between iterations (carry feeds the next input), so the device
  must execute them sequentially;
- the only host transfer is one scalar at the end;
- throughput = N * batch / wall(loop) after a warmup run.

Weights are random host-side numpy (on-device random init over the tunnel
takes minutes; values don't affect throughput).
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def _host_random_like(tree, seed=0):
    rng = np.random.default_rng(seed)

    def f(leaf):
        if leaf is None:
            return None
        arr = rng.standard_normal(leaf.shape).astype(np.float32) * 0.02
        return jnp.asarray(arr, leaf.dtype)

    return jax.tree.map(f, tree)


def main():
    from tokenpacker_tpu.config import TokenPackerVLMConfig
    from tokenpacker_tpu.models.clip_vit import clip_tower_features, init_clip_vit
    from tokenpacker_tpu.models.tokenpacker import init_tokenpacker, tokenpacker_forward

    cfg = TokenPackerVLMConfig()
    dtype = jnp.bfloat16
    shapes = jax.eval_shape(
        lambda: {
            "v": init_clip_vit(jax.random.PRNGKey(0), cfg.vision, dtype),
            "p": init_tokenpacker(jax.random.PRNGKey(0), cfg.projector, dtype),
        }
    )
    params = _host_random_like(shapes)

    def vision_path(params, images):
        feats, multi = clip_tower_features(params["v"], cfg.vision, images)
        return tokenpacker_forward(params["p"], cfg.projector, feats, multi)

    @functools.partial(jax.jit, static_argnames=("n_iter",))
    def bench_loop(params, images, n_iter: int):
        def body(i, carry):
            out = vision_path(params, images + carry)
            return jnp.max(out).astype(images.dtype) * jnp.asarray(0, images.dtype)

        return jax.lax.fori_loop(0, n_iter, body, jnp.asarray(0, images.dtype))

    results = {}
    n_iter = 10
    for batch in (32, 64, 128):
        images = jnp.asarray(
            np.random.default_rng(1).standard_normal((batch, 336, 336, 3)), dtype
        )
        float(bench_loop(params, images, n_iter))  # compile + warm
        t0 = time.perf_counter()
        float(bench_loop(params, images, n_iter))
        dt = time.perf_counter() - t0
        results[batch] = batch * n_iter / dt

    best = max(results.values())
    print(
        json.dumps(
            {
                "metric": "vit_tokenpacker_images_per_sec_per_chip",
                "value": round(best, 2),
                "unit": "images/s",
                "vs_baseline": round(best / 20.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
