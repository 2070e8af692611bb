"""Benchmark: ViT-L/14-336 + TokenPacker projector throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

This is the BASELINE.json north-star vision-path metric (images/sec/chip for
tower+projector). vs_baseline is measured against the 20 images/sec
end-to-end HD target (BASELINE.md) — the vision path must run far above it.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from tokenpacker_tpu.config import TokenPackerVLMConfig
    from tokenpacker_tpu.models.clip_vit import init_clip_vit
    from tokenpacker_tpu.models.tokenpacker import init_tokenpacker, tokenpacker_forward
    from tokenpacker_tpu.models.clip_vit import clip_tower_features

    cfg = TokenPackerVLMConfig()
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    vparams = init_clip_vit(key, cfg.vision, dtype)
    pparams = init_tokenpacker(key, cfg.projector, dtype)

    @jax.jit
    def vision_path(vp, pp, images):
        feats, multi = clip_tower_features(vp, cfg.vision, images)
        return tokenpacker_forward(pp, cfg.projector, feats, multi)

    best = 0.0
    for batch in (32, 64, 128):
        images = jax.random.normal(
            jax.random.PRNGKey(1), (batch, 336, 336, 3), dtype
        )
        out = jax.block_until_ready(vision_path(vparams, pparams, images))  # compile+warm
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = vision_path(vparams, pparams, images)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        ips = batch * iters / dt
        best = max(best, ips)

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
