"""A/B bench: vision tower+projector, bf16 vs w8a8 int8-MXU GEMMs.

The tower's non-attention floor is batched bf16 GEMMs at 76% MFU
(docs/vision_perf.md); the v5e int8 MXU runs at 2x the bf16 FLOP rate.
This measures the opt-in w8a8 vision mode (quantize_tower_int8 +
TOKENPACKER_W8A8=1, ops/s8_gemm.py) against the shipped bf16 path, plus an
isolated GEMM probe at the ViT batch-32 shape to attribute the result.

Usage (on the TPU):
    python scripts/bench_vision_w8a8.py            # full A/B
    python scripts/bench_vision_w8a8.py probe      # isolated GEMM probe only
Env: TOKENPACKER_S8GEMM_BIG=1 picks the large tiles (needs the scoped-vmem
raise this script always applies to its outer jits).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TOKENPACKER_W8A8", "1")

import jax
import jax.numpy as jnp


def _copts():
    if jax.default_backend() != "tpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": 65536}


def probe_gemm():
    """Isolated: bf16 XLA dot vs pallas w8a8 at the ViT fc1 shape
    [32*577, 1024] x [1024, 4096] — the attribution number."""
    from tokenpacker_tpu.ops.quantize import quantize_int8
    from tokenpacker_tpu.ops.s8_gemm import s8_gemm

    m, k, n = 32 * 577, 1024, 4096
    reps = 50
    x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)
    q, scale = quantize_int8(w)
    scale = scale.reshape(1, -1)

    @functools.partial(jax.jit, static_argnames=("mode",), compiler_options=_copts())
    def loop(x, w, q, scale, salt, mode: str):
        def body(i, carry):
            xi = x + carry * jnp.bfloat16(0)
            if mode == "bf16":
                y = xi @ w
            else:
                y = s8_gemm(xi, q, scale)
            return jnp.max(y).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, reps, body, salt.astype(jnp.bfloat16))

    flops = 2 * m * k * n * reps
    out = {}
    for mode in ("bf16", "w8a8"):
        float(loop(x, w, q, scale, jnp.asarray(0), mode))
        t0 = time.perf_counter()
        float(loop(x, w, q, scale, jnp.asarray(1), mode))
        dt = time.perf_counter() - t0
        out[mode] = {
            "us_per_gemm": round(dt / reps * 1e6, 1),
            "tops": round(flops / dt / 1e12, 1),
        }
        print(f"gemm {mode}: {out[mode]}", flush=True)
    return out


def bench_vision(w8a8: bool, batch: int = 32, n_iter: int = 10):
    from tokenpacker_tpu.config import TokenPackerVLMConfig
    from tokenpacker_tpu.models.clip_vit import (
        clip_tower_features,
        init_clip_vit,
        quantize_tower_int8,
    )
    from tokenpacker_tpu.models.tokenpacker import init_tokenpacker, tokenpacker_forward
    from tokenpacker_tpu.utils.bench_params import random_params_like

    cfg = TokenPackerVLMConfig()
    dtype = jnp.bfloat16
    shapes = jax.eval_shape(
        lambda: {
            "v": init_clip_vit(jax.random.PRNGKey(0), cfg.vision, dtype),
            "p": init_tokenpacker(jax.random.PRNGKey(0), cfg.projector, dtype),
        }
    )
    params = random_params_like(shapes)
    if w8a8:
        params = {**params, "v": jax.jit(quantize_tower_int8)(params["v"])}

    @functools.partial(jax.jit, static_argnames=("n_iter",), compiler_options=_copts())
    def bench_loop(params, images, n_iter: int):
        def body(i, carry):
            feats, multi = clip_tower_features(params["v"], cfg.vision, images + carry)
            out = tokenpacker_forward(params["p"], cfg.projector, feats, multi)
            return jnp.max(out).astype(images.dtype) * jnp.asarray(0, images.dtype)

        return jax.lax.fori_loop(0, n_iter, body, jnp.asarray(0, images.dtype))

    images = jax.random.normal(jax.random.PRNGKey(1), (batch, 336, 336, 3), dtype)
    float(bench_loop(params, images, n_iter))
    t0 = time.perf_counter()
    float(bench_loop(params, images, n_iter))
    dt = time.perf_counter() - t0
    ips = batch * n_iter / dt
    print(f"vision w8a8={w8a8}: {ips:.1f} img/s ({dt / n_iter * 1e3:.1f} ms/batch{batch})",
          flush=True)
    return ips


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    results = {"big_tiles": os.environ.get("TOKENPACKER_S8GEMM_BIG") == "1"}
    if mode in ("probe", "all"):
        results["gemm_probe"] = probe_gemm()
    if mode in ("vision", "all"):
        results["img_s_w8a8"] = round(bench_vision(True), 1)
        results["img_s_bf16"] = round(bench_vision(False), 1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
