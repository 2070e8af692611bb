"""HD end-to-end prefill benchmark on one TPU chip (worst-case grid).

Default: TokenPacker-HD-7b, patch_num 9, worst-case 3x3 grid + global view =
10 crops per image → 1459 visual tokens (9*144 + separators + global 144).
Measures images/s/chip and TTFT for the full pipeline: per-crop
ViT+projector, slice splice, quantized-LM prefill. The BASELINE.md north
star (≥20 img/s on v5e-8) is this number × 8-way data parallelism.

--preset 13b-16patch benches TokenPacker-HD-13b (vicuna-13B geometry,
patch_num 16, worst-case 4x4 grid + global = 17 crops, ~2600-token prompts);
int4 weights (~6.5 GB) are what make 13B + an HD-sized KV cache fit one
v5e chip (docs/deploy_13b.md).

Run: python scripts/bench_hd.py [--preset 7b-9patch|13b-16patch]
     [--quant int8|int4]   (real TPU)
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tokenpacker_tpu.config import TokenPackerVLMConfig
from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX
from tokenpacker_tpu.generate import prefill
from tokenpacker_tpu.models.splice import build_splice_plan
from tokenpacker_tpu.models.vlm import init_vlm


def quant_params(cfg, dtype, quant: str):
    from tokenpacker_tpu.models.vlm import init_vlm
    from tokenpacker_tpu.utils.bench_params import int8_params_like, q4_params_like

    shapes = jax.eval_shape(lambda: init_vlm(jax.random.PRNGKey(0), cfg, dtype))
    if quant == "int4":
        return q4_params_like(shapes, cfg.lm, quant_type="int4", fused=True)
    return int8_params_like(shapes)


def measure(preset: str = "7b-9patch", quant: str | None = None, n_loop: int = 8,
            params=None):
    """Measure (images_per_sec_per_chip, ttft_p50_ms) for an HD preset.

    Importable (bench.py's hd_7b_9patch section); params may be passed in to
    reuse an already-materialized quantized model."""
    from tokenpacker_tpu.config import vicuna_13b
    from tokenpacker_tpu.generate import pick_bucket

    if preset == "13b-16patch":
        cfg = TokenPackerVLMConfig(lm=vicuna_13b(), patch_num=16,
                                   image_aspect_ratio="slice")
        hb = wb = 4  # worst-case patch_num-16 grid; 17 crops incl. global
        quant = quant or "int4"
    else:
        cfg = TokenPackerVLMConfig()
        hb = wb = 3  # worst-case patch_num-9 grid; 10 crops incl. global view
        quant = quant or "int8"
    dtype = jnp.bfloat16
    if params is None:
        params = quant_params(cfg, dtype, quant)

    ids = np.concatenate([[1], np.arange(100, 135), [IMAGE_TOKEN_INDEX], np.arange(150, 160)]).astype(np.int64)
    probe = build_splice_plan([ids], [[(hb, wb)]], cfg.tokens_per_view, "slice",
                              29892, 13, 0)
    plan = build_splice_plan([ids], [[(hb, wb)]], cfg.tokens_per_view, "slice",
                             29892, 13, 0, pad_to=pick_bucket(int(probe.lengths[0])))
    l = plan.token_ids.shape[1]
    n_crops = hb * wb + 1
    batch = {
        "images": jax.random.normal(jax.random.PRNGKey(2), (n_crops, 336, 336, 3), dtype),
        "token_ids": jnp.asarray(plan.token_ids),
        "is_image": jnp.asarray(plan.is_image),
        "image_slot": jnp.asarray(plan.image_slot),
        "lengths": jnp.asarray(plan.lengths, jnp.int32),
    }
    s_max = l + 64
    print(f"visual tokens: {int(plan.is_image.sum())}, seq {int(plan.lengths[0])} (bucket {l})", flush=True)

    # TTFT: median of 5 — inputs varied per call and a scalar fetched
    # (identical repeated calls are memoized over the axon tunnel; CLAUDE.md)
    logits, cache = prefill(params, cfg, batch, s_max)
    float(logits[0, 0])
    ts = []
    for i in range(5):
        b = dict(batch)
        b["images"] = batch["images"] + jnp.asarray(i + 1, dtype)
        t0 = time.perf_counter()
        logits, cache = prefill(params, cfg, b, s_max)
        float(logits[0, 0])
        ts.append(time.perf_counter() - t0)
    ttft_ms = sorted(ts)[2] * 1e3
    print(f"TTFT p50: {ttft_ms:.0f} ms", flush=True)

    # throughput: chained loop (tunnel-proof). prefill() is called directly —
    # its nested jit inlines under the outer trace (cache creation is pure)
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(params, batch, n):
        def body(i, c):
            b = dict(batch)
            b["images"] = batch["images"] + c
            lg, _ = prefill(params, cfg, b, s_max)
            return jnp.max(lg).astype(dtype) * jnp.asarray(0, dtype)

        return jax.lax.fori_loop(0, n, body, jnp.asarray(0, dtype))

    n = n_loop
    float(loop(params, batch, n))
    t0 = time.perf_counter()
    float(loop(params, batch, n))
    dt = time.perf_counter() - t0
    ips = n / dt
    label = f"HD-{preset} ({hb}x{wb}+global, {quant} LM)"
    print(f"{label}: {ips:.2f} images/s/chip, TTFT p50 {ttft_ms:.0f} ms")
    print(f"x8 DP extrapolation: {ips * 8:.1f} images/s on v5e-8 (north star: >=20)")
    return ips, ttft_ms


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="7b-9patch", choices=["7b-9patch", "13b-16patch"])
    ap.add_argument("--quant", default=None, choices=["int8", "int4"],
                    help="default: int8 for 7b, int4 for 13b")
    args = ap.parse_args()
    measure(args.preset, args.quant)


if __name__ == "__main__":
    main()
