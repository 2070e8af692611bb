"""Warm vs cold admission TTFT with automatic prefix caching (HD flagship).

The chat serving pattern prefix caching targets: a fixed system prompt +
image re-queried with different questions. Cold admission pays the full
per-crop ViT+projector encode and the ~1500-token prefill; a warm admission
maps the cached prompt pages and prefills only the question suffix — the
vision encode is skipped entirely (every image token lives inside the
cached prefix).

Measurement notes (axon tunnel, CLAUDE.md):
- TTFT is host wall-clock from submit() to the first on_token callback
  through the live PagedContinuousBatcher loop — the latency a worker
  client actually sees, scheduler overhead included.
- Warm admissions use DIFFERENT question suffixes (q2, q3, ...) so no two
  measured device calls are identical (identical repeats can be memoized
  over the tunnel); a warmup pass per shape absorbs compiles.

Run: python scripts/bench_prefix_cache.py   (real TPU; ~int8 7B HD preset)
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
from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX
from tokenpacker_tpu.generate import pick_bucket
from tokenpacker_tpu.models.splice import build_splice_plan


def hd_request(cfg, image_seed: int, question: np.ndarray, pad_to: int, hb=3, wb=3):
    n_crops = hb * wb + 1
    ids = np.concatenate(
        [[1], np.arange(100, 135), [IMAGE_TOKEN_INDEX], question]
    ).astype(np.int64)
    plan = build_splice_plan([ids], [[(hb, wb)]], cfg.tokens_per_view, "slice",
                             29892, 13, 0, pad_to=pad_to)
    images = jax.random.normal(
        jax.random.PRNGKey(image_seed), (n_crops, 336, 336, 3), jnp.bfloat16
    )
    return {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_slot": plan.image_slot,
        "lengths": plan.lengths,
        "images": images,
    }


def ttft(batcher, req, max_new=2) -> float:
    t0 = time.perf_counter()
    first: list[float] = []

    def on_token(_tok):
        if not first:
            first.append(time.perf_counter() - t0)

    batcher.submit(req, max_new, on_token=on_token).result(timeout=1800)
    return first[0] * 1e3


def turn2_request(cfg, image_seed: int, s: int, pad_to: int, a0_len: int):
    """A second chat turn: turn-1's FULL prompt (system + HD image + q0) +
    turn-1's answer (a0_len tokens, chosen so the new question starts on a
    page boundary) + a new question. The whole turn-1 conversation — image
    included — is then a page-aligned cached prefix, so a warm admission
    skips the 10-crop vision encode AND all but the last-block prefill."""
    q0 = np.arange(150, 160)
    a0 = np.arange(300, 300 + a0_len)
    q1 = np.arange(400 + s, 416 + s)
    ids = np.concatenate(
        [[1], np.arange(100, 135), [IMAGE_TOKEN_INDEX], q0, a0, q1]
    ).astype(np.int64)
    plan = build_splice_plan([ids], [[(3, 3)]], cfg.tokens_per_view, "slice",
                             29892, 13, 0, pad_to=pad_to)
    images = jax.random.normal(
        jax.random.PRNGKey(image_seed), (10, 336, 336, 3), jnp.bfloat16
    )
    return {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_slot": plan.image_slot,
        "lengths": plan.lengths,
        "images": images,
    }


def measure(n_samples: int = 3, params=None):
    """Measure (cold, warm) turn-2 admission TTFTs. Importable (bench.py's
    prefix_cache section). Returns the result dict."""
    from tokenpacker_tpu.serve.scheduler import PagedContinuousBatcher

    cfg = TokenPackerVLMConfig(patch_num=9, image_aspect_ratio="slice")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_hd import quant_params

    if params is None:
        params = quant_params(cfg, jnp.bfloat16, "int8")

    q0 = np.arange(150, 160)
    probe = build_splice_plan(
        [np.concatenate([[1], np.arange(100, 135), [IMAGE_TOKEN_INDEX], q0]).astype(np.int64)],
        [[(3, 3)]], cfg.tokens_per_view, "slice", 29892, 13, 0,
    )
    len1 = int(probe.lengths[0])
    # turn-1 answer length that lands the new question ON a page boundary:
    # the block mixing image tail + a0 is then identical across turn-2s
    a0_len = (64 - len1 % 64) % 64 or 64
    pad_to = pick_bucket(len1 + a0_len + 32)  # room for turn 2
    print(f"HD turn-1 prompt: {len1} tokens, a0 {a0_len} (bucket {pad_to})",
          flush=True)

    # pool sizing for ONE v5e chip beside 7 GB of int8 weights: one active
    # HD sequence + its cached prompt blocks + slack (bf16 KV ≈ 0.5 MB per
    # position; 128 pages of 64 OOMed)
    batcher = PagedContinuousBatcher(
        params, cfg, num_slots=1, num_pages=2 * ((pad_to + 128) // 64) + 8,
        page_size=64, max_pages_per_seq=(pad_to + 128) // 64, prefix_cache=True,
    )
    batcher.start()
    try:
        # turn 1 with image A (compiles prefill/decode at this bucket) and
        # with image B (whose blocks the warm turn-2s below will reuse)
        ttft(batcher, hd_request(cfg, 0, q0, pad_to))
        ttft(batcher, hd_request(cfg, 1, q0, pad_to))
        # warm warmups: the FIRST runs at one block less (its own block-23
        # registration is what the rest match), so a second warmup is
        # needed to compile the measured-shape (m=24) fused admission
        ttft(batcher, turn2_request(cfg, 1, 1, pad_to, a0_len))
        ttft(batcher, turn2_request(cfg, 1, 99, pad_to, a0_len))
        skipped_before = batcher.prefix.vision_skipped
        warms = [
            ttft(batcher, turn2_request(cfg, 1, 2 + i, pad_to, a0_len))
            for i in range(n_samples)
        ]
        # cold turn-2 A/B controls LAST (fresh images → guaranteed misses;
        # their pool pressure may evict image B's blocks, so they must not
        # precede the warm runs): full encode + prefill, identical shape
        colds = [
            ttft(batcher, turn2_request(cfg, 2 + i, 0, pad_to, a0_len))
            for i in range(n_samples)
        ]
        stats = batcher.prefix.stats()
    finally:
        batcher.stop()

    warm = sorted(warms)[len(warms) // 2]
    cold = sorted(colds)[len(colds) // 2]
    out = {
        "ttft_cold_turn2_ms": round(cold, 1),
        "ttft_warm_turn2_ms": round(warm, 1),
        "cold_runs_ms": [round(c, 1) for c in colds],
        "warm_runs_ms": [round(w, 1) for w in warms],
        "speedup": round(cold / warm, 2),
        "vision_skipped_in_measured_warms": stats[
            "prefix_vision_encodes_skipped"] - skipped_before,
        **stats,
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    from tokenpacker_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    measure()


if __name__ == "__main__":
    main()
