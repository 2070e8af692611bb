"""Mixed-workload serving soak on the live paged batcher (VERDICT r4 #6).

Every serving number so far was a single-feature bench; this drives the
COMPOSITION the worker actually runs — PagedContinuousBatcher with prefix
caching, per-request LoRA adapters, image and text-only prompts of varied
lengths, and mid-flight cancellations — under a seeded arrival process for
O(minutes), and checks leak-freedom (slots, pages, refcounts) at the end.

Workload (seeded, reproducible):
- 60% text-only chat turns sharing a 64-token system prefix (warm
  prefix-cache admissions after the first), lengths varied WITHIN one
  pick_bucket so the compile set stays bounded over the axon tunnel;
- 20% single-image requests drawing from 2 distinct images (repeat images
  inside a cached prefix skip the vision encode);
- 20% routed to one of two LoRA adapters (slot-LoRA overlay decode);
- ~12% of requests are cancelled after their second streamed token.

Protocol: pass 1 (same generator, warmup seed) absorbs every compile;
pass 2 is measured — agg decoded tok/s over the pass, per-request TTFT
p50/p95, prefix-cache stats, then drain + leak assertions.

Run: python scripts/bench_serving_soak.py [n_requests=40]
"""

from __future__ import annotations

import json
import os
import queue
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tokenpacker_tpu.config import TokenPackerVLMConfig
from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX
from tokenpacker_tpu.models.splice import build_splice_plan

SYSTEM = np.arange(100, 163)  # 63 tokens + BOS = a full 64-token block


def text_request(cfg, rng):
    tail = rng.integers(5, 56)
    ids = np.concatenate(
        [[1], SYSTEM, rng.integers(200, 2000, tail)]
    ).astype(np.int64)
    plan = build_splice_plan([ids], [[]], cfg.tokens_per_view, "single",
                             0, 0, 0, pad_to=128)
    return {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_slot": plan.image_slot,
        "lengths": plan.lengths,
        "images": None,
    }


def image_request(cfg, rng, image_seed: int):
    tail = rng.integers(5, 40)
    ids = np.concatenate(
        [[1], SYSTEM, [IMAGE_TOKEN_INDEX], rng.integers(200, 2000, tail)]
    ).astype(np.int64)
    plan = build_splice_plan([ids], [[(1, 1)]], cfg.tokens_per_view, "single",
                             0, 0, 0, pad_to=256)
    sz = cfg.vision.image_size
    images = jax.random.normal(
        jax.random.PRNGKey(image_seed), (1, sz, sz, 3), jnp.bfloat16)
    return {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_slot": plan.image_slot,
        "lengths": plan.lengths,
        "images": images,
    }


def run_pass(batcher, cfg, n_requests: int, seed: int, adapters: bool):
    """Submit the seeded workload; returns per-request records + wall."""
    rng = np.random.default_rng(seed)
    records = []
    pending = []
    t_pass = time.perf_counter()
    for i in range(n_requests):
        kind = rng.random()
        if kind < 0.6:
            req = text_request(cfg, rng)
        else:
            req = image_request(cfg, rng, int(rng.integers(0, 2)))
        adapter = None
        if adapters and rng.random() < 0.2:
            adapter = f"ad{int(rng.integers(0, 2))}"
        cancel_after = 2 if rng.random() < 0.12 else None
        max_new = int(rng.integers(6, 20))

        rec = {"t0": time.perf_counter(), "ttft": None, "tokens": 0,
               "cancelled": False}
        q: queue.Queue = queue.Queue()
        fut = batcher.submit(req, max_new_tokens=max_new, temperature=0.0,
                             on_token=q.put, adapter=adapter)
        rec["fut"], rec["q"], rec["cancel_after"] = fut, q, cancel_after
        records.append(rec)
        pending.append(rec)
        # arrival gaps ~exp(0.25 s); drain token queues while we wait so
        # TTFT is observed promptly and cancellations fire mid-flight
        deadline = time.perf_counter() + float(rng.exponential(0.25))
        while True:
            _poll(batcher, pending)
            if time.perf_counter() >= deadline:
                break
            time.sleep(0.01)
    while pending:
        _poll(batcher, pending)
        time.sleep(0.02)
    wall = time.perf_counter() - t_pass
    for rec in records:
        rec.pop("fut"), rec.pop("q")
    return records, wall


def _poll(batcher, pending):
    for rec in list(pending):
        try:
            while True:
                rec["q"].get_nowait()
                rec["tokens"] += 1
                if rec["ttft"] is None:
                    rec["ttft"] = time.perf_counter() - rec["t0"]
                if rec["cancel_after"] and rec["tokens"] >= rec["cancel_after"]:
                    batcher.cancel(rec["fut"])
                    rec["cancelled"] = True
        except queue.Empty:
            pass
        if rec["fut"].done():
            pending.remove(rec)


def measure(n_requests: int = 40, params=None, cfg=None):
    from bench import _int8_params_on_device
    from tokenpacker_tpu.serve.multi_lora import Adapter, target_dims
    from tokenpacker_tpu.serve.scheduler import PagedContinuousBatcher

    if cfg is None:
        cfg = TokenPackerVLMConfig()
    if params is None:
        params = _int8_params_on_device(cfg, jnp.bfloat16)

    rng = np.random.default_rng(7)
    dims = target_dims(cfg.lm)
    nl = cfg.lm.num_hidden_layers
    r = 8

    def mk_adapter():
        return Adapter({
            tgt: (rng.standard_normal((nl, din, r), np.float32) * 0.01,
                  rng.standard_normal((nl, r, dout), np.float32) * 0.01)
            for tgt, (din, dout) in dims.items()
        }, r)

    adapters = {"ad0": mk_adapter(), "ad1": mk_adapter()}
    batcher = PagedContinuousBatcher(
        params, cfg, num_slots=4, num_pages=96, page_size=64,
        max_pages_per_seq=5, prefix_cache=True, adapters=adapters,
    )
    free0 = batcher.allocator.available()
    batcher.start()
    try:
        print("warmup pass (compiles)...", flush=True)
        t0 = time.perf_counter()
        run_pass(batcher, cfg, min(n_requests, 16), seed=1, adapters=True)
        print(f"warmup done in {time.perf_counter()-t0:.0f}s", flush=True)

        print(f"measured pass ({n_requests} requests)...", flush=True)
        records, wall = run_pass(batcher, cfg, n_requests, seed=2, adapters=True)
        stats = dict(batcher.prefix.stats())

        # leak-freedom: after the drain every page not held by the prefix
        # cache is back on the free list, refcounts match holders, and all
        # slots are empty
        deadline = time.perf_counter() + 60
        while time.perf_counter() < deadline:
            retained = len(batcher.prefix.blocks)
            if (batcher.allocator.available() == free0 - retained
                    and all(s is None for s in batcher.slots)):
                break
            time.sleep(0.05)
        retained = len(batcher.prefix.blocks)
        leaked = free0 - retained - batcher.allocator.available()
        # every live refcount is exactly the prefix cache's single claim
        bad_refs = {p: c for p, c in batcher.allocator.refs.items() if c != 1}
        cached = set(batcher.prefix.blocks.values())
        stale = set(batcher.allocator.refs) - cached
    finally:
        batcher.stop()

    ttfts = sorted(r["ttft"] for r in records if r["ttft"] is not None)
    toks = sum(r["tokens"] for r in records)
    cancelled = sum(1 for r in records if r["cancelled"])
    out = {
        "soak_requests": len(records),
        "soak_cancelled": cancelled,
        "soak_agg_tokens_per_sec": round(toks / wall, 1),
        "soak_ttft_p50_ms": round(ttfts[len(ttfts) // 2] * 1e3, 1),
        "soak_ttft_p95_ms": round(ttfts[int(len(ttfts) * 0.95)] * 1e3, 1),
        "soak_wall_s": round(wall, 1),
        "soak_pages_leaked": leaked,
        "soak_bad_refcounts": len(bad_refs),
        "soak_stale_refs": len(stale),
        "soak_slots_drained": True,
        **{f"soak_{k}": v for k, v in stats.items()},
    }
    print(json.dumps(out, indent=1), flush=True)
    assert leaked == 0 and not bad_refs and not stale, (leaked, bad_refs, stale)
    return out


def main():
    from tokenpacker_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    measure(int(sys.argv[1]) if len(sys.argv) > 1 else 40)


if __name__ == "__main__":
    main()
