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

Weights are random, materialized on-device by one jitted program — neither
per-op random init nor host->TPU weight transfer survives the tunnel latency.
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def _device_random_like(tree, seed=0):
    """Materialize params on-device with ONE jitted program — no host->TPU
    weight transfer (14 GB over the axon tunnel would dominate the bench)."""
    from tokenpacker_tpu.utils.bench_params import random_params_like

    return random_params_like(tree, seed)


_START = time.perf_counter()
_DETAILS: dict = {}


def _flush():
    """Persist details INCREMENTALLY: a budget exhaust, tunnel outage, or
    crash mid-sweep must not lose rows already measured (VERDICT r3 item 4 —
    the r3 run captured only 4 rows because everything was written once at
    the end)."""
    with open("bench_details.json", "w") as f:
        json.dump(_DETAILS, f, indent=2)


def _budget_left() -> bool:
    return time.perf_counter() - _START < float(
        os.environ.get("TOKENPACKER_BENCH_BUDGET_S", "900")
    )


def _section(name: str, fn):
    """Run one bench section under the budget, flushing after it."""
    if not _budget_left():
        _DETAILS.setdefault("skipped_sections", []).append(name)
        _flush()
        return
    try:
        _DETAILS.update(fn())
    except Exception as e:  # noqa: BLE001 — a dead section must not kill the rest
        _DETAILS[name + "_error"] = str(e)[:400]
    _flush()


def main():
    # persistent executable cache: re-runs skip recompiles where the axon
    # plugin supports serialization (fail-open otherwise)
    from tokenpacker_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
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
    params = _device_random_like(shapes)

    def vision_path(params, images):
        feats, multi = clip_tower_features(params["v"], cfg.vision, images)
        return tokenpacker_forward(params["p"], cfg.projector, feats, multi)

    @functools.partial(jax.jit, static_argnames=("n_iter",))
    def bench_loop(params, images, n_iter: int):
        def body(i, carry):
            out = vision_path(params, images + carry)
            return jnp.max(out).astype(images.dtype) * jnp.asarray(0, images.dtype)

        return jax.lax.fori_loop(0, n_iter, body, jnp.asarray(0, images.dtype))

    # headline: one batch size, measured first, printed IMMEDIATELY — the
    # remote compile service's latency varies wildly, so everything optional
    # happens after the required JSON line is already on stdout
    n_iter = 10
    batch = 32
    images = jax.random.normal(jax.random.PRNGKey(1), (batch, 336, 336, 3), dtype)
    float(bench_loop(params, images, n_iter))  # compile + warm
    t0 = time.perf_counter()
    float(bench_loop(params, images, n_iter))
    dt = time.perf_counter() - t0
    best = batch * n_iter / dt

    print(
        json.dumps(
            {
                "metric": "vit_tokenpacker_images_per_sec_per_chip",
                "value": round(best, 2),
                "unit": "images/s",
                "vs_baseline": round(best / 20.0, 2),
            }
        ),
        flush=True,
    )

    _DETAILS["vision_images_per_sec"] = {str(batch): round(best, 2)}
    _flush()
    del params, images
    # full headline set, highest-value rows first (VERDICT r3 item 4): each
    # section is budget-gated and flushed independently
    _section("generation", bench_7b_generation)
    _section("int8", bench_7b_int8_decode)
    _section("hd_flagship", bench_hd_flagship)
    _section("int8_kv", bench_7b_int8kv_decode)
    _section("int4", bench_7b_int4_decode)
    _section("multi_lora", bench_7b_multi_lora)
    _section("speculative", bench_7b_speculative)
    _section("spec_realistic", bench_7b_spec_realistic)
    _section("hd_decode_s2048", bench_7b_hd_decode_s2048)
    _section("prefix_cache", bench_prefix_cache)
    _section("serving_soak", bench_serving_soak)
    _section("13b", bench_13b)
    _section("nf4", bench_7b_nf4_decode)
    # beam before bigbatch: the bigbatch rows are already driver-recorded
    # (round 4) while the beam row is new this round — and the beam
    # program's ~4-min compile is not covered by the persistent cache
    # (measured twice), so whichever runs last risks the budget gate
    _section("beam", bench_7b_beam)
    _section("int8kv_bigbatch", bench_7b_int8kv_bigbatch)


def bench_7b_multi_lora():
    """Multi-LoRA serving through the fused decode kernel (round 5, VERDICT
    r4 #1 — the reference can only merge ONE adapter at load,
    builder.py:46-79): B=8, n=2 live adapters r=16 cycling over slots.
    First measured 2026-08-19: fused+lora 410.5 agg tok/s vs XLA+lora 253.1
    (1.62x) vs fused base 426.1 (the adapters cost 3.7%)."""
    import importlib.util
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "bench_multi_lora",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "scripts", "bench_multi_lora.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv, _sys.argv = _sys.argv, ["bench_multi_lora.py", "2", "16", "8"]
    only = os.environ.get("ONLY")
    os.environ["ONLY"] = "lora"  # base rows are covered by the int8 section
    try:
        out = mod.main() or {}
    finally:
        _sys.argv = argv
        if only is None:
            os.environ.pop("ONLY", None)
        else:
            os.environ["ONLY"] = only
    return {f"multi_lora_{k}": v for k, v in out.items()}


def bench_7b_beam():
    """Batched on-device beam search (round 5; the reference beam-decodes
    through HF GenerationMixin — a batch-1 python loop with a host sync +
    full-cache reorder per step): n=4 requests x k=4 beams as ONE jitted
    while_loop at 7B int8 + int8 KV, vs the plain B=16 decode loop at the
    same shapes (isolates the selection + span-gather machinery cost).
    n*k=16 is the measured single-chip envelope at S=512 — the beam
    reorder double-buffers the carried cache, so 32 rows OOM where the
    plain loop's B=32 fits. scripts/bench_beam.py has the protocol."""
    import importlib.util
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "bench_beam",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "scripts", "bench_beam.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    prev = os.environ.get("TOKENPACKER_KV_CACHE")
    os.environ["TOKENPACKER_KV_CACHE"] = "int8"
    try:
        return mod.main([(4, 4)])
    finally:
        if prev is None:
            os.environ.pop("TOKENPACKER_KV_CACHE", None)
        else:
            os.environ["TOKENPACKER_KV_CACHE"] = prev


def bench_serving_soak():
    """Mixed-workload soak on the live paged batcher (VERDICT r4 #6):
    seeded arrivals over 4 slots — text/image prompts, repeat prefixes,
    two LoRA adapters, mid-flight cancellations — with leak assertions.
    scripts/bench_serving_soak.py has the protocol."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from bench_serving_soak import measure

    out = measure(n_requests=int(os.environ.get("SOAK_REQUESTS", "40")))
    keep = ("soak_agg_tokens_per_sec", "soak_ttft_p50_ms", "soak_ttft_p95_ms",
            "soak_requests", "soak_cancelled", "soak_pages_leaked",
            "soak_prefix_cache_hits", "soak_prefix_vision_encodes_skipped")
    return {k: out[k] for k in keep if k in out}


def bench_13b():
    """Driver-captured 13B rows (VERDICT r4 #5): single-chip 13B int8
    decode (fused kernel; parity-checked vs XLA with identical 64-step
    token sums in round 3 — 45.4 tok/s manual) and the HD-13b 16-patch
    int4 prefill (0.95 img/s manual, the only single-chip 13B HD config).
    Matches the reference's 13B model zoo (README.md:132,135-137)."""
    import importlib.util
    import sys as _sys

    out = {}
    spec = importlib.util.spec_from_file_location(
        "bench_fused_decode",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "scripts", "bench_fused_decode.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    prev = os.environ.get("GEOM")
    os.environ["GEOM"] = "13b"
    try:
        tps, _ms = mod.bench(1)
        out["decode_tokens_per_sec_13b_int8"] = round(tps, 1)
    finally:
        if prev is None:
            os.environ.pop("GEOM", None)
        else:
            os.environ["GEOM"] = prev
    _DETAILS.update(out)
    _flush()
    if _budget_left():
        _sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from bench_hd import measure as hd_measure

        ips, ttft_ms = hd_measure("13b-16patch", "int4", n_loop=4)
        out["hd_13b_16patch_images_per_sec_per_chip"] = round(ips, 2)
        out["ttft_p50_ms_13b_hd"] = round(ttft_ms, 1)
    return out


def bench_7b_nf4_decode():
    """nf4 decode (quality-parity 4-bit path; VERDICT r4 #4 wants the
    round-2 17.8 tok/s figure re-measured under driver conditions).
    3 reps, median (scripts/bench_q4_decode.py is the full-protocol
    variant with variance bands)."""
    from tokenpacker_tpu.config import TokenPackerVLMConfig
    from tokenpacker_tpu.generate import decode_step_cb
    from tokenpacker_tpu.models.llama import KVCache
    from tokenpacker_tpu.models.vlm import init_vlm
    from tokenpacker_tpu.utils.bench_params import q4_params_like

    cfg = TokenPackerVLMConfig()
    dtype = jnp.bfloat16
    lm = cfg.lm
    shapes = jax.eval_shape(lambda: init_vlm(jax.random.PRNGKey(0), cfg, dtype))
    params = q4_params_like(shapes, lm, quant_type="nf4", fused=True)
    s_max, n_steps, b = 512, 64, 1
    cache = KVCache(
        jnp.zeros((lm.num_hidden_layers, b, s_max, lm.kv_heads, lm.head_dim), dtype),
        jnp.zeros((lm.num_hidden_layers, b, s_max, lm.kv_heads, lm.head_dim), dtype),
        jnp.full((b,), 100, jnp.int32),
    )

    # no scoped-vmem raise on 4-bit trees (see bench_7b_int4_decode)
    @jax.jit
    def loop(params, cache, toks, active, salt):
        toks = toks + salt * 0

        def body(i, carry):
            cache, toks = carry
            logits, cache = decode_step_cb(params, cfg, cache, toks, cache.length, active)
            return cache, jnp.argmax(logits, -1).astype(jnp.int32)

        cache, toks = jax.lax.fori_loop(0, n_steps, body, (cache, toks))
        return jnp.sum(toks)

    toks = jnp.ones((b,), jnp.int32)
    active = jnp.ones((b,), bool)
    float(loop(params, cache, toks, active, jnp.asarray(0)))
    rates = []
    for i in range(3):
        t0 = time.perf_counter()
        float(loop(params, cache, toks, active, jnp.asarray(i + 1)))
        rates.append(n_steps / (time.perf_counter() - t0))
    rates.sort()
    return {"decode_tokens_per_sec_7b_nf4": round(rates[len(rates) // 2], 1)}


def bench_prefix_cache():
    """Warm vs cold multi-turn HD admission through the live paged batcher
    with automatic prefix caching (round 4; serve/prefix_cache.py): turn-2
    reuses turn-1's cached conversation pages and skips the vision encode.
    Measured 2026-08-19: warm 436 ms vs cold 711 ms (1.63x wall over the
    axon tunnel; device-side ~60 vs ~220 ms). scripts/bench_prefix_cache.py
    has the full protocol."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from bench_prefix_cache import measure

    r = measure(n_samples=2)
    return {
        "ttft_warm_prefix_turn2_ms_7b_hd": r["ttft_warm_turn2_ms"],
        "ttft_cold_turn2_ms_7b_hd": r["ttft_cold_turn2_ms"],
        "prefix_cache_warm_speedup": r["speedup"],
        "prefix_vision_encodes_skipped": r["vision_skipped_in_measured_warms"],
    }


def bench_hd_flagship():
    """The BASELINE.md north star: TokenPacker-HD-7b patch_num 9, worst-case
    3x3 grid + global view (10 crops, ~1459-token prompt), int8 LM — end-to-
    end prefill images/s/chip and the user-facing HD TTFT. First measured
    2026-08-19: 5.72 img/s/chip, TTFT p50 221 ms (x8 DP = 45.7 img/s vs the
    >=20 target). Replaces the reference's HD eval path
    (llava/patch_divide.py:71-105 + llava/eval/eval_docvqa.py:64-101)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from bench_hd import measure

    ips, ttft_ms = measure("7b-9patch", "int8", n_loop=8)
    return {
        "hd_7b_9patch_images_per_sec_per_chip": round(ips, 2),
        "ttft_p50_ms_7b_hd": round(ttft_ms, 1),
        "hd_7b_9patch_images_per_sec_x8dp": round(ips * 8, 1),
    }


def bench_7b_generation():
    """Secondary north stars on the 7B flagship: p50 TTFT (prefill incl.
    vision) and decode tokens/sec, single chip, bf16, batch 1."""
    import functools

    from tokenpacker_tpu.config import TokenPackerVLMConfig
    from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX
    from tokenpacker_tpu.generate import decode_step, prefill
    from tokenpacker_tpu.models.splice import build_splice_plan
    from tokenpacker_tpu.models.vlm import init_vlm

    cfg = TokenPackerVLMConfig()
    dtype = jnp.bfloat16
    shapes = jax.eval_shape(lambda: init_vlm(jax.random.PRNGKey(0), cfg, dtype))
    params = _device_random_like(shapes, seed=1)

    ids = np.concatenate([[1], np.arange(100, 140), [IMAGE_TOKEN_INDEX], np.arange(150, 160)])
    plan = build_splice_plan(
        [ids.astype(np.int64)], [[(1, 1)]], cfg.tokens_per_view, "single", 0, 0, 0, pad_to=256
    )
    l = plan.token_ids.shape[1]
    max_new = 64
    s_max = l + max_new
    batch = {
        "images": jax.random.normal(jax.random.PRNGKey(2), (1, 336, 336, 3), dtype),
        "token_ids": jnp.asarray(plan.token_ids),
        "is_image": jnp.asarray(plan.is_image),
        "image_slot": jnp.asarray(plan.image_slot),
        "lengths": jnp.asarray(plan.lengths, jnp.int32),
    }

    # TTFT: prefill incl. vision encode, median of 5 after warmup
    jax.block_until_ready(prefill(params, cfg, batch, s_max)[0])
    ttfts = []
    for _ in range(5):
        t0 = time.perf_counter()
        logits, cache = prefill(params, cfg, batch, s_max)
        jax.block_until_ready(logits)
        ttfts.append(time.perf_counter() - t0)
    ttft_ms = sorted(ttfts)[len(ttfts) // 2] * 1e3

    # decode: N steps chained in one jitted loop (tunnel-proof timing)
    lengths = batch["lengths"]

    @functools.partial(jax.jit, static_argnames=("n",))
    def decode_n(params, cache, tok, n):
        def body(i, carry):
            cache, tok = carry
            logits, cache = decode_step(params, cfg, cache, tok, lengths, i, l)
            return cache, jnp.argmax(logits, axis=-1).astype(jnp.int32)

        cache, tok = jax.lax.fori_loop(0, n, body, (cache, tok))
        return tok

    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    jax.block_until_ready(decode_n(params, cache, tok0, max_new))  # warm
    t0 = time.perf_counter()
    jax.block_until_ready(decode_n(params, cache, tok0, max_new))
    dt = time.perf_counter() - t0
    return {
        "ttft_p50_ms_7b": round(ttft_ms, 1),
        "decode_tokens_per_sec_7b": round(max_new / dt, 1),
    }


def bench_7b_speculative():
    """Prompt-lookup speculative decoding at full acceptance (rigged
    repeater weights, int8 — the configuration that fits beside the
    speculation buffers): the single-stream upper bound. See
    scripts/bench_speculative.py for the full sweep."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from bench_speculative import bench_spec
    from tokenpacker_tpu.config import TokenPackerVLMConfig
    from tokenpacker_tpu.models.vlm import init_vlm
    from tokenpacker_tpu.ops.quantize import fuse_llama_layers
    from tokenpacker_tpu.utils.bench_params import repeater_params_like

    cfg = TokenPackerVLMConfig()
    shapes = jax.eval_shape(lambda: init_vlm(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    # fused qkv/gateup layout so verify rounds ride the fused whole-stack
    # kernel (speculative._verify dispatch) like the load_8bit serving path
    shapes = {**shapes, "lm": jax.eval_shape(fuse_llama_layers, shapes["lm"])}
    params = repeater_params_like(shapes, seed=1, quant="int8")
    tps, produced, rounds = bench_spec(params, cfg, 64, 4)
    return {
        "decode_tokens_per_sec_7b_int8_speculative_k4_full_accept": round(tps, 1),
        "speculative_rounds_for_tokens": f"{int(rounds)}/{int(produced)}",
    }


def bench_7b_spec_realistic():
    """Realistic speculation economics, driver-captured (VERDICT r3 item 5):
    acceptance is replayed EXACTLY on the host from real token streams
    through the deployed propose/accept/backoff policy, and the per-round
    costs (t_plain, t_verify at k=4) are measured on-chip. Net speedup =
    produced·t_plain / (n_verify·t_verify + n_plain·t_plain). Full sweep +
    rationale: scripts/bench_spec_realistic.py / docs/serving.md."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from bench_spec_realistic import load_workloads, measure_costs_on_chip, simulate

    k = 4
    costs = measure_costs_on_chip((k,))
    tp, tv = costs["t_plain_ms"], costs[f"t_verify_ms_k{k}"]
    out = {
        "spec_t_plain_ms": round(tp, 2),
        "spec_t_verify_ms_k4": round(tv, 2),
    }
    for name, samples in load_workloads().items():
        agg = {"produced": 0, "n_verify": 0, "n_plain": 0, "accepted_drafts": 0}
        for stream, plen in samples:
            r = simulate(stream, plen, k)
            for key in agg:
                agg[key] += r[key]
        t_spec = agg["n_verify"] * tv + agg["n_plain"] * tp
        out[f"spec_realistic_speedup_{name}_k4"] = round(
            agg["produced"] * tp / t_spec, 2
        )
        out[f"spec_realistic_accept_per_verify_{name}_k4"] = round(
            agg["accepted_drafts"] / max(agg["n_verify"], 1), 2
        )
    return out


def bench_7b_hd_decode_s2048():
    """Decode at the HD serving shape (S=2048 cache, ~1800-token HD prompt
    in context), B=1, int8 weights + int8 KV through the fused kernel — the
    composition that flipped this shape from a wash to a win (measured
    2026-08-19: 75.2 tok/s vs 61.5 XLA int8-KV / 57.5 bf16). Needs the
    96 MB scoped-VMEM raise, now the _fd_compiler_options default."""
    import functools

    from tokenpacker_tpu.config import TokenPackerVLMConfig
    from tokenpacker_tpu.generate import _fd_compiler_options, decode_step_cb
    from tokenpacker_tpu.models.llama import KVCache

    cfg = TokenPackerVLMConfig()
    params = _int8_params_on_device(cfg, jnp.bfloat16)
    s_max, n_steps, b, fill = 2048, 64, 1, 1800

    @functools.partial(jax.jit, compiler_options=_fd_compiler_options())
    def loop(params, cache, toks, active, salt):
        toks = toks + salt * 0

        def body(i, carry):
            cache, toks = carry
            logits, cache = decode_step_cb(params, cfg, cache, toks, cache.length, active)
            return cache, jnp.argmax(logits, -1).astype(jnp.int32)

        cache, toks = jax.lax.fori_loop(0, n_steps, body, (cache, toks))
        return jnp.sum(toks)

    cache = KVCache.create(cfg.lm, b, s_max, dtype=jnp.int8)._replace(
        length=jnp.full((b,), fill, jnp.int32)
    )
    toks = jnp.ones((b,), jnp.int32)
    active = jnp.ones((b,), bool)
    float(loop(params, cache, toks, active, jnp.asarray(0)))
    t0 = time.perf_counter()
    float(loop(params, cache, toks, active, jnp.asarray(1)))
    dt = time.perf_counter() - t0
    return {"decode_tokens_per_sec_7b_int8kv_s2048_hd": round(n_steps * b / dt, 1)}


def _int8_params_on_device(cfg, dtype):
    """Random 7B params with the LM's big kernels directly int8 — no bf16
    intermediate (it wouldn't co-reside in HBM). Uses the fused qkv/gateup
    layout that api.load_pretrained_model(load_8bit=True) produces
    (measured perf-identical to unfused on the XLA decode path: 84.6 vs
    84.3 tok/s)."""
    from tokenpacker_tpu.models.vlm import init_vlm
    from tokenpacker_tpu.ops.quantize import fuse_llama_layers
    from tokenpacker_tpu.utils.bench_params import int8_params_like

    shapes = jax.eval_shape(lambda: init_vlm(jax.random.PRNGKey(0), cfg, dtype))
    shapes = {**shapes, "lm": jax.eval_shape(fuse_llama_layers, shapes["lm"])}
    params = int8_params_like(shapes)
    if os.environ.get("TOKENPACKER_FD_PACK") == "1":
        # u16-row-packed weight storage for the fused decode kernel's fast
        # DMA format (ops/quantize.pack_fused_weights; ROADMAP round-3)
        from tokenpacker_tpu.ops.quantize import pack_fused_weights

        # donate: the replaced int8 'q' buffers are freed as packing
        # consumes them — without it, int8 + packed copies coexist (~13 GB)
        params = {**params, "lm": jax.jit(pack_fused_weights, donate_argnums=0)(params["lm"])}
    return params


def bench_7b_int8_decode():
    """int8 weight-only decode (load_8bit serving path), single stream."""
    import functools

    from tokenpacker_tpu.config import TokenPackerVLMConfig
    from tokenpacker_tpu.generate import decode_step_cb
    from tokenpacker_tpu.models.llama import KVCache

    cfg = TokenPackerVLMConfig()
    dtype = jnp.bfloat16
    params = _int8_params_on_device(cfg, dtype)
    s_max, n_steps, b = 512, 64, 1
    cache = KVCache(
        jnp.zeros((cfg.lm.num_hidden_layers, b, s_max, cfg.lm.kv_heads, cfg.lm.head_dim), dtype),
        jnp.zeros((cfg.lm.num_hidden_layers, b, s_max, cfg.lm.kv_heads, cfg.lm.head_dim), dtype),
        jnp.full((b,), 100, jnp.int32),
    )

    from tokenpacker_tpu.generate import _fd_compiler_options

    @functools.partial(jax.jit, compiler_options=_fd_compiler_options())
    def loop(params, cache, toks, active, salt):
        toks = toks + salt * 0

        def body(i, carry):
            cache, toks = carry
            logits, cache = decode_step_cb(params, cfg, cache, toks, cache.length, active)
            return cache, jnp.argmax(logits, -1).astype(jnp.int32)

        cache, toks = jax.lax.fori_loop(0, n_steps, body, (cache, toks))
        return jnp.sum(toks)

    toks = jnp.ones((b,), jnp.int32)
    active = jnp.ones((b,), bool)
    float(loop(params, cache, toks, active, jnp.asarray(0)))
    t0 = time.perf_counter()
    float(loop(params, cache, toks, active, jnp.asarray(1)))
    dt = time.perf_counter() - t0
    out = {"decode_tokens_per_sec_7b_int8": round(n_steps / dt, 1)}

    _DETAILS.update(out)
    _flush()  # B=1 row survives even if the B=8 compile dies/overruns
    # aggregate serving throughput (8 slots, fused kernel default):
    # measured 416 vs 317 XLA on 2026-08-17 — only run if the compile
    # budget allows (the B=8 program can take minutes to compile remotely)
    if _budget_left():
        b8 = 8
        cache8 = KVCache(
            jnp.zeros((cfg.lm.num_hidden_layers, b8, s_max, cfg.lm.kv_heads, cfg.lm.head_dim), dtype),
            jnp.zeros((cfg.lm.num_hidden_layers, b8, s_max, cfg.lm.kv_heads, cfg.lm.head_dim), dtype),
            jnp.full((b8,), 100, jnp.int32),
        )
        toks8 = jnp.ones((b8,), jnp.int32)
        active8 = jnp.ones((b8,), bool)
        float(loop(params, cache8, toks8, active8, jnp.asarray(0)))
        t0 = time.perf_counter()
        float(loop(params, cache8, toks8, active8, jnp.asarray(1)))
        dt = time.perf_counter() - t0
        out["decode_agg_tokens_per_sec_7b_int8_b8"] = round(n_steps * b8 / dt, 1)
    return out


def bench_7b_int8kv_decode():
    """int8 weights + int8 KV cache COMPOSED through the fused decode kernel
    (round 4; VERDICT r3 item 2): int8 cache staging halves the attention
    DMA bytes and the kernel dequantizes in-VMEM via MXU-expanded scales.
    Measured 2026-08-19 (S=512): B=1 97.7 tok/s (vs 87.4 bf16-cache fused),
    B=8 459.5 agg tok/s (vs 416.2). Greedy token sums identical to the XLA
    int8-KV path (scripts/bench_fused_decode.py + check_fused_parity)."""
    import functools

    from tokenpacker_tpu.config import TokenPackerVLMConfig
    from tokenpacker_tpu.generate import _fd_compiler_options, decode_step_cb
    from tokenpacker_tpu.models.llama import KVCache

    cfg = TokenPackerVLMConfig()
    params = _int8_params_on_device(cfg, jnp.bfloat16)
    s_max, n_steps = 512, 64

    @functools.partial(jax.jit, compiler_options=_fd_compiler_options())
    def loop(params, cache, toks, active, salt):
        toks = toks + salt * 0

        def body(i, carry):
            cache, toks = carry
            logits, cache = decode_step_cb(params, cfg, cache, toks, cache.length, active)
            return cache, jnp.argmax(logits, -1).astype(jnp.int32)

        cache, toks = jax.lax.fori_loop(0, n_steps, body, (cache, toks))
        return jnp.sum(toks)

    out = {}
    for b, key in ((1, "decode_tokens_per_sec_7b_int8kv"),
                   (8, "decode_agg_tokens_per_sec_7b_int8kv_b8")):
        if b > 1 and not _budget_left():
            break
        cache = KVCache.create(cfg.lm, b, s_max, dtype=jnp.int8)._replace(
            length=jnp.full((b,), 100, jnp.int32)
        )
        toks = jnp.ones((b,), jnp.int32)
        active = jnp.ones((b,), bool)
        float(loop(params, cache, toks, active, jnp.asarray(0)))
        t0 = time.perf_counter()
        float(loop(params, cache, toks, active, jnp.asarray(1)))
        dt = time.perf_counter() - t0
        out[key] = round(n_steps * b / dt, 1)
        _DETAILS.update(out)
        _flush()
    return out


def bench_7b_int8kv_bigbatch():
    """Max single-chip aggregate serving throughput: the fused int8-KV
    decode at B=16/32 (S=512). Measured 2026-08-19: B=16 692.2 agg tok/s
    (23.11 ms/step; XLA int8-KV 412.8 → 1.68x, identical greedy token
    sums) and B=32 866.7 (36.92 ms/step) — XLA OOMs at B=32, so
    fused+donated-cache is the ONLY single-chip path there. Reuses
    scripts/bench_fused_decode.bench verbatim so the persistent compile
    cache covers the ~1000 s kernel compiles; runs LAST under the budget
    gate."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_fused_decode",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "scripts", "bench_fused_decode.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    prev = os.environ.get("TOKENPACKER_KV_CACHE")
    os.environ["TOKENPACKER_KV_CACHE"] = "int8"
    out = {}
    try:
        for b, key in ((16, "decode_agg_tokens_per_sec_7b_int8kv_b16"),
                       (32, "decode_agg_tokens_per_sec_7b_int8kv_b32")):
            tps, _ms = mod.bench(b)
            out[key] = round(tps, 1)
            _DETAILS.update(out)
            _flush()
            if not _budget_left():
                break
    finally:
        if prev is None:
            os.environ.pop("TOKENPACKER_KV_CACHE", None)
        else:
            os.environ["TOKENPACKER_KV_CACHE"] = prev
    return out


def bench_7b_int4_decode():
    """int4 weight-only decode (load_4bit serving path, Pallas
    dequant-in-kernel GEMV, fused qkv/gateup), single stream."""
    import functools

    from tokenpacker_tpu.config import TokenPackerVLMConfig
    from tokenpacker_tpu.generate import decode_step_cb
    from tokenpacker_tpu.models.llama import KVCache
    from tokenpacker_tpu.models.vlm import init_vlm
    from tokenpacker_tpu.utils.bench_params import q4_params_like

    cfg = TokenPackerVLMConfig()
    dtype = jnp.bfloat16
    lm = cfg.lm
    L = lm.num_hidden_layers
    shapes = jax.eval_shape(lambda: init_vlm(jax.random.PRNGKey(0), cfg, dtype))
    params = q4_params_like(shapes, lm, quant_type="int4", fused=True)

    s_max, n_steps, b = 512, 64, 1
    cache = KVCache(
        jnp.zeros((L, b, s_max, lm.kv_heads, lm.head_dim), dtype),
        jnp.zeros((L, b, s_max, lm.kv_heads, lm.head_dim), dtype),
        jnp.full((b,), 100, jnp.int32),
    )

    # NO scoped-vmem raise on 4-bit trees (mirrors generate._fd_jit's
    # _params_can_fuse gate): the raise costs the q4 GEMV kernel 15% —
    # measured 44.1 tok/s at the 16 MB default vs 37.5/37.7 under 96 MB
    # (the VERDICT r4 #4 discrepancy's root cause, 2026-08-19)
    @jax.jit
    def loop(params, cache, toks, active, salt):
        toks = toks + salt * 0

        def body(i, carry):
            cache, toks = carry
            logits, cache = decode_step_cb(params, cfg, cache, toks, cache.length, active)
            return cache, jnp.argmax(logits, -1).astype(jnp.int32)

        cache, toks = jax.lax.fori_loop(0, n_steps, body, (cache, toks))
        return jnp.sum(toks)

    toks = jnp.ones((b,), jnp.int32)
    active = jnp.ones((b,), bool)
    float(loop(params, cache, toks, active, jnp.asarray(0)))
    t0 = time.perf_counter()
    float(loop(params, cache, toks, active, jnp.asarray(1)))
    dt = time.perf_counter() - t0
    return {"decode_tokens_per_sec_7b_int4": round(n_steps / dt, 1)}


if __name__ == "__main__":
    main()
