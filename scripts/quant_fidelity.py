"""Numeric-fidelity bounds for every quantized serving path vs bf16
(VERDICT r4 #8): greedy-divergence step, per-step logit KL, and max-abs
logit error, measured on ONE shared random-weight base at full 7B geometry.

Accuracy against the released checkpoints stays environment-blocked (no
network — scripts/eval_runway.py is the protocol for when weights land).
This rig bounds the NUMERIC side on the serving dispatches themselves:
each quantized tree is the real ops/quantize transform of the exact same
dense values (utils/bench_params.transformed_params_like regenerates the
base from the seed inside one jitted program, so dense + quantized never
co-reside in HBM), decoded through the same generate.decode_step_cb
dispatch the batchers run (int8 rides the fused kernel, 4-bit the Pallas
dequant GEMV — the fidelity number covers quantization AND kernel
numerics together, which is what serving actually sees).

CAVEAT (stated wherever these numbers land): random trunc-normal weights
have no outlier channels, and real LLM weight/activation outliers are
exactly what breaks naive per-channel quantization — these bounds are
necessary, not sufficient. The greedy chain's divergence step is also a
weak statistic on random weights (near-uniform logits tie-break easily).

Protocol per config:
- teacher-forced: feed the prompt + the BF16 model's 64 greedy tokens,
  collect logits at every step → KL(bf16 || q) and max|Δlogit| on the 64
  eval steps (identical context for both models — pure numerics).
- free-run: greedy-decode 64 tokens from the same prompt → first step
  where the token stream leaves the bf16 stream.

Usage: python scripts/quant_fidelity.py [config ...]
       (default: bf16 int8 int8kv int4 nf4 w8a8)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N_CTX = 31  # prompt tokens fed before evaluation starts
N_EVAL = 64  # evaluated steps (teacher-forced and free-run)
S_MAX = 128  # 32-aligned (int8 KV tile) and > N_CTX + N_EVAL


def _build(config: str):
    """Materialize the config's params (+ cache dtype) from the SHARED
    seed-5 dense base. Returns (params, kv_dtype, env overrides)."""
    from tokenpacker_tpu.config import TokenPackerVLMConfig, tiny_vlm_config
    from tokenpacker_tpu.models.llama import init_llama
    from tokenpacker_tpu.ops.quantize import (
        fuse_llama_layers,
        quantize_tree,
        quantize_tree_4bit,
    )
    from tokenpacker_tpu.utils.bench_params import transformed_params_like

    # GEOM=tiny: CPU smoke of the whole protocol (kernel dispatches differ
    # there — the recorded numbers come from the 7B on-chip run). min_size
    # drops to 1 so the tiny kernels actually quantize.
    tiny = os.environ.get("GEOM") == "tiny"
    cfg = tiny_vlm_config() if tiny else TokenPackerVLMConfig()
    min_size = 1 if tiny else 1 << 16
    shapes = {"lm": jax.eval_shape(
        lambda: init_llama(jax.random.PRNGKey(0), cfg.lm, jnp.bfloat16)
    )}

    def with_lm(f):
        return lambda p: {"lm": f(p["lm"])}

    transforms = {
        "bf16": None,
        "int8": with_lm(lambda lm: quantize_tree(
            fuse_llama_layers(lm), min_size=min_size)),
        "int8kv": with_lm(lambda lm: quantize_tree(
            fuse_llama_layers(lm), min_size=min_size)),
        "w8a8": with_lm(lambda lm: quantize_tree(
            fuse_llama_layers(lm), min_size=min_size)),
        "int4": with_lm(lambda lm: quantize_tree_4bit(
            fuse_llama_layers(lm), quant_type="int4", min_size=min_size)),
        "nf4": with_lm(lambda lm: quantize_tree_4bit(
            fuse_llama_layers(lm), quant_type="nf4", min_size=min_size)),
    }
    kv_dtype = jnp.int8 if config == "int8kv" else jnp.bfloat16
    env = {"TOKENPACKER_FD_W8A8": "1"} if config == "w8a8" else {}
    params = transformed_params_like(shapes, seed=5, transform=transforms[config])
    return cfg, params, kv_dtype, env


def _measure(config: str, teacher: np.ndarray | None):
    """Returns (free_tokens [N_EVAL], forced_logits [N_EVAL, V], tok0).

    teacher: the bf16 chain's FED tokens for the eval window (its
    post-prompt argmax followed by its first N_EVAL-1 outputs) — feeding
    them reproduces bf16's exact contexts, so per-step logits compare
    pure numerics."""
    from tokenpacker_tpu.generate import _fd_compiler_options, decode_step_cb
    from tokenpacker_tpu.models.llama import KVCache

    cfg, params, kv_dtype, env = _build(config)
    old_env = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    if env:
        jax.clear_caches()  # env gates are read at trace time (_fd_jit)
    try:
        prompt = (np.arange(N_CTX) * 37 % cfg.lm.vocab_size).astype(np.int32)
        active = jnp.ones((1,), bool)

        def fresh():
            return KVCache.create(cfg.lm, 1, S_MAX, dtype=kv_dtype)._replace(
                length=jnp.zeros((1,), jnp.int32)
            )

        @functools.partial(jax.jit, compiler_options=_fd_compiler_options())
        def run(params, cache, forced_tokens):
            """Feed the prompt, then N_EVAL steps: step i consumes
            forced_tokens[i] when it is >= 0 (teacher forcing), else the
            previous argmax (free-run). Collects eval-step logits."""
            def feed(i, carry):
                cache, _ = carry
                logits, cache = decode_step_cb(
                    params, cfg, cache, jnp.asarray(prompt)[i][None],
                    cache.length, active,
                )
                return cache, jnp.argmax(logits, -1).astype(jnp.int32)

            cache, tok = jax.lax.fori_loop(0, N_CTX, feed, (cache, jnp.zeros((1,), jnp.int32)))
            logits_buf = jnp.zeros((N_EVAL, cfg.lm.vocab_size), jnp.float32)
            toks_buf = jnp.zeros((N_EVAL,), jnp.int32)

            def step(i, carry):
                cache, tok, logits_buf, toks_buf = carry
                fed = jnp.where(forced_tokens[i] >= 0, forced_tokens[i], tok[0])
                logits, cache = decode_step_cb(
                    params, cfg, cache, fed[None], cache.length, active
                )
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                logits_buf = logits_buf.at[i].set(logits[0].astype(jnp.float32))
                toks_buf = toks_buf.at[i].set(nxt[0])
                return cache, nxt, logits_buf, toks_buf

            _, _, logits_buf, toks_buf = jax.lax.fori_loop(
                0, N_EVAL, step, (cache, tok, logits_buf, toks_buf)
            )
            return toks_buf, logits_buf, tok[0]

        free_feed = jnp.full((N_EVAL,), -1, jnp.int32)
        t0 = time.perf_counter()
        free_toks, free_logits, tok0 = jax.device_get(run(params, fresh(), free_feed))
        print(f"  [{config}] free-run done in {time.perf_counter()-t0:.0f}s",
              flush=True)
        if teacher is None:
            forced_logits = free_logits  # bf16: forced(context)==free-run
        else:
            _, forced_logits, _ = jax.device_get(
                run(params, fresh(), jnp.asarray(teacher, jnp.int32))
            )
        return np.asarray(free_toks), np.asarray(forced_logits), int(tok0)
    finally:
        for k, v in old_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        if env:
            jax.clear_caches()


def _kl(p_logits: np.ndarray, q_logits: np.ndarray) -> np.ndarray:
    """KL(softmax(p) || softmax(q)) per step, f64 on host."""
    def logsoftmax(x):
        x = x.astype(np.float64)
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    lp, lq = logsoftmax(p_logits), logsoftmax(q_logits)
    return (np.exp(lp) * (lp - lq)).sum(-1)


def main():
    from tokenpacker_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    configs = sys.argv[1:] or ["bf16", "int8", "int8kv", "int4", "nf4", "w8a8"]
    if "bf16" in configs:
        configs.remove("bf16")
    print(f"backend={jax.default_backend()} fused="
          f"{os.environ.get('TOKENPACKER_FUSED_DECODE', '1')}", flush=True)

    print("[bf16] reference chain...", flush=True)
    bf_toks, bf_logits, bf_tok0 = _measure("bf16", None)
    # the tokens bf16 FED at each eval step: post-prompt argmax, then its
    # own outputs shifted by one
    teacher = np.concatenate([[bf_tok0], bf_toks[:-1]]).astype(np.int32)
    results = {}
    for config in configs:
        print(f"[{config}]", flush=True)
        free_toks, forced_logits, _ = _measure(config, teacher=teacher)
        # teacher-forced feeds bf16's PREVIOUS outputs: step i of the eval
        # window consumed bf_toks chain exactly like bf16's own free-run,
        # so logits are position-aligned with bf_logits
        kl = _kl(bf_logits, forced_logits)
        max_abs = np.abs(bf_logits - forced_logits).max(-1)
        div = np.nonzero(free_toks != bf_toks)[0]
        results[config] = {
            "greedy_divergence_step": int(div[0]) if len(div) else None,
            "kl_median": float(np.median(kl)),
            "kl_max": float(kl.max()),
            "logit_max_abs_median": float(np.median(max_abs)),
            "logit_max_abs_max": float(max_abs.max()),
        }
        print(f"  {json.dumps(results[config])}", flush=True)
    print(json.dumps({"quant_fidelity": results}, indent=1))
    return results


if __name__ == "__main__":
    main()
