"""LLaMA/Vicuna decoder-only LM in pure JAX (GQA-ready).

Replaces the reference's HF `LlamaForCausalLM` + flash-attn monkey patch
(`llava/model/language_model/llava_llama.py`,
`llava/train/llama_flash_attn_monkey_patch.py`) with a functional, scan-over-
layers implementation designed for XLA:

- parameters are plain pytrees with layers stacked on a leading axis so the
  whole decoder compiles as one `lax.scan` (flat compile time, fusion-friendly)
- RoPE computed in fp32 with the HF rotate-half convention
- attention takes an additive bias built once per call (causal + padding),
  runs via einsum (XLA→MXU, fused softmax); a Pallas flash-attention kernel
  (ops/flash_attention.py) is used on TPU for long sequences
- KV cache is a preallocated [L, N, S_max, kv_heads, head_dim] buffer updated
  with dynamic_update_slice — static shapes for jit-compiled decode
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import LMConfig
from tokenpacker_tpu.ops.layers import init_rms_norm, linear, rms_norm


class KVCache(NamedTuple):
    k: jax.Array  # [L, N, S_max, kv_heads, head_dim] (bf16, or int8 quantized)
    v: jax.Array
    length: jax.Array  # scalar int32: number of valid positions
    # per-(position, kv-head) absmax scales when k/v are int8 (ops/kv_quant):
    # [L, N, S_max, kv_heads] f32; None for float caches
    k_scale: jax.Array | None = None
    v_scale: jax.Array | None = None

    @classmethod
    def create(cls, cfg: LMConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
        shape = (cfg.num_hidden_layers, batch, max_len, cfg.kv_heads, cfg.head_dim)
        scales = (None, None)
        if dtype == jnp.int8:
            scales = tuple(jnp.zeros(shape[:-1], jnp.float32) for _ in range(2))
        return cls(
            jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
            jnp.zeros((), jnp.int32), *scales,
        )


def kv_cache_dtype(default=jnp.bfloat16, family: str = "llama"):
    """Process-level KV cache storage dtype.

    TOKENPACKER_KV_CACHE=int8 stores K/V as int8 with per-(position, head)
    absmax scales (ops/kv_quant) — halves the cache's HBM footprint and
    per-step read traffic vs bf16 (beyond-reference; the reference's HF
    decode keeps fp16 caches). Anything else → `default` (the model dtype).
    llama-family only: MPT's attention (models/mpt.py) keeps float caches.
    """
    import os

    v = os.environ.get("TOKENPACKER_KV_CACHE", "")
    if v in ("int8", "i8") and family != "mpt":
        return jnp.int8
    return default


def init_llama(key, cfg: LMConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 4 + cfg.num_hidden_layers * 7))
    d, kvd = cfg.hidden_size, cfg.kv_heads * cfg.head_dim

    def lin(i, o):
        w = 0.02 * jax.random.normal(next(keys), (i, o))
        return {"kernel": w.astype(dtype)}

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append(
            {
                "input_ln": init_rms_norm(d, dtype),
                "attn": {"q": lin(d, d), "k": lin(d, kvd), "v": lin(d, kvd), "o": lin(d, d)},
                "post_ln": init_rms_norm(d, dtype),
                "mlp": {
                    "gate": lin(d, cfg.intermediate_size),
                    "up": lin(d, cfg.intermediate_size),
                    "down": lin(cfg.intermediate_size, d),
                },
            }
        )
    params = {
        "embed": 0.02 * jax.random.normal(next(keys), (cfg.vocab_size, d)).astype(dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "norm": init_rms_norm(d, dtype),
        "lm_head": lin(d, cfg.vocab_size),
    }
    return params


def rope_cos_sin(positions, head_dim: int, theta: float):
    """positions: [N, T] → (cos, sin) each [N, T, head_dim], fp32, HF layout
    (inv_freq tiled twice along the feature axis)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [N, T, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x, cos, sin):
    """x: [N, T, H, hd]; cos/sin: [N, T, hd] (broadcast over heads)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    return x * c + rotated * s


def _sdpa(q, k, v, bias):
    """q: [N, T, H, d]; k/v: [N, S, Hkv, d]; bias: [N, 1, T, S] additive fp32.

    Grouped-query attention: repeats kv heads to match q heads.
    """
    n, t, h, d = q.shape
    hkv = k.shape[2]
    if hkv != h:
        rep = h // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    logits = jnp.einsum("nqhd,nkhd->nhqk", q, k) * (d**-0.5)
    logits = logits.astype(jnp.float32) + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("nhqk,nkhd->nqhd", probs, v)


def qkv_proj(p_attn, cfg: LMConfig, h):
    """Project h [N, T, D] → (q, k, v) heads, handling both the unfused
    q/k/v layout and the fused `qkv` layout emitted by
    quantize.fuse_llama_layers (used by load_8bit / 4-bit paths)."""
    n, t, _ = h.shape
    if "qkv" in p_attn:
        d_q = cfg.num_attention_heads * cfg.head_dim
        d_kv = cfg.kv_heads * cfg.head_dim
        qkv = linear(p_attn["qkv"], h)
        q = qkv[..., :d_q].reshape(n, t, cfg.num_attention_heads, cfg.head_dim)
        k = qkv[..., d_q : d_q + d_kv].reshape(n, t, cfg.kv_heads, cfg.head_dim)
        v = qkv[..., d_q + d_kv :].reshape(n, t, cfg.kv_heads, cfg.head_dim)
    else:
        q = linear(p_attn["q"], h).reshape(n, t, cfg.num_attention_heads, cfg.head_dim)
        k = linear(p_attn["k"], h).reshape(n, t, cfg.kv_heads, cfg.head_dim)
        v = linear(p_attn["v"], h).reshape(n, t, cfg.kv_heads, cfg.head_dim)
    return q, k, v


def mlp_block(p_mlp, cfg: LMConfig, h):
    """SwiGLU MLP, handling both gate/up and the fused `gateup` layout."""
    if "gateup" in p_mlp:
        gu = linear(p_mlp["gateup"], h)
        gate, up = gu[..., : cfg.intermediate_size], gu[..., cfg.intermediate_size :]
        return linear(p_mlp["down"], jax.nn.silu(gate) * up)
    return linear(
        p_mlp["down"], jax.nn.silu(linear(p_mlp["gate"], h)) * linear(p_mlp["up"], h)
    )


def _remat_mode() -> str:
    """TOKENPACKER_REMAT wraps each decoder layer in jax.checkpoint on the
    cache-less (training) path — required for full-depth 7B backward on one
    chip (also exposed as train.py --remat [POLICY]).

    Modes: "" (off) | "1"/"full" (recompute everything — O(1)-in-depth
    activation memory, ~1/3 extra FLOPs) | "dots" (save projection-GEMM
    outputs, recompute only elementwise ops — backward skips the re-fwd
    GEMMs at ~(5D+2F)*B*T bf16 per layer of saved activations; for runs
    where HBM, not FLOPs, has headroom) | "dots:K" (hybrid, VERDICT r4 #7:
    dots-saveable on the LAST K layers only, full remat on the rest —
    spends whatever HBM slack full-depth training has on skipping K
    layers' re-forward GEMMs; 'dots' alone OOMs at depth 32/T=2048)."""
    import os

    v = os.environ.get("TOKENPACKER_REMAT", "0")
    return "" if v in ("0", "off", "") else v


def _use_remat() -> bool:
    return bool(_remat_mode())


def _use_flash_prefill(t: int) -> bool:
    """Flash kernel pays off for long self-attention spans on TPU; decode
    (t==1) and short prompts stay on the fused-einsum path."""
    return jax.default_backend() == "tpu" and t >= 512


def _flash_causal(q, k, v):
    from tokenpacker_tpu.ops.flash_attention import mha_flash

    interpret = jax.default_backend() != "tpu"
    return mha_flash(q, k, v, causal=True, interpret=interpret)


def _use_decode_kernel() -> bool:
    """Opt-in (TOKENPACKER_DECODE_ATTN=pallas). Measured on v5e: the kernel
    alone is 1.7x the XLA decode attention (190us vs 326us, B=8 S=1024 at
    44% fill — length-prefetch skips unneeded KV blocks and the [N,1,1,S]
    fp32 bias is never built), but integrated over 32 layers the ~55us
    per-pallas_call dispatch makes it a wash at single-chip serving shapes
    (int8 B=8 S=512: 304 vs 311 agg tok/s). Default stays XLA until larger
    caches/batches are the serving norm; see ROADMAP.md."""
    import os

    return os.environ.get("TOKENPACKER_DECODE_ATTN") == "pallas"


def _layer(p, cfg: LMConfig, x, cos, sin, bias, layer_cache, cache_len, use_flash=None,
           decode_info=None):
    """One decoder block. layer_cache: (k, v) or (k, v, k_scale, v_scale)
    [N, S_max, Hkv, d] (+ [N, S_max, Hkv] f32 scales for int8 caches), or None.

    use_flash: when True (or auto on TPU for long spans), prefill/training
    attention runs the Pallas flash kernel with a pure causal mask — exact
    for right-padded batches because pad positions are never attended by
    valid queries and their own outputs are discarded by the loss/length
    masking. Decode and custom-bias paths use the einsum SDPA.
    """
    h = rms_norm(p["input_ln"], x, cfg.rms_norm_eps)
    n, t, _ = h.shape
    # fused-qkv layouts (quantize.fuse_llama_layers) halve Pallas dispatches
    # on the quantized decode path (~55us/call floor)
    q, k, v = qkv_proj(p["attn"], cfg, h)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    flash_ok = use_flash if use_flash is not None else _use_flash_prefill(t)

    if layer_cache is not None:
        ck, cv, ks, vs = (
            layer_cache if len(layer_cache) == 4 else (*layer_cache, None, None)
        )
        int8_cache = ck.dtype == jnp.int8
        if int8_cache:
            from tokenpacker_tpu.ops.kv_quant import quantize_kv

            k_st, k_sc = quantize_kv(k)  # [N, T, Hkv, d] int8, [N, T, Hkv] f32
            v_st, v_sc = quantize_kv(v)
        else:
            k_st, v_st = k.astype(ck.dtype), v.astype(cv.dtype)
            k_sc = v_sc = None
        if jnp.ndim(cache_len) == 1:
            # per-sample write positions (continuous batching: each slot's
            # sequence is contiguous and advances independently); T>1 is the
            # speculative verify step (k+1 tokens per slot per forward)
            if t == 1:
                rows = jnp.arange(n)
                ck = ck.at[rows, cache_len].set(k_st[:, 0])
                cv = cv.at[rows, cache_len].set(v_st[:, 0])
                if int8_cache:
                    ks = ks.at[rows, cache_len].set(k_sc[:, 0])
                    vs = vs.at[rows, cache_len].set(v_sc[:, 0])
            else:
                rows = jnp.arange(n)[:, None]
                cols = cache_len[:, None] + jnp.arange(t)[None, :]
                ck = ck.at[rows, cols].set(k_st)
                cv = cv.at[rows, cols].set(v_st)
                if int8_cache:
                    ks = ks.at[rows, cols].set(k_sc)
                    vs = vs.at[rows, cols].set(v_sc)
        else:
            ck = jax.lax.dynamic_update_slice(ck, k_st, (0, cache_len, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v_st, (0, cache_len, 0, 0))
            if int8_cache:
                ks = jax.lax.dynamic_update_slice(ks, k_sc, (0, cache_len, 0))
                vs = jax.lax.dynamic_update_slice(vs, v_sc, (0, cache_len, 0))
        if flash_ok and t > 1:
            # prefill: the causal span only covers the current tokens
            attn_out = _flash_causal(q, k, v)
        elif (t == 1 and decode_info is not None and _use_decode_kernel()
              and not int8_cache and ck.shape[1] % 8 == 0):
            # Pallas decode attention: per-sample lengths ride scalar
            # prefetch, KV blocks past a sequence's length are never DMA'd,
            # and the [N,1,1,S] fp32 bias is never materialized
            from tokenpacker_tpu.ops.decode_attention import decode_attention

            lengths, needed, span = decode_info
            attn_out = decode_attention(
                q[:, 0], ck, cv, lengths, needed,
                groups=cfg.num_attention_heads // cfg.kv_heads,
                span_start=span,
                interpret=jax.default_backend() != "tpu",
            )[:, None]
        else:
            if int8_cache:
                from tokenpacker_tpu.ops.kv_quant import dequantize_kv

                kf = dequantize_kv(ck, ks, q.dtype)
                vf = dequantize_kv(cv, vs, q.dtype)
            else:
                kf, vf = ck.astype(q.dtype), cv.astype(q.dtype)
            attn_out = _sdpa(q, kf, vf, bias)
        new_cache = (ck, cv, ks, vs) if int8_cache else (ck, cv)
    else:
        if flash_ok:
            attn_out = _flash_causal(q, k, v)
        else:
            attn_out = _sdpa(q, k, v, bias)
        new_cache = None

    attn_out = linear(p["attn"]["o"], attn_out.reshape(n, t, -1))
    x = x + attn_out
    h = rms_norm(p["post_ln"], x, cfg.rms_norm_eps)
    h = mlp_block(p["mlp"], cfg, h)
    return x + h, new_cache


def make_attention_bias(positions, key_valid, cache_len, s_total):
    """Additive fp32 bias [N, 1, T, S].

    positions: [N, T] query positions; key_valid: [N, S] validity of key slots
    (padding mask over the full cache/sequence). Causality: key slot j is
    visible to query at position p iff j's position <= p. With a cache the
    key positions are simply the slot indices 0..S-1 offset is already
    included in `positions`.
    """
    n, t = positions.shape
    key_pos = jnp.arange(s_total)[None, :]  # [1, S]
    causal = key_pos[:, None, :] <= positions[..., None]  # [N, T, S]
    ok = causal & key_valid[:, None, :]
    return jnp.where(ok[:, None], 0.0, jnp.finfo(jnp.float32).min).astype(jnp.float32)


def llama_apply(
    params,
    cfg: LMConfig,
    inputs_embeds,  # [N, T, D]
    positions,  # [N, T]
    attn_bias,  # [N, 1, T, S] additive fp32
    cache: KVCache | None = None,
    use_flash: bool | None = None,  # None = auto (TPU & long span)
    decode_info=None,  # (lengths [N], needed [N], span_start) for t==1
):
    """Run the decoder stack. Returns (hidden [N,T,D], new_cache)."""
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    x = inputs_embeds
    cache_len = cache.length if cache is not None else jnp.zeros((), jnp.int32)

    if cache is None:

        def step(carry, layer_params):
            y, _ = _layer(
                layer_params, cfg, carry, cos, sin, attn_bias, None, cache_len, use_flash
            )
            return y, None

        mode = _remat_mode()
        if mode == "dots":
            # save projection-GEMM outputs, recompute elementwise work: the
            # backward skips the per-layer re-forward GEMMs (vs full remat's
            # ~1/3 extra FLOPs) at ~(5D+2F)*B*T bf16 per layer of saved
            # activations. no_batch_dims excludes the [B,H,T,S] attention
            # score/context dots (batched dot_generals) — saving those
            # costs O(T^2) memory per layer and OOMs at depth
            step = jax.checkpoint(
                step,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
            x, _ = jax.lax.scan(step, x, params["layers"])
        elif mode.startswith("dots:"):
            # hybrid (VERDICT r4 #7): full remat on the first L-K layers,
            # dots-saveable on the last K — which layers get the policy is
            # memory-equivalent (the saved bytes are uniform per layer), so
            # the split stays contiguous to keep two scans, not L wrappers
            k = int(mode.split(":", 1)[1])
            layers = params["layers"]
            n_layers = jax.tree.leaves(layers)[0].shape[0]
            k = max(0, min(k, n_layers))
            step_full = jax.checkpoint(step)
            step_dots = jax.checkpoint(
                step,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
            if n_layers - k:
                x, _ = jax.lax.scan(
                    step_full, x, jax.tree.map(lambda a: a[: n_layers - k], layers)
                )
            if k:
                x, _ = jax.lax.scan(
                    step_dots, x, jax.tree.map(lambda a: a[n_layers - k :], layers)
                )
        elif mode:
            # per-layer rematerialization: the backward recomputes each
            # layer's activations instead of storing them — trades ~1/3 more
            # FLOPs for O(1)-in-depth activation memory, which is what lets
            # a full-depth 7B backward fit/compile on one chip
            step = jax.checkpoint(step)
            x, _ = jax.lax.scan(step, x, params["layers"])
        else:
            x, _ = jax.lax.scan(step, x, params["layers"])
        new_cache = None
    else:

        int8_cache = cache.k.dtype == jnp.int8

        def step(carry, xs):
            layer_params, *layer_cache = xs
            y, new_lc = _layer(
                layer_params, cfg, carry, cos, sin, attn_bias, tuple(layer_cache),
                cache_len, use_flash, decode_info,
            )
            return y, new_lc

        xs = (params["layers"], cache.k, cache.v)
        if int8_cache:
            xs += (cache.k_scale, cache.v_scale)
        x, out = jax.lax.scan(step, x, xs)
        new_len = cache.length + inputs_embeds.shape[1]
        if int8_cache:
            nk, nv, nks, nvs = out
            new_cache = KVCache(nk, nv, new_len, nks, nvs)
        else:
            nk, nv = out
            new_cache = KVCache(nk, nv, new_len)

    x = rms_norm(params["norm"], x, cfg.rms_norm_eps)
    return x, new_cache


def llama_logits(params, hidden):
    return linear(params["lm_head"], hidden)


def embed_tokens(params, input_ids):
    """Token embedding lookup; negative ids (e.g. IMAGE_TOKEN_INDEX) clamp to 0
    — callers overwrite those positions with projector output before use."""
    safe = jnp.clip(input_ids, 0, params["embed"].shape[0] - 1)
    return params["embed"][safe]
