"""MPT decoder family in JAX (ALiBi attention, no positional embeddings).

TPU-native replacement for the reference's vendored MosaicML MPT
(llava/model/language_model/mpt/, ~2k LoC: modeling_mpt.py:33-330,
attention.py ALiBi + torch/flash/triton variants, blocks.py, norm.py):

- pre-LN blocks: LN → packed-QKV attention (+ ALiBi bias) → residual →
  LN → MLP(up, GELU, down) → residual; `no_bias=True` (MPT-7B default)
- ALiBi additive bias built from key positions only (shift-invariant under
  causal softmax; matches mpt/attention.py build_alibi_bias semantics with
  alibi_bias_max=8, incl. the non-power-of-two head interleave)
- weight-tied logits: h @ wte.T (reference llava_mpt.py:79)
- one attention implementation: the same einsum/flash path as LLaMA — the
  reference's torch/flash/triton backend switch collapses to XLA/Pallas.

Layers are stacked and scanned like llama.py; KVCache is shared.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import LMConfig
from tokenpacker_tpu.models.llama import KVCache, _sdpa, _use_decode_kernel
from tokenpacker_tpu.ops.layers import init_layer_norm, layer_norm, linear


def mpt_config(
    d_model=4096, n_heads=32, n_layers=32, expansion_ratio=4, vocab_size=50432,
    max_seq_len=2048,
) -> LMConfig:
    return LMConfig(
        vocab_size=vocab_size,
        hidden_size=d_model,
        intermediate_size=expansion_ratio * d_model,
        num_hidden_layers=n_layers,
        num_attention_heads=n_heads,
        max_position_embeddings=max_seq_len,
        model_family="mpt",
        alibi=True,
        no_bias=True,
        tie_word_embeddings=True,
        bos_token_id=0,
        eos_token_id=0,
        pad_token_id=0,
    )


def alibi_slopes(n_heads: int, alibi_bias_max: float = 8.0) -> jnp.ndarray:
    """[H] slopes (mpt/attention.py gen_slopes): powers of 2 up to
    2^ceil(log2 H), interleaved when H is not a power of two."""
    n2 = 2 ** math.ceil(math.log2(n_heads))
    m = jnp.arange(1, n2 + 1, dtype=jnp.float32) * (alibi_bias_max / n2)
    slopes = 1.0 / jnp.power(2.0, m)
    if n2 != n_heads:
        slopes = jnp.concatenate([slopes[1::2], slopes[::2]])[:n_heads]
    return slopes


def alibi_bias(n_heads: int, s_total: int, dtype=jnp.float32) -> jnp.ndarray:
    """[1, H, 1, S] key-position bias: slope * (j - S + 1). Row-constant
    shifts cancel in softmax, so this equals the full |i-j| form under
    causal masking (mpt/attention.py build_alibi_bias, full=False)."""
    pos = jnp.arange(1 - s_total, 1, dtype=jnp.float32)  # [-S+1 .. 0]
    bias = alibi_slopes(n_heads)[None, :, None, None] * pos[None, None, None, :]
    return bias.astype(dtype)


def alibi_bias_from_positions(n_heads: int, key_positions, dtype=jnp.float32):
    """[N, H, 1, S] per-sample ALiBi bias from TRUE token positions:
    slope * key_pos. Row-constant shifts cancel under softmax, so this equals
    the |i-j| form — and stays correct when a key's cache slot differs from
    its token position (bucket-padded decode writes at prefill_len+step while
    the token's position is lengths+step)."""
    return (
        alibi_slopes(n_heads)[None, :, None, None]
        * key_positions.astype(jnp.float32)[:, None, None, :]
    ).astype(dtype)


def make_prefix_lm_bias(positions, key_valid, prefix_lengths, s_total):
    """Prefix-LM attention bias: bidirectional within the prefix, causal
    after (the reference converts GPT/Bloom/OPT models to prefix-LM via
    monkey patches, mpt/hf_prefixlm_converter.py:29-401 — here it is just a
    different additive mask over the same decoder).

    positions: [N, T] query positions; key_valid: [N, S]; prefix_lengths:
    [N] per-sample bidirectional-prefix length. Returns [N, 1, T, S] fp32.
    """
    key_pos = jnp.arange(s_total)[None, :]
    causal = key_pos[:, None, :] <= positions[..., None]  # [N, T, S]
    in_prefix = key_pos[:, None, :] < prefix_lengths[:, None, None]
    ok = (causal | in_prefix) & key_valid[:, None, :]
    return jnp.where(ok[:, None], 0.0, jnp.finfo(jnp.float32).min).astype(jnp.float32)


def init_mpt(key, cfg: LMConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 2 + cfg.num_hidden_layers * 4))
    d = cfg.hidden_size

    def lin(i, o):
        return {"kernel": (0.02 * jax.random.normal(next(keys), (i, o))).astype(dtype)}

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append(
            {
                "norm_1": init_layer_norm(d, dtype),
                "attn": {"wqkv": lin(d, 3 * d), "out": lin(d, d)},
                "norm_2": init_layer_norm(d, dtype),
                "ffn": {"up": lin(d, cfg.intermediate_size), "down": lin(cfg.intermediate_size, d)},
            }
        )
    params = {
        "wte": (0.02 * jax.random.normal(next(keys), (cfg.vocab_size, d))).astype(dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "norm_f": init_layer_norm(d, dtype),
    }
    if not cfg.no_bias:
        raise NotImplementedError("MPT with biases is not supported (MPT-7B uses no_bias)")
    return params


def _use_flash_prefill(t: int) -> bool:
    return jax.default_backend() == "tpu" and t >= 512


def _mpt_layer(p, cfg: LMConfig, x, bias, layer_cache, cache_len, flash_bias=None,
               decode_info=None):
    """flash_bias: when set (a key-only [1, H, 1, T] ALiBi bias), the
    cache-free path runs the Pallas flash kernel (causal + right-padding
    semantics, like the LLaMA flash path) with a full Pallas backward —
    the reference's Triton kernel slot (mpt/flash_attn_triton.py:51-483)."""
    n, t, d = x.shape
    h = cfg.num_attention_heads
    hd = d // h
    res = x
    y = layer_norm(p["norm_1"], x)
    qkv = linear(p["attn"]["wqkv"], y)  # [N, T, 3D]; linear handles int8/q4 kernels
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(n, t, h, hd)
    k = k.reshape(n, t, h, hd)
    v = v.reshape(n, t, h, hd)
    if layer_cache is None and flash_bias is not None:
        from tokenpacker_tpu.ops.flash_attention import flash_attention

        interpret = jax.default_backend() != "tpu"
        attn = flash_attention(q, k, v, bias=flash_bias, causal=True, interpret=interpret)
        return _mpt_layer_tail(p, res, attn, n, t, d), None
    if layer_cache is not None:
        ck, cv = layer_cache
        if jnp.ndim(cache_len) == 1:
            # per-sample write positions (continuous batching); T>1 is the
            # speculative verify step
            if t == 1:
                rows = jnp.arange(n)
                ck = ck.at[rows, cache_len].set(k[:, 0].astype(ck.dtype))
                cv = cv.at[rows, cache_len].set(v[:, 0].astype(cv.dtype))
            else:
                rows = jnp.arange(n)[:, None]
                cols = cache_len[:, None] + jnp.arange(t)[None, :]
                ck = ck.at[rows, cols].set(k.astype(ck.dtype))
                cv = cv.at[rows, cols].set(v.astype(cv.dtype))
        else:
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_len, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_len, 0, 0))
        if (t == 1 and decode_info is not None and _use_decode_kernel()
                and ck.shape[1] % 8 == 0):
            # Pallas decode attention with in-kernel ALiBi over compacted
            # token positions (= alibi_bias_from_positions semantics)
            from tokenpacker_tpu.ops.decode_attention import decode_attention

            lengths, needed, span = decode_info
            attn = decode_attention(
                q[:, 0], ck, cv, lengths, needed,
                slopes=alibi_slopes(h), groups=1, span_start=span,
                interpret=jax.default_backend() != "tpu",
            )[:, None]
        else:
            attn = _sdpa(q, ck.astype(q.dtype), cv.astype(q.dtype), bias)
        new_cache = (ck, cv)
    else:
        attn = _sdpa(q, k, v, bias)
        new_cache = None
    return _mpt_layer_tail(p, res, attn, n, t, d), new_cache


def _mpt_layer_tail(p, res, attn, n, t, d):
    x = res + linear(p["attn"]["out"], attn.reshape(n, t, d))
    y = layer_norm(p["norm_2"], x)
    y = jax.nn.gelu(linear(p["ffn"]["up"], y), approximate=False)
    return x + linear(p["ffn"]["down"], y)


def mpt_apply(params, cfg: LMConfig, inputs_embeds, attn_bias, cache: KVCache | None = None,
              key_positions=None, use_flash: bool | None = None, decode_info=None):
    """attn_bias: [N,1,T,S] additive fp32 (causal+padding); ALiBi is added
    here. key_positions: optional [N, S] true token position of each cache
    slot — pass it whenever slots are not token positions (bucket-padded
    decode). use_flash: None = auto (cache-free long spans on TPU take the
    Pallas flash kernel with the ALiBi key bias — exact for right-padded
    causal batches); pass False when attn_bias is NOT plain causal+padding
    (e.g. make_prefix_lm_bias). Returns (hidden, new_cache)."""
    s_total = cache.k.shape[2] if cache is not None else inputs_embeds.shape[1]
    if key_positions is not None:
        bias = attn_bias + alibi_bias_from_positions(cfg.num_attention_heads, key_positions)
    else:
        bias = attn_bias + alibi_bias(cfg.num_attention_heads, s_total)
    cache_len = cache.length if cache is not None else jnp.zeros((), jnp.int32)

    x = inputs_embeds
    if cache is None:
        t = inputs_embeds.shape[1]
        flash_ok = use_flash if use_flash is not None else _use_flash_prefill(t)
        flash_bias = (
            alibi_bias(cfg.num_attention_heads, t)[:, :, :1, :] if flash_ok else None
        )

        def step(carry, layer_params):
            y, _ = _mpt_layer(layer_params, cfg, carry, bias, None, cache_len, flash_bias)
            return y, None

        x, _ = jax.lax.scan(step, x, params["layers"])
        new_cache = None
    else:

        def step(carry, xs):
            layer_params, ck, cv = xs
            y, (nk, nv) = _mpt_layer(
                layer_params, cfg, carry, bias, (ck, cv), cache_len,
                decode_info=decode_info,
            )
            return y, (nk, nv)

        x, (nk, nv) = jax.lax.scan(step, x, (params["layers"], cache.k, cache.v))
        new_cache = KVCache(nk, nv, cache.length + inputs_embeds.shape[1])

    x = layer_norm(params["norm_f"], x)
    return x, new_cache


def mpt_logits(params, hidden):
    """Weight-tied: h @ wte.T (llava_mpt.py:79)."""
    return hidden @ params["wte"].T


def mpt_embed(params, input_ids):
    safe = jnp.clip(input_ids, 0, params["wte"].shape[0] - 1)
    return params["wte"][safe]


def import_mpt(sd, cfg: LMConfig, dtype=jnp.float32):
    """HF/vendored MPT state dict (transformer.wte, transformer.blocks.*)."""
    import numpy as np

    def t(name):
        x = sd[name]
        if hasattr(x, "detach"):
            x = x.detach().float().numpy()
        return np.asarray(x)

    layers = []
    for i in range(cfg.num_hidden_layers):
        b = f"transformer.blocks.{i}"
        layers.append(
            {
                "norm_1": {
                    "scale": jnp.asarray(t(f"{b}.norm_1.weight"), dtype),
                    "bias": jnp.zeros_like(jnp.asarray(t(f"{b}.norm_1.weight"), dtype)),
                },
                "attn": {
                    "wqkv": {"kernel": jnp.asarray(t(f"{b}.attn.Wqkv.weight").T, dtype)},
                    "out": {"kernel": jnp.asarray(t(f"{b}.attn.out_proj.weight").T, dtype)},
                },
                "norm_2": {
                    "scale": jnp.asarray(t(f"{b}.norm_2.weight"), dtype),
                    "bias": jnp.zeros_like(jnp.asarray(t(f"{b}.norm_2.weight"), dtype)),
                },
                "ffn": {
                    "up": {"kernel": jnp.asarray(t(f"{b}.ffn.up_proj.weight").T, dtype)},
                    "down": {"kernel": jnp.asarray(t(f"{b}.ffn.down_proj.weight").T, dtype)},
                },
            }
        )
    norm_f = jnp.asarray(t("transformer.norm_f.weight"), dtype)
    return {
        "wte": jnp.asarray(t("transformer.wte.weight"), dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "norm_f": {"scale": norm_f, "bias": jnp.zeros_like(norm_f)},
    }
