"""CLIP ViT vision tower in pure JAX.

Reproduces HF `CLIPVisionModel` (the reference's tower,
llava/model/multimodal_encoder/clip_encoder.py:7-89) for
openai/clip-vit-large-patch14-336: conv patch embed (no bias) + CLS +
learned position embeddings + pre-LayerNorm, then N pre-LN transformer
blocks with quick-GELU MLPs.

The tower is frozen in all reference recipes (clip_encoder.py:24), so the
forward is pure inference; `feature_select` returns the reference's tuple
`(hidden_states[select_layer][:, 1:], concat(hidden_states[l] for l in
multi_layers)[:, 1:])` (clip_encoder.py:28-44). hidden_states[0] is the
post-pre-LayerNorm embedding stream and hidden_states[i] the output of
block i, matching HF's output_hidden_states indexing.

TPU notes: the patch conv is expressed as an unfold+matmul (a single
[B*576, 14*14*3] x [588, width] MXU matmul); all blocks run under one jit
with scan-over-layers to keep compile time flat; attention uses
jnp.einsum, which XLA maps to the MXU with fused softmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import VisionConfig
from tokenpacker_tpu.ops.layers import (
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    quick_gelu,
)


def init_clip_vit(key, cfg: VisionConfig, dtype=jnp.float32):
    n_keys = 8 + cfg.num_hidden_layers * 6
    keys = iter(jax.random.split(key, n_keys))
    w = cfg.hidden_size

    def lin(i, o):
        return init_linear(next(keys), i, o, dtype=dtype)

    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    params = {
        "class_embedding": 0.02 * jax.random.normal(next(keys), (w,), dtype),
        # conv kernel flattened to [patch_dim, width] (no bias, as in CLIP)
        "patch_embed": {"kernel": 0.02 * jax.random.normal(next(keys), (patch_dim, w), dtype)},
        "pos_embed": 0.02 * jax.random.normal(next(keys), (cfg.seq_len, w), dtype),
        "pre_ln": init_layer_norm(w, dtype),
        "post_ln": init_layer_norm(w, dtype),
        "layers": [],
    }
    for _ in range(cfg.num_hidden_layers):
        params["layers"].append(
            {
                "ln1": init_layer_norm(w, dtype),
                "attn": {"q": lin(w, w), "k": lin(w, w), "v": lin(w, w), "o": lin(w, w)},
                "ln2": init_layer_norm(w, dtype),
                "mlp": {"fc1": lin(w, cfg.intermediate_size), "fc2": lin(cfg.intermediate_size, w)},
            }
        )
    # stack layer params for scan
    params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])
    return params


def quantize_tower_int8(params):
    """int8-quantize the transformer blocks' GEMM kernels (attn q/k/v/o,
    mlp fc1/fc2) per out-channel; embeddings, LayerNorms, and biases stay
    dense. With TOKENPACKER_W8A8=1 the tower's batched GEMMs then ride the
    native int8 MXU path (ops/s8_gemm.py, 2x bf16 peak on v5e) — the opt-in
    fast serving mode for the vision path (weight-only int8 semantics
    otherwise). The stacked [L, K, N] kernels quantize along K so each
    layer slice under scan is a standard {'q','scale'} leaf."""
    from tokenpacker_tpu.ops.quantize import quantize_int8

    def quant_leaf(leaf):
        q, scale = quantize_int8(leaf["kernel"], axis=-2)
        out = dict(leaf)
        out["kernel"] = {"q": q, "scale": scale}
        return out

    layers = params["layers"]
    new_layers = dict(layers)
    new_layers["attn"] = {
        name: quant_leaf(layers["attn"][name]) for name in ("q", "k", "v", "o")
    }
    new_layers["mlp"] = {
        name: quant_leaf(layers["mlp"][name]) for name in ("fc1", "fc2")
    }
    return {**params, "layers": new_layers}


def _attn_einsum(p, x, num_heads: int):
    """Reference-semantics XLA path (CPU/tests, and any non-TPU backend)."""
    n, t, w = x.shape
    d = w // num_heads
    q = linear(p["q"], x).reshape(n, t, num_heads, d)
    k = linear(p["k"], x).reshape(n, t, num_heads, d)
    v = linear(p["v"], x).reshape(n, t, num_heads, d)
    logits = jnp.einsum("nqhd,nkhd->nhqk", q, k) * (d**-0.5)
    a = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
    o = jnp.einsum("nhqk,nkhd->nqhd", a, v).reshape(n, t, w)
    return linear(p["o"], o)


def _attn_pallas(p, x, num_heads: int):
    """VMEM-resident per-image attention (ops/vit_attention.py). Measured
    262 → 360.5 img/s on v5e vs the einsum path (the [N,H,T,T] probabilities
    never touch HBM; softmax VPU work minimized); flash variants measured
    SLOWER at this geometry — see the kernel docstring for the full
    measurement history."""
    from tokenpacker_tpu.ops.vit_attention import vit_attention

    q = linear(p["q"], x)
    k = linear(p["k"], x)
    v = linear(p["v"], x)
    interpret = jax.default_backend() != "tpu"
    return linear(p["o"], vit_attention(q, k, v, num_heads, interpret=interpret))


def _attn(p, x, num_heads: int):
    import os

    impl = os.environ.get("TOKENPACKER_VIT_ATTN")
    if impl == "einsum":
        return _attn_einsum(p, x, num_heads)
    if impl == "pallas" or jax.default_backend() == "tpu":
        return _attn_pallas(p, x, num_heads)
    return _attn_einsum(p, x, num_heads)


def _use_fused_block() -> bool:
    """TOKENPACKER_VIT_BLOCK=1 runs the whole transformer block as one
    Pallas kernel (ops/vit_block.py) — the hidden stream makes exactly one
    HBM round trip per layer instead of ~8 (opt-in; callers' outermost jit
    must raise the scoped-vmem limit, see the kernel docstring).
    =interpret forces the interpret path for CPU tests."""
    import os

    v = os.environ.get("TOKENPACKER_VIT_BLOCK", "0")
    return v not in ("0", "off", "")


def _block(p, x, cfg: VisionConfig):
    if _use_fused_block():
        import os

        from tokenpacker_tpu.ops.vit_block import vit_block

        interpret = (
            os.environ.get("TOKENPACKER_VIT_BLOCK") == "interpret"
            or jax.default_backend() != "tpu"
        )
        return vit_block(
            x, p, cfg.num_attention_heads, cfg.layer_norm_eps, interpret=interpret
        )
    x = x + _attn(p["attn"], layer_norm(p["ln1"], x, cfg.layer_norm_eps), cfg.num_attention_heads)
    h = layer_norm(p["ln2"], x, cfg.layer_norm_eps)
    h = linear(p["mlp"]["fc2"], quick_gelu(linear(p["mlp"]["fc1"], h)))
    return x + h


def patchify(images, patch_size: int):
    """[N, H, W, 3] → [N, (H/p)*(W/p), 3*p*p] in HF conv-kernel flatten order
    (out-channel dot over [c_in, kh, kw])."""
    n, hh, ww, c = images.shape
    gh, gw = hh // patch_size, ww // patch_size
    x = images.reshape(n, gh, patch_size, gw, patch_size, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [N, gh, gw, C, ph, pw]
    return x.reshape(n, gh * gw, c * patch_size * patch_size)


def clip_vit_hidden_states(params, cfg: VisionConfig, images):
    """images: [N, H, W, 3] (CLIP-normalized, channels-last).

    Returns stacked hidden states [L+1, N, seq, width]: index 0 = embeddings
    (after pre-LN), index i = output of block i.
    """
    n = images.shape[0]
    patches = patchify(images, cfg.patch_size)
    x = patches @ params["patch_embed"]["kernel"]  # [N, 576, W]
    cls = jnp.broadcast_to(params["class_embedding"], (n, 1, cfg.hidden_size)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"]
    x = layer_norm(params["pre_ln"], x, cfg.layer_norm_eps)

    def step(carry, layer_params):
        y = _block(layer_params, carry, cfg)
        return y, y

    last, stacked = jax.lax.scan(step, x, params["layers"])
    hidden = jnp.concatenate([x[None], stacked], axis=0)  # [L+1, N, T, W]
    return hidden


def _embed(params, cfg: VisionConfig, images):
    n = images.shape[0]
    patches = patchify(images, cfg.patch_size)
    x = patches @ params["patch_embed"]["kernel"]  # [N, 576, W]
    cls = jnp.broadcast_to(params["class_embedding"], (n, 1, cfg.hidden_size)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"]
    return layer_norm(params["pre_ln"], x, cfg.layer_norm_eps)


def clip_tower_features(params, cfg: VisionConfig, images):
    """The reference tower tuple (clip_encoder.py:28-44):
    (features [N,576,W] at select_layer, multi-level concat [N,576,4W]).

    Performance: only the needed intermediate states are kept — the stack
    runs as segmented scans with boundaries at the consumed layers, instead
    of materializing all L+1 hidden states ([25, N, 577, W] of HBM traffic).
    Blocks after the deepest consumed layer (block 24 when select_layer=-2)
    are skipped entirely.
    """
    total = cfg.num_hidden_layers + 1  # hidden-states entries
    sel = cfg.select_layer if cfg.select_layer >= 0 else total + cfg.select_layer
    needed = sorted(set([sel, *cfg.multi_layers]))

    x = _embed(params, cfg, images)
    outputs = {}
    if needed and needed[0] == 0:
        outputs[0] = x
        needed = needed[1:]

    def step(carry, layer_params):
        return _block(layer_params, carry, cfg), None

    prev = 0
    for idx in needed:  # idx = block number (1-based hidden_states entry)
        seg = jax.tree.map(lambda a: a[prev:idx], params["layers"])
        x, _ = jax.lax.scan(step, x, seg)
        outputs[idx] = x
        prev = idx

    feats = outputs[sel]
    multi = jnp.concatenate([outputs[l] for l in cfg.multi_layers], axis=-1)
    if cfg.select_feature == "patch":
        feats = feats[:, 1:]
        multi = multi[:, 1:]
    return feats, multi
