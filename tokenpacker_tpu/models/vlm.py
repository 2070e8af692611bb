"""TokenPackerVLM — the composed multimodal model (tower → projector → LM).

Explicit composition replacing the reference's multiple-inheritance mixin
stack (`LlavaMetaModel`/`LlavaMetaForCausalLM`, llava/model/llava_arch.py;
`LlavaLlamaForCausalLM`, llava/model/language_model/llava_llama.py).

Params pytree: {"vision": ..., "projector": ..., "lm": ...}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import TokenPackerVLMConfig
from tokenpacker_tpu.constants import IGNORE_INDEX
from tokenpacker_tpu.models.clip_vit import clip_tower_features, init_clip_vit
from tokenpacker_tpu.models.llama import KVCache, init_llama, make_attention_bias
from tokenpacker_tpu.models.lm_api import lm_apply, lm_logits
from tokenpacker_tpu.models.splice import assemble_embeds
from tokenpacker_tpu.models.tokenpacker import init_tokenpacker, tokenpacker_forward


def init_vlm(key, cfg: TokenPackerVLMConfig, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    if cfg.lm.model_family == "mpt":
        from tokenpacker_tpu.models.mpt import init_mpt

        lm = init_mpt(k3, cfg.lm, dtype)
    else:
        lm = init_llama(k3, cfg.lm, dtype)
    return {
        "vision": init_clip_vit(k1, cfg.vision, dtype),
        "projector": init_tokenpacker(k2, cfg.projector, dtype),
        "lm": lm,
    }


def encode_images(params, cfg: TokenPackerVLMConfig, images, freeze_tower: bool = True):
    """images: [n_crops, H, W, 3] normalized → [n_crops, tokens_per_view,
    lm_hidden] (reference encode_images, llava_arch.py:95-98).

    The tower is frozen in every reference recipe (clip_encoder.py:24) —
    stop_gradient both saves the backward pass and matches semantics.
    """
    feats, multi = clip_tower_features(params["vision"], cfg.vision, images)
    if freeze_tower:
        feats = jax.lax.stop_gradient(feats)
        multi = jax.lax.stop_gradient(multi)
    return tokenpacker_forward(params["projector"], cfg.projector, feats, multi)


def vlm_hidden(params, cfg: TokenPackerVLMConfig, batch, cache: KVCache | None = None):
    """Run splice + decoder over a preprocessed batch.

    batch: dict with device arrays
      images     [n_crops, H, W, 3]  (optional; None for text-only)
      token_ids  [N, L]   is_image [N, L]   image_slot [N, L]
      attn_mask  [N, L]   positions [N, L]
    """
    if batch.get("images") is not None:
        visual = encode_images(params, cfg, batch["images"])
    else:
        visual = jnp.zeros((1, cfg.tokens_per_view, cfg.lm.hidden_size), cfg.dtype)
    embeds = assemble_embeds(
        params["lm"], visual, batch["token_ids"], batch["is_image"], batch["image_slot"],
        cfg.lm,
    )
    positions = batch["positions"]
    s_total = cache.k.shape[2] if cache is not None else embeds.shape[1]
    bias = make_attention_bias(positions, batch["key_valid"], 0, s_total)
    hidden, new_cache = lm_apply(params["lm"], cfg.lm, embeds, positions, bias, cache)
    return hidden, new_cache


def vlm_loss(params, cfg: TokenPackerVLMConfig, batch):
    """Shifted next-token CE with IGNORE_INDEX masking
    (reference llava_llama.py:93-106). Returns (loss, metrics)."""
    hidden, _ = vlm_hidden(params, cfg, batch)
    logits = lm_logits(params["lm"], cfg.lm, hidden)
    labels = batch["labels"]
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    n_valid = jnp.maximum(valid.sum(), 1)
    loss = -(token_ll * valid).sum() / n_valid
    return loss, {"loss": loss, "n_tokens": n_valid}
