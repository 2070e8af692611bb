"""Uniform decoder API dispatching between model families.

The reference has two LM wrappers — `LlavaLlamaForCausalLM`
(llava_llama.py:41) and `LlavaMPTForCausalLM` (llava_mpt.py:45). Here the
meta-arch (models/vlm.py) and the generation engine call these three
functions; `cfg.model_family` ("llama" | "mpt") picks the implementation.
"""

from __future__ import annotations

import jax.numpy as jnp

from tokenpacker_tpu.config import LMConfig
from tokenpacker_tpu.models import llama as _llama
from tokenpacker_tpu.models import mpt as _mpt


def lm_embed(params, cfg: LMConfig, input_ids):
    if cfg.model_family == "mpt":
        return _mpt.mpt_embed(params, input_ids)
    return _llama.embed_tokens(params, input_ids)


def lm_apply(params, cfg: LMConfig, inputs_embeds, positions, attn_bias, cache=None,
             key_positions=None, decode_info=None, use_flash=None):
    """positions are used by RoPE (LLaMA); MPT uses ALiBi over key_positions
    (optional [N, S] true token position per cache slot, for bucket-padded
    decode where slot index != token position). decode_info: optional
    (lengths, needed, span_start) enabling the Pallas decode-attention
    kernel for t==1 steps. use_flash: pass False when attn_bias is NOT a
    plain right-padded causal mask (e.g. prefix-LM) — the auto flash path
    replaces the bias with pure causal+ALiBi semantics."""
    if cfg.model_family == "mpt":
        # lm_apply callers build plain causal+padding biases
        # (make_attention_bias), so the auto-flash path is safe
        return _mpt.mpt_apply(
            params, cfg, inputs_embeds, attn_bias, cache, key_positions,
            use_flash=use_flash, decode_info=decode_info,
        )
    return _llama.llama_apply(
        params, cfg, inputs_embeds, positions, attn_bias, cache,
        use_flash=use_flash, decode_info=decode_info,
    )


def lm_logits(params, cfg: LMConfig, hidden):
    if cfg.model_family == "mpt":
        return _mpt.mpt_logits(params, hidden)
    return _llama.llama_logits(params, hidden)
