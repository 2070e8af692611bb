"""Export our pytrees back to HF/torch state-dict layout.

Inverse of io/hf_import.py — lets checkpoints trained in this framework be
loaded by the reference (and any HF-ecosystem tool). Round-trip is tested in
tests/test_hf_roundtrip.py.
"""

from __future__ import annotations

import numpy as np

from tokenpacker_tpu.config import TokenPackerVLMConfig
from tokenpacker_tpu.io.hf_import import export_tokenpacker


def _t(x):
    return np.asarray(x, np.float32).T


def _a(x):
    return np.asarray(x, np.float32)


def export_llama_state_dict(params) -> dict:
    sd = {"model.embed_tokens.weight": _a(params["embed"])}
    n_layers = params["layers"]["input_ln"]["scale"].shape[0]
    L = params["layers"]
    for i in range(n_layers):
        b = f"model.layers.{i}"
        sd[f"{b}.input_layernorm.weight"] = _a(L["input_ln"]["scale"][i])
        sd[f"{b}.self_attn.q_proj.weight"] = _t(L["attn"]["q"]["kernel"][i])
        sd[f"{b}.self_attn.k_proj.weight"] = _t(L["attn"]["k"]["kernel"][i])
        sd[f"{b}.self_attn.v_proj.weight"] = _t(L["attn"]["v"]["kernel"][i])
        sd[f"{b}.self_attn.o_proj.weight"] = _t(L["attn"]["o"]["kernel"][i])
        sd[f"{b}.post_attention_layernorm.weight"] = _a(L["post_ln"]["scale"][i])
        sd[f"{b}.mlp.gate_proj.weight"] = _t(L["mlp"]["gate"]["kernel"][i])
        sd[f"{b}.mlp.up_proj.weight"] = _t(L["mlp"]["up"]["kernel"][i])
        sd[f"{b}.mlp.down_proj.weight"] = _t(L["mlp"]["down"]["kernel"][i])
    sd["model.norm.weight"] = _a(params["norm"]["scale"])
    sd["lm_head.weight"] = _t(params["lm_head"]["kernel"])
    return sd


def export_clip_state_dict(params) -> dict:
    v = "vision_model"
    w = params["patch_embed"]["kernel"].shape[1]
    pe = np.asarray(params["patch_embed"]["kernel"], np.float32).T  # [W, 3*p*p]
    # recover conv layout [W, 3, p, p]
    p_sq = pe.shape[1] // 3
    p_side = int(np.sqrt(p_sq))
    sd = {
        f"{v}.embeddings.class_embedding": _a(params["class_embedding"]),
        f"{v}.embeddings.patch_embedding.weight": pe.reshape(w, 3, p_side, p_side),
        f"{v}.embeddings.position_embedding.weight": _a(params["pos_embed"]),
        f"{v}.pre_layrnorm.weight": _a(params["pre_ln"]["scale"]),
        f"{v}.pre_layrnorm.bias": _a(params["pre_ln"]["bias"]),
        f"{v}.post_layernorm.weight": _a(params["post_ln"]["scale"]),
        f"{v}.post_layernorm.bias": _a(params["post_ln"]["bias"]),
    }
    L = params["layers"]
    n_layers = L["ln1"]["scale"].shape[0]
    for i in range(n_layers):
        b = f"{v}.encoder.layers.{i}"
        sd[f"{b}.layer_norm1.weight"] = _a(L["ln1"]["scale"][i])
        sd[f"{b}.layer_norm1.bias"] = _a(L["ln1"]["bias"][i])
        sd[f"{b}.layer_norm2.weight"] = _a(L["ln2"]["scale"][i])
        sd[f"{b}.layer_norm2.bias"] = _a(L["ln2"]["bias"][i])
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("o", "out_proj")):
            sd[f"{b}.self_attn.{theirs}.weight"] = _t(L["attn"][ours]["kernel"][i])
            sd[f"{b}.self_attn.{theirs}.bias"] = _a(L["attn"][ours]["bias"][i])
        sd[f"{b}.mlp.fc1.weight"] = _t(L["mlp"]["fc1"]["kernel"][i])
        sd[f"{b}.mlp.fc1.bias"] = _a(L["mlp"]["fc1"]["bias"][i])
        sd[f"{b}.mlp.fc2.weight"] = _t(L["mlp"]["fc2"]["kernel"][i])
        sd[f"{b}.mlp.fc2.bias"] = _a(L["mlp"]["fc2"]["bias"][i])
    return sd


def export_vlm_state_dict(params, cfg: TokenPackerVLMConfig) -> dict:
    """Full checkpoint in the reference's key layout: LM top-level, tower
    under model.vision_tower.vision_tower., projector under
    model.mm_projector."""
    sd = export_llama_state_dict(params["lm"])
    for k, v in export_clip_state_dict(params["vision"]).items():
        sd[f"model.vision_tower.vision_tower.{k}"] = v
    for k, v in export_tokenpacker(params["projector"]).items():
        sd[f"model.mm_projector.{k}"] = v
    return sd
