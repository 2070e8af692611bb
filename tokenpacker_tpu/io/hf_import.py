"""HF/torch checkpoint → JAX pytree importers.

Maps the state-dict layouts of the released TokenPacker checkpoints
(`sunshine-lwt/TokenPacker-*`, reference README.md:129-137) onto our pytrees:

- CLIP tower:   HF `CLIPVisionModel` keys (`vision_model.*`)
- projector:    reference module names (`mm_projector.{q_proj_1,k_proj_1,
                v_proj_1,ln_{q,k,v}_1,clip_attn,mlp}` — projector
                builder.py:59-83), incl. the packed `clip_attn.in_proj_weight`
- LLM:          HF `LlamaForCausalLM` keys (`model.layers.*`, `lm_head`)

All torch Linear weights are [out, in]; our kernels are [in, out], so every
weight is transposed exactly once here. Accepts any mapping of name → array
(torch tensors, numpy arrays, or np memmaps from safetensors).
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from tokenpacker_tpu.config import LMConfig, ProjectorConfig, VisionConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().to("cpu")
        if x.dtype.__str__() == "torch.bfloat16":
            x = x.float()
        x = x.numpy()
    return np.asarray(x)


def _lin(sd: Mapping, name: str, dtype) -> dict:
    p = {"kernel": jnp.asarray(_np(sd[f"{name}.weight"]).T, dtype)}
    if f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(_np(sd[f"{name}.bias"]), dtype)
    return p


def _ln(sd: Mapping, name: str, dtype) -> dict:
    return {
        "scale": jnp.asarray(_np(sd[f"{name}.weight"]), dtype),
        "bias": jnp.asarray(_np(sd[f"{name}.bias"]), dtype),
    }


def strip_prefix(sd: Mapping, prefix: str) -> dict:
    return {k[len(prefix) :]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# CLIP vision tower
# ---------------------------------------------------------------------------


def import_clip_vision(sd: Mapping, cfg: VisionConfig, dtype=jnp.float32) -> dict:
    """sd: state dict with `vision_model.*` keys (prefix already stripped of
    any wrapper like `model.vision_tower.vision_tower.`)."""
    v = "vision_model"
    emb = f"{v}.embeddings"
    pe = _np(sd[f"{emb}.patch_embedding.weight"])  # [W, 3, p, p]
    w = pe.shape[0]
    params: dict[str, Any] = {
        "class_embedding": jnp.asarray(_np(sd[f"{emb}.class_embedding"]), dtype),
        "patch_embed": {"kernel": jnp.asarray(pe.reshape(w, -1).T, dtype)},
        "pos_embed": jnp.asarray(_np(sd[f"{emb}.position_embedding.weight"]), dtype),
        # HF spells it "pre_layrnorm"
        "pre_ln": _ln(sd, f"{v}.pre_layrnorm", dtype),
        "post_ln": _ln(sd, f"{v}.post_layernorm", dtype),
    }
    layers = []
    for i in range(cfg.num_hidden_layers):
        b = f"{v}.encoder.layers.{i}"
        layers.append(
            {
                "ln1": _ln(sd, f"{b}.layer_norm1", dtype),
                "attn": {
                    "q": _lin(sd, f"{b}.self_attn.q_proj", dtype),
                    "k": _lin(sd, f"{b}.self_attn.k_proj", dtype),
                    "v": _lin(sd, f"{b}.self_attn.v_proj", dtype),
                    "o": _lin(sd, f"{b}.self_attn.out_proj", dtype),
                },
                "ln2": _ln(sd, f"{b}.layer_norm2", dtype),
                "mlp": {
                    "fc1": _lin(sd, f"{b}.mlp.fc1", dtype),
                    "fc2": _lin(sd, f"{b}.mlp.fc2", dtype),
                },
            }
        )
    import jax

    params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return params


# ---------------------------------------------------------------------------
# TokenPacker projector
# ---------------------------------------------------------------------------


def import_tokenpacker(sd: Mapping, cfg: ProjectorConfig, dtype=jnp.float32) -> dict:
    """sd: keys relative to the projector module (`q_proj_1.weight`, ...)."""
    e = cfg.embed_dim
    in_w = _np(sd["clip_attn.in_proj_weight"])  # [3E, E]
    in_b = _np(sd["clip_attn.in_proj_bias"])  # [3E]
    return {
        "q_proj": {"kernel": jnp.asarray(_np(sd["q_proj_1.weight"]).T, dtype), "bias": None},
        "k_proj": {
            "fc1": _lin(sd, "k_proj_1.0", dtype),
            "fc2": _lin(sd, "k_proj_1.2", dtype),
        },
        "v_proj": {
            "fc1": _lin(sd, "v_proj_1.0", dtype),
            "fc2": _lin(sd, "v_proj_1.2", dtype),
        },
        "ln_q": _ln(sd, "ln_q_1", dtype),
        "ln_k": _ln(sd, "ln_k_1", dtype),
        "ln_v": _ln(sd, "ln_v_1", dtype),
        "attn": {
            "q": {"kernel": jnp.asarray(in_w[:e].T, dtype), "bias": jnp.asarray(in_b[:e], dtype)},
            "k": {
                "kernel": jnp.asarray(in_w[e : 2 * e].T, dtype),
                "bias": jnp.asarray(in_b[e : 2 * e], dtype),
            },
            "v": {
                "kernel": jnp.asarray(in_w[2 * e :].T, dtype),
                "bias": jnp.asarray(in_b[2 * e :], dtype),
            },
            "o": _lin(sd, "clip_attn.out_proj", dtype),
        },
        "mlp": {"fc1": _lin(sd, "mlp.0", dtype), "fc2": _lin(sd, "mlp.2", dtype)},
    }


def export_tokenpacker(params, dtype=np.float32) -> dict:
    """Inverse of import_tokenpacker — writes reference-layout arrays so our
    trained projectors can be saved as `mm_projector.bin`-compatible dicts."""

    def t(x):
        return np.asarray(x, dtype).T

    a = params["attn"]
    out = {
        "q_proj_1.weight": t(params["q_proj"]["kernel"]),
        "k_proj_1.0.weight": t(params["k_proj"]["fc1"]["kernel"]),
        "k_proj_1.0.bias": np.asarray(params["k_proj"]["fc1"]["bias"], dtype),
        "k_proj_1.2.weight": t(params["k_proj"]["fc2"]["kernel"]),
        "k_proj_1.2.bias": np.asarray(params["k_proj"]["fc2"]["bias"], dtype),
        "v_proj_1.0.weight": t(params["v_proj"]["fc1"]["kernel"]),
        "v_proj_1.0.bias": np.asarray(params["v_proj"]["fc1"]["bias"], dtype),
        "v_proj_1.2.weight": t(params["v_proj"]["fc2"]["kernel"]),
        "v_proj_1.2.bias": np.asarray(params["v_proj"]["fc2"]["bias"], dtype),
        "ln_q_1.weight": np.asarray(params["ln_q"]["scale"], dtype),
        "ln_q_1.bias": np.asarray(params["ln_q"]["bias"], dtype),
        "ln_k_1.weight": np.asarray(params["ln_k"]["scale"], dtype),
        "ln_k_1.bias": np.asarray(params["ln_k"]["bias"], dtype),
        "ln_v_1.weight": np.asarray(params["ln_v"]["scale"], dtype),
        "ln_v_1.bias": np.asarray(params["ln_v"]["bias"], dtype),
        "clip_attn.in_proj_weight": np.concatenate(
            [t(a["q"]["kernel"]), t(a["k"]["kernel"]), t(a["v"]["kernel"])], axis=0
        ),
        "clip_attn.in_proj_bias": np.concatenate(
            [np.asarray(a[x]["bias"], dtype) for x in ("q", "k", "v")]
        ),
        "clip_attn.out_proj.weight": t(a["o"]["kernel"]),
        "clip_attn.out_proj.bias": np.asarray(a["o"]["bias"], dtype),
        "mlp.0.weight": t(params["mlp"]["fc1"]["kernel"]),
        "mlp.0.bias": np.asarray(params["mlp"]["fc1"]["bias"], dtype),
        "mlp.2.weight": t(params["mlp"]["fc2"]["kernel"]),
        "mlp.2.bias": np.asarray(params["mlp"]["fc2"]["bias"], dtype),
    }
    return out


# ---------------------------------------------------------------------------
# LLaMA
# ---------------------------------------------------------------------------


def import_llama(sd: Mapping, cfg: LMConfig, dtype=jnp.float32) -> dict:
    """sd: HF LlamaForCausalLM keys (`model.embed_tokens.weight`, ...)."""
    import jax

    def nb(name):  # bias-free linear
        return {"kernel": jnp.asarray(_np(sd[f"{name}.weight"]).T, dtype)}

    layers = []
    for i in range(cfg.num_hidden_layers):
        b = f"model.layers.{i}"
        layers.append(
            {
                "input_ln": {"scale": jnp.asarray(_np(sd[f"{b}.input_layernorm.weight"]), dtype)},
                "attn": {
                    "q": nb(f"{b}.self_attn.q_proj"),
                    "k": nb(f"{b}.self_attn.k_proj"),
                    "v": nb(f"{b}.self_attn.v_proj"),
                    "o": nb(f"{b}.self_attn.o_proj"),
                },
                "post_ln": {
                    "scale": jnp.asarray(_np(sd[f"{b}.post_attention_layernorm.weight"]), dtype)
                },
                "mlp": {
                    "gate": nb(f"{b}.mlp.gate_proj"),
                    "up": nb(f"{b}.mlp.up_proj"),
                    "down": nb(f"{b}.mlp.down_proj"),
                },
            }
        )
    return {
        "embed": jnp.asarray(_np(sd["model.embed_tokens.weight"]), dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "norm": {"scale": jnp.asarray(_np(sd["model.norm.weight"]), dtype)},
        "lm_head": nb("lm_head"),
    }


# ---------------------------------------------------------------------------
# Full VLM checkpoint
# ---------------------------------------------------------------------------


def import_vlm(sd: Mapping, config, dtype=jnp.float32) -> dict:
    """Split a full TokenPacker/LLaVA state dict into the three submodels.

    Key layout (reference checkpoints): LLM at top level (`model.layers.*`),
    tower under `model.vision_tower.vision_tower.`, projector under
    `model.mm_projector.`.
    """
    tower_sd = strip_prefix(sd, "model.vision_tower.vision_tower.")
    proj_sd = strip_prefix(sd, "model.mm_projector.")
    lm_sd = {
        k: v
        for k, v in sd.items()
        if not k.startswith("model.vision_tower.") and not k.startswith("model.mm_projector.")
    }
    return {
        "vision": import_clip_vision(tower_sd, config.vision, dtype),
        "projector": import_tokenpacker(proj_sd, config.projector, dtype),
        "lm": import_llama(lm_sd, config.lm, dtype),
    }
