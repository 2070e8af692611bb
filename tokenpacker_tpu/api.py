"""Public API — parity surface of the reference's loading/inference stack
(SURVEY.md §3.5): `load_pretrained_model`, `process_images`,
`tokenizer_image_token`, `conv_templates`, `Generator.generate`.

`load_pretrained_model(model_path, model_base, model_name)` returns
`(tokenizer, model, image_processor, context_len)` like reference
llava/model/builder.py:26-152, where `model` is a `LoadedModel` bundle
(params pytree + config + generator).

Checkpoint layouts supported (reference builder.py:42-128):
- full checkpoint directory (config.json + *.safetensors / *.bin)
- base LLM + `mm_projector.bin` delta (stage-1 artifacts)
- LoRA: base + `non_lora_trainables.bin` + adapter (merged at load)
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import TokenPackerVLMConfig
from tokenpacker_tpu.data.conversation import conv_templates, default_conversation
from tokenpacker_tpu.data.mm_tokenize import get_model_name_from_path, tokenizer_image_token
from tokenpacker_tpu.generate import Generator
from tokenpacker_tpu.image.processing import process_image, process_images, to_model_input
from tokenpacker_tpu.io.hf_import import (
    import_clip_vision,
    import_llama,
    import_tokenpacker,
    import_vlm,
    strip_prefix,
)

__all__ = [
    "load_pretrained_model",
    "process_images",
    "process_image",
    "tokenizer_image_token",
    "conv_templates",
    "default_conversation",
    "get_model_name_from_path",
    "LoadedModel",
]


@dataclass
class LoadedModel:
    params: dict
    config: TokenPackerVLMConfig
    generator: Generator

    @property
    def cfg(self):
        return self.config


def _load_state_dict(model_path: str) -> dict:
    """Load all weights from a checkpoint dir (safetensors preferred)."""
    sd: dict[str, Any] = {}
    st_files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(f, framework="np") as reader:
                for k in reader.keys():
                    sd[k] = reader.get_tensor(k)
        return sd
    bin_files = sorted(glob.glob(os.path.join(model_path, "pytorch_model*.bin")))
    if not bin_files:
        raise FileNotFoundError(f"no weights found in {model_path}")
    import torch

    for f in bin_files:
        part = torch.load(f, map_location="cpu", weights_only=True)
        sd.update(part)
    return sd


def _load_tokenizer(model_path: str):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(model_path, use_fast=False)


def load_pretrained_model(
    model_path: str,
    model_base: str | None = None,
    model_name: str | None = None,
    dtype=jnp.bfloat16,
    load_8bit: bool = False,
    load_4bit: bool = False,
    quant_type: str = "nf4",
    **kwargs,
):
    """Returns (tokenizer, model: LoadedModel, image_processor, context_len).

    `image_processor` here is the callable `process_images` partial bound to
    the model's image_aspect_ratio/patch_num (the reference returns an HF
    CLIPImageProcessor; ours is the whole preprocessing front door).

    load_8bit: hold the LM's linear weights as per-channel int8 in HBM
    (reference builder.py:29-40 BitsAndBytes slot); ops/layers.linear
    consumes them without dense materialization.
    load_4bit: blockwise 4-bit weight-only (quant_type 'nf4' or 'int4');
    the decode path uses the Pallas dequant-in-kernel matmul
    (ops/q4_matmul.py) so the dense weight never lands in HBM.
    """
    model_name = model_name or get_model_name_from_path(model_path)
    cfg = TokenPackerVLMConfig.from_json(os.path.join(model_path, "config.json"))

    is_lora = os.path.exists(os.path.join(model_path, "adapter_config.json"))
    has_projector_only = os.path.exists(os.path.join(model_path, "mm_projector.bin"))

    # import weights on the host: avoids double-residency spikes in HBM
    # (bf16 + int8 during load_8bit) and lets quantization run before any
    # device transfer; the final pytree ships to the accelerator once
    import contextlib

    cpu_devs = jax.devices("cpu") if jax.default_backend() != "cpu" else []
    import_ctx = jax.default_device(cpu_devs[0]) if cpu_devs else contextlib.nullcontext()
    with import_ctx:
        params = _import_params(
            model_path, model_base, cfg, dtype, is_lora, has_projector_only
        )
        if load_8bit and load_4bit:
            raise ValueError("load_8bit and load_4bit are mutually exclusive")
        if load_8bit:
            from tokenpacker_tpu.ops.quantize import fuse_llama_layers, quantize_tree

            lm = params["lm"]
            if cfg.lm.model_family == "llama":
                # fused qkv/gateup: numerics identical (per-out-channel
                # scales are per-column either way) and required by the
                # single-dispatch fused decode kernel (ops/fused_decode.py)
                lm = fuse_llama_layers(lm)
            lm = quantize_tree(lm)
            if (cfg.lm.model_family == "llama"
                    and os.environ.get("TOKENPACKER_FD_PACK") == "1"):
                # u16-row-packed weight storage: the fused decode kernel
                # streams 16-bit tiles at ~2.5x int8's DMA byte rate
                # (ops/quantize.pack_fused_weights). Other consumers unpack
                # on the fly (ops/layers.linear) — opt-in because fallback
                # dispatches (S>1024 caches, int8 KV) pay that unpack.
                from tokenpacker_tpu.ops.quantize import pack_fused_weights

                lm = pack_fused_weights(lm)
            params["lm"] = lm
        elif load_4bit:
            # bitsandbytes load_4bit slot (reference builder.py:29-40):
            # nf4 (default) or int4 blockwise weight-only quantization, with
            # q/k/v and gate/up fused to halve decode-path kernel dispatches
            from tokenpacker_tpu.ops.quantize import fuse_llama_layers, quantize_tree_4bit

            lm = params["lm"]
            if cfg.lm.model_family == "llama":
                lm = fuse_llama_layers(lm)
            params["lm"] = quantize_tree_4bit(lm, quant_type=quant_type)
    if cpu_devs:
        params = jax.device_put(params, jax.devices()[0])

    tokenizer = _load_tokenizer(
        model_base if (is_lora or (has_projector_only and model_base)) else model_path
    )

    cfg = dataclass_replace(cfg, dtype=dtype)
    generator = Generator(params, cfg, tokenizer)
    model = LoadedModel(params, cfg, generator)

    def image_processor(images, image_aspect_ratio=None, patch_num=None):
        return process_images(
            images,
            image_aspect_ratio or cfg.image_aspect_ratio,
            patch_num or cfg.patch_num,
        )

    context_len = cfg.model_max_length
    return tokenizer, model, image_processor, context_len


def _import_params(model_path, model_base, cfg, dtype, is_lora, has_projector_only):
    if is_lora:
        if model_base is None:
            raise ValueError("LoRA checkpoints need model_base")
        return _load_lora_merged(model_path, model_base, cfg, dtype)
    if has_projector_only and model_base is not None:
        # stage-1 delta: base LLM + projector weights
        base_sd = _load_state_dict(model_base)
        import torch

        proj_sd = torch.load(
            os.path.join(model_path, "mm_projector.bin"), map_location="cpu", weights_only=True
        )
        proj_sd = strip_prefix(proj_sd, "model.mm_projector.")
        return {
            "lm": import_llama(base_sd, cfg.lm, dtype),
            "projector": import_tokenpacker(proj_sd, cfg.projector, dtype),
            "vision": _load_tower_params(cfg, dtype),
        }
    sd = _load_state_dict(model_path)
    if not any(k.startswith("model.vision_tower.") for k in sd):
        # checkpoint shipped without tower weights: load tower separately
        return {
            "lm": import_llama(sd, cfg.lm, dtype),
            "projector": import_tokenpacker(
                strip_prefix(sd, "model.mm_projector."), cfg.projector, dtype
            ),
            "vision": _load_tower_params(cfg, dtype),
        }
    return import_vlm(sd, cfg, dtype)


def dataclass_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def _load_tower_params(cfg: TokenPackerVLMConfig, dtype):
    """Load openai/clip-vit-large-patch14-336 weights (HF cache or env path
    TOKENPACKER_CLIP_PATH); falls back to random init for offline testing."""
    path = os.environ.get("TOKENPACKER_CLIP_PATH")
    if path and os.path.isdir(path):
        sd = _load_state_dict(path)
        return import_clip_vision(sd, cfg.vision, dtype)
    try:
        from transformers import CLIPVisionModel

        tower = CLIPVisionModel.from_pretrained("openai/clip-vit-large-patch14-336")
        return import_clip_vision(tower.state_dict(), cfg.vision, dtype)
    except Exception:
        from tokenpacker_tpu.models.clip_vit import init_clip_vit

        return init_clip_vit(jax.random.PRNGKey(0), cfg.vision, dtype)


def _load_lora_merged(model_path, model_base, cfg, dtype):
    """Load base weights, apply LoRA deltas (W + BA scaled), merge
    non_lora_trainables (reference builder.py:46-79)."""
    import torch

    base_sd = _load_state_dict(model_base)
    with open(os.path.join(model_path, "adapter_config.json")) as f:
        acfg = json.load(f)
    scaling = acfg["lora_alpha"] / acfg["r"]
    adapter_file = os.path.join(model_path, "adapter_model.bin")
    lora_sd = torch.load(adapter_file, map_location="cpu", weights_only=True)

    # merge: W' = W + scaling * (B @ A)
    merged = dict(base_sd)
    for k in list(lora_sd.keys()):
        if k.endswith("lora_A.weight"):
            a = lora_sd[k].float()
            b = lora_sd[k.replace("lora_A", "lora_B")].float()
            target = (
                k.replace("base_model.model.", "")
                .replace(".lora_A.weight", ".weight")
            )
            if target in merged:
                w = merged[target]
                if hasattr(w, "float"):
                    w = w.float()
                merged[target] = w + scaling * (b @ a)

    nlt_file = os.path.join(model_path, "non_lora_trainables.bin")
    if os.path.exists(nlt_file):
        nlt = torch.load(nlt_file, map_location="cpu", weights_only=True)
        for k, v in nlt.items():
            merged[k.replace("base_model.model.", "")] = v

    if any(k.startswith("model.vision_tower.") for k in merged):
        return import_vlm(merged, cfg, dtype)
    return {
        "lm": import_llama(merged, cfg.lm, dtype),
        "projector": import_tokenpacker(
            strip_prefix(merged, "model.mm_projector."), cfg.projector, dtype
        ),
        "vision": _load_tower_params(cfg, dtype),
    }
