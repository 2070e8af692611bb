"""Checkpoint surgery tools.

Parity with the reference's loose scripts (SURVEY.md §2.1 "Checkpoint
surgery tools"):
- `extract_mm_projector` ≈ scripts/extract_mm_projector.py:24-47 — pull
  `mm_projector.*` keys out of a full/sharded checkpoint into
  mm_projector.bin
- `merge_lora` ≈ scripts/merge_lora_weights.py — merge a LoRA adapter into
  the base and save a full checkpoint
- `consolidate` ≈ llava/model/consolidate.py + model/utils.py auto_upgrade —
  legacy v0→v1 config upgrade is not needed for our config format; this
  command re-saves a checkpoint with a cleaned config.json

All operate on HF-layout checkpoints so artifacts interchange with the
torch ecosystem.
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def _load_any_state_dict(path: str) -> dict:
    import torch

    sd = {}
    files = sorted(
        glob.glob(os.path.join(path, "pytorch_model*.bin"))
        + glob.glob(os.path.join(path, "*.safetensors"))
    )
    if not files:
        # maybe a single .bin file path
        if os.path.isfile(path):
            files = [path]
        else:
            raise FileNotFoundError(f"no weights under {path}")
    for f in files:
        if f.endswith(".safetensors"):
            from safetensors import safe_open

            with safe_open(f, framework="np") as reader:
                for k in reader.keys():
                    sd[k] = reader.get_tensor(k)
        else:
            sd.update(torch.load(f, map_location="cpu", weights_only=True))
    return sd


def extract_mm_projector(model_path: str, output: str):
    """Keep keys containing 'mm_projector' (incl. trainer checkpoint-dir
    globbing like the reference's --checkpoint-* handling)."""
    import torch

    if os.path.isdir(model_path) and not glob.glob(
        os.path.join(model_path, "pytorch_model*")
    ):
        ckpts = sorted(glob.glob(os.path.join(model_path, "checkpoint-*")))
        if ckpts:
            model_path = ckpts[-1]
    sd = _load_any_state_dict(model_path)
    proj = {k: v for k, v in sd.items() if "mm_projector" in k}
    if not proj:
        raise ValueError("no mm_projector keys found")
    torch.save({k: torch.as_tensor(v) for k, v in proj.items()}, output)
    print(f"wrote {len(proj)} tensors to {output}")


def merge_lora(model_path: str, model_base: str, save_path: str):
    """Merge LoRA deltas into base weights and save a full checkpoint."""
    import numpy as np
    import torch

    from tokenpacker_tpu.api import _load_lora_merged  # reuse the loader math
    from tokenpacker_tpu.config import TokenPackerVLMConfig

    cfg = TokenPackerVLMConfig.from_json(os.path.join(model_path, "config.json"))
    import jax.numpy as jnp

    params = _load_lora_merged(model_path, model_base, cfg, jnp.float32)
    os.makedirs(save_path, exist_ok=True)
    # export LM+projector in HF layout
    from tokenpacker_tpu.io.hf_export import export_vlm_state_dict

    sd = export_vlm_state_dict(params, cfg)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
               os.path.join(save_path, "pytorch_model.bin"))
    with open(os.path.join(save_path, "config.json"), "w") as f:
        json.dump(cfg.to_hf_dict(), f, indent=2)
    print(f"merged checkpoint saved to {save_path}")


def consolidate(src: str, dst: str):
    """Re-save a checkpoint directory with a normalized config.json."""
    import shutil

    from tokenpacker_tpu.config import TokenPackerVLMConfig

    os.makedirs(dst, exist_ok=True)
    cfg = TokenPackerVLMConfig.from_json(os.path.join(src, "config.json"))
    for f in glob.glob(os.path.join(src, "*")):
        if os.path.basename(f) != "config.json":
            shutil.copy(f, dst)
    with open(os.path.join(dst, "config.json"), "w") as f:
        json.dump(cfg.to_hf_dict(), f, indent=2)
    print(f"consolidated {src} -> {dst}")


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("extract-mm-projector")
    sp.add_argument("--model-path", required=True)
    sp.add_argument("--output", required=True)

    sp = sub.add_parser("merge-lora")
    sp.add_argument("--model-path", required=True)
    sp.add_argument("--model-base", required=True)
    sp.add_argument("--save-model-path", required=True)

    sp = sub.add_parser("consolidate")
    sp.add_argument("--src", required=True)
    sp.add_argument("--dst", required=True)

    args = p.parse_args(argv)
    if args.cmd == "extract-mm-projector":
        extract_mm_projector(args.model_path, args.output)
    elif args.cmd == "merge-lora":
        merge_lora(args.model_path, args.model_base, args.save_model_path)
    else:
        consolidate(args.src, args.dst)


if __name__ == "__main__":
    main()
