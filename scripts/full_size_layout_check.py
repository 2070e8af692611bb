"""Full-size (7B-geometry) released-checkpoint layout round-trip.

VERDICT r1 gap #1 fallback (no network in the sandbox): build a state dict
with the EXACT layout of `sunshine-lwt/TokenPacker-7b-144token` — real
geometry everywhere (ViT-L/14-336 tower, 1024/4096 projector with raw_grid
24 from the actual reference module, 7B LLaMA: hidden 4096 / 32 layers /
vocab 32000) — import it through io/hf_import.import_vlm, and require
greedy-decode token parity vs the torch reference chain on 3 images.

Run on CPU (forced):  python scripts/full_size_layout_check.py
  --slice : instead of the 3 square samples, ONE patch_num-9 slice-mode
            sample (3x3 worst-case grid + global view, `,`/`\n` separators —
            the HD flagship path, llava_arch.py:115-154) at full 7B
            geometry. ~1500-token prompts: budget ~an hour on the 1-core box.
Writes results to stdout; the recorded runs live in PARITY.md.
"""

import importlib.util
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tokenpacker_tpu.config import LMConfig, TokenPackerVLMConfig, VisionConfig
from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX
from tokenpacker_tpu.generate import Generator
from tokenpacker_tpu.io.hf_import import import_vlm
from tokenpacker_tpu.models.splice import build_splice_plan

REF_PROJECTOR = "/root/reference/llava/model/multimodal_projector/builder.py"
MULTI_LAYERS = (12, 16, 22, 23)  # reference clip_encoder.py feature_select


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from transformers import CLIPVisionConfig, CLIPVisionModel, LlamaConfig, LlamaForCausalLM

    torch.set_num_threads(os.cpu_count())
    torch.manual_seed(0)

    log("building ViT-L/14-336 tower (random init, real geometry)...")
    tower = CLIPVisionModel(
        CLIPVisionConfig(
            hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
            num_attention_heads=16, image_size=336, patch_size=14,
        )
    ).eval()

    log("building 7B LLaMA (random init, real geometry)...")
    lm = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
            attn_implementation="eager",
        )
    ).eval()

    log("building reference TokenPacker (raw_grid 24, scale 2 -> 144 tokens)...")
    spec = importlib.util.spec_from_file_location("ref_projector_builder", REF_PROJECTOR)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    projector = mod.TokenPacker(hidden_size=4096, scale_factor=2).eval()

    log("assembling released-checkpoint-layout state dict...")
    sd = {}
    sd.update(lm.state_dict())
    for k, v in tower.state_dict().items():
        sd[f"model.vision_tower.vision_tower.{k}"] = v
    for k, v in projector.state_dict().items():
        sd[f"model.mm_projector.{k}"] = v
    n_bytes = sum(v.numel() * v.element_size() for v in sd.values())
    log(f"state dict: {len(sd)} keys, {n_bytes / 1e9:.1f} GB fp32")

    cfg = TokenPackerVLMConfig(
        vision=VisionConfig(),  # defaults = ViT-L/14-336
        lm=LMConfig(),  # defaults = 7B
        scale_factor=2,
        dtype=jnp.float32,
        patch_num=9 if "--slice" in sys.argv else 1,
        image_aspect_ratio="slice" if "--slice" in sys.argv else "square",
    )
    assert cfg.tokens_per_view == 144

    log("import_vlm (fp32) ...")
    params = import_vlm(sd, cfg, jnp.float32)
    gen = Generator(params, cfg)

    if "--slice" in sys.argv:
        return run_slice(cfg, gen, tower, projector, lm)

    from tests.torch_oracles import torch_reference_greedy

    def torch_greedy(ids, image, n_steps):
        return torch_reference_greedy(
            tower, projector, lm, ids, image, n_steps, MULTI_LAYERS,
            on_step=lambda step, tok: log(f"  torch step {step}: token {tok}"),
        )

    n_steps = 3
    ok = True
    for seed in range(3):
        rng = np.random.default_rng(seed)
        image = rng.standard_normal((1, 3, 336, 336)).astype(np.float32)
        ids = np.array([1, 319, 13563 + seed, IMAGE_TOKEN_INDEX, 29871, 30 + seed], np.int64)

        log(f"image {seed}: torch reference greedy ({n_steps} steps, full recompute)...")
        t0 = time.time()
        expected = torch_greedy(ids, torch.from_numpy(image), n_steps)
        log(f"  torch done in {time.time() - t0:.0f}s: {expected}")

        log(f"image {seed}: tokenpacker-tpu greedy...")
        plan = build_splice_plan(
            [ids], [[(1, 1)]], cfg.tokens_per_view, "single", 29892, 13, 0, pad_to=160
        )
        t0 = time.time()
        got = gen.generate(
            {
                "token_ids": plan.token_ids,
                "is_image": plan.is_image,
                "image_slot": plan.image_slot,
                "lengths": plan.lengths,
                "images": image.transpose(0, 2, 3, 1),
            },
            max_new_tokens=n_steps,
            temperature=0.0,
        ).sequences[0]
        log(f"  ours done in {time.time() - t0:.0f}s: {got}")
        match = got == expected
        ok &= match
        log(f"image {seed}: {'MATCH' if match else 'MISMATCH'} torch={expected} ours={got}")

    print(f"\nFULL-SIZE LAYOUT ROUND-TRIP: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


def run_slice(cfg, gen, tower, projector, lm):
    """One full-geometry HD slice-mode sample: 3x3 worst-case grid + global
    view (10 crops, 1440 visual tokens), vicuna sep ids 29892 (`,`) and
    13 (`\\n`) — token-identical greedy vs the torch reference chain."""
    from tests.torch_oracles import torch_reference_greedy_hd

    from tokenpacker_tpu.generate import pick_bucket

    hb = wb = 3
    sep_id, ret_id = 29892, 13
    n_steps = 2
    rng = np.random.default_rng(42)
    crops = rng.standard_normal((hb * wb + 1, 3, 336, 336)).astype(np.float32)
    ids = np.array([1, 319, 13563, IMAGE_TOKEN_INDEX, 29871, 31], np.int64)

    log(f"slice sample: torch reference greedy ({n_steps} steps, ~1500-token "
        "full recompute)...")
    t0 = time.time()
    expected = torch_reference_greedy_hd(
        tower, projector, lm, ids, torch.from_numpy(crops), hb, wb,
        sep_id, ret_id, n_steps, MULTI_LAYERS,
        on_step=lambda step, tok: log(f"  torch step {step}: token {tok}"),
    )
    log(f"  torch done in {time.time() - t0:.0f}s: {expected}")

    probe = build_splice_plan(
        [ids], [[(hb, wb)]], cfg.tokens_per_view, "slice", sep_id, ret_id, 0
    )
    plan = build_splice_plan(
        [ids], [[(hb, wb)]], cfg.tokens_per_view, "slice", sep_id, ret_id, 0,
        pad_to=pick_bucket(int(probe.lengths[0])),
    )
    log(f"slice sample: tokenpacker-tpu greedy (seq {int(plan.lengths[0])}, "
        f"bucket {plan.token_ids.shape[1]})...")
    t0 = time.time()
    got = gen.generate(
        {
            "token_ids": plan.token_ids,
            "is_image": plan.is_image,
            "image_slot": plan.image_slot,
            "lengths": plan.lengths,
            "images": crops.transpose(0, 2, 3, 1),
        },
        max_new_tokens=n_steps,
        temperature=0.0,
    ).sequences[0]
    log(f"  ours done in {time.time() - t0:.0f}s: {got}")
    ok = got == expected
    print(f"\nFULL-SIZE HD SLICE ROUND-TRIP: {'PASS' if ok else 'FAIL'} "
          f"torch={expected} ours={got}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
