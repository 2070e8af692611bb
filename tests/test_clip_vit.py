"""Parity of the JAX CLIP tower vs HF `CLIPVisionModel` (random tiny config).

Verifies patch-embed unfold order, pre-LN placement, quick-GELU blocks, and
the hidden_states indexing consumed by feature_select
(reference clip_encoder.py:28-44).
"""

import numpy as np
import torch
from transformers import CLIPVisionConfig, CLIPVisionModel

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import VisionConfig
from tokenpacker_tpu.io.hf_import import import_clip_vision
from tokenpacker_tpu.models.clip_vit import clip_tower_features, clip_vit_hidden_states


def make_tiny():
    hf_cfg = CLIPVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
        projection_dim=32,
    )
    torch.manual_seed(0)
    model = CLIPVisionModel(hf_cfg).eval()
    cfg = VisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
        select_layer=-2,
        multi_layers=(1, 2, 3, 4),
    )
    params = import_clip_vision(model.state_dict(), cfg)
    return model, cfg, params


def test_hidden_states_parity():
    model, cfg, params = make_tiny()
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(
            torch.from_numpy(imgs).permute(0, 3, 1, 2), output_hidden_states=True
        )
    hidden = clip_vit_hidden_states(params, cfg, jnp.asarray(imgs))
    assert hidden.shape[0] == len(out.hidden_states)
    for i, ref in enumerate(out.hidden_states):
        np.testing.assert_allclose(
            np.asarray(hidden[i]), ref.numpy(), rtol=2e-4, atol=2e-4, err_msg=f"layer {i}"
        )


def test_tower_tuple_matches_feature_select():
    """feats = hidden[-2][:,1:], multi = concat(hidden[l] for l in layers)[:,1:]."""
    model, cfg, params = make_tiny()
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(
            torch.from_numpy(imgs).permute(0, 3, 1, 2), output_hidden_states=True
        )
    feats, multi = clip_tower_features(params, cfg, jnp.asarray(imgs))
    ref_feats = out.hidden_states[-2][:, 1:].numpy()
    ref_multi = torch.cat([out.hidden_states[l] for l in cfg.multi_layers], dim=2)[:, 1:].numpy()
    np.testing.assert_allclose(np.asarray(feats), ref_feats, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(multi), ref_multi, rtol=2e-4, atol=2e-4)
    n_patch = (cfg.image_size // cfg.patch_size) ** 2
    assert feats.shape == (2, n_patch, cfg.hidden_size)
    assert multi.shape == (2, n_patch, cfg.hidden_size * 4)


def test_vit_attention_kernel_matches_einsum():
    """The TPU tower-attention kernel (interpret mode on CPU) is numerically
    identical to the einsum path at both tiny and production-like geometry."""
    import jax
    import jax.numpy as jnp

    from tokenpacker_tpu.models.clip_vit import _attn_einsum
    from tokenpacker_tpu.ops.layers import init_linear, linear
    from tokenpacker_tpu.ops.vit_attention import vit_attention

    for (n, t, w, h) in [(2, 17, 32, 4), (1, 577, 128, 2)]:
        key = jax.random.PRNGKey(0)
        p = {
            name: init_linear(jax.random.fold_in(key, i), w, w)
            for i, name in enumerate(("q", "k", "v", "o"))
        }
        x = jax.random.normal(jax.random.fold_in(key, 9), (n, t, w), jnp.float32)
        ref = _attn_einsum(p, x, h)
        q, k, v = linear(p["q"], x), linear(p["k"], x), linear(p["v"], x)
        got = linear(p["o"], vit_attention(q, k, v, h, interpret=True))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_block_matches_xla(monkeypatch):
    """TOKENPACKER_VIT_BLOCK (ops/vit_block.py): the single-kernel
    transformer block must match the XLA block path."""
    import numpy as np

    from tokenpacker_tpu.config import tiny_vlm_config
    from tokenpacker_tpu.models.clip_vit import clip_tower_features, init_clip_vit

    cfg = tiny_vlm_config().vision
    params = init_clip_vit(jax.random.PRNGKey(0), cfg)
    images = np.random.default_rng(0).standard_normal(
        (2, cfg.image_size, cfg.image_size, 3)
    ).astype(np.float32)

    monkeypatch.delenv("TOKENPACKER_VIT_BLOCK", raising=False)
    ref_f, ref_m = clip_tower_features(params, cfg, images)
    monkeypatch.setenv("TOKENPACKER_VIT_BLOCK", "interpret")
    got_f, got_m = clip_tower_features(params, cfg, images)

    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m), rtol=2e-5, atol=2e-5)
