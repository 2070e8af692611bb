"""End-to-end VLM with the MPT decoder family (LlavaMPT parity slot)."""

import numpy as np

import jax

from tokenpacker_tpu.config import LMConfig, tiny_vlm_config
from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX
from tokenpacker_tpu.generate import Generator
from tokenpacker_tpu.models.splice import build_splice_plan
from tokenpacker_tpu.models.vlm import init_vlm, vlm_loss
from tests.test_train_step import _tiny_batch


def mpt_tiny_cfg():
    lm = LMConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        model_family="mpt",
        alibi=True,
        tie_word_embeddings=True,
    )
    return tiny_vlm_config(lm=lm)


def test_mpt_vlm_loss_and_grads():
    cfg = mpt_tiny_cfg()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    batch = _tiny_batch(cfg)
    (loss, _), grads = jax.value_and_grad(vlm_loss, has_aux=True)(params, cfg, batch)
    assert np.isfinite(float(loss))
    g = jax.tree.reduce(lambda a, b: a + float(jax.numpy.abs(b).sum()), grads["lm"], 0.0)
    assert g > 0


def test_mpt_vlm_generation():
    cfg = mpt_tiny_cfg()
    params = init_vlm(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(0)
    images = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids = np.array([1, 17, IMAGE_TOKEN_INDEX, 40], dtype=np.int64)
    plan = build_splice_plan([ids], [[(1, 1)]], cfg.tokens_per_view, "single", 7, 8, 0, pad_to=16)
    gen = Generator(params, cfg)
    out = gen.generate(
        {
            "token_ids": plan.token_ids,
            "is_image": plan.is_image,
            "image_slot": plan.image_slot,
            "lengths": plan.lengths,
            "images": images,
        },
        max_new_tokens=4,
    )
    assert len(out.sequences[0]) >= 1
