"""int8 weight-only quantization tests."""

import numpy as np

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.models.vlm import init_vlm, vlm_loss
from tokenpacker_tpu.ops.quantize import (
    dequantize_int8,
    dequantize_tree,
    quantize_int8,
    quantize_tree,
    tree_bytes,
)
from tests.test_train_step import _tiny_batch


def test_quant_roundtrip_error():
    w = jnp.asarray(np.random.default_rng(0).standard_normal((256, 128)), jnp.float32)
    q, s = quantize_int8(w)
    back = dequantize_int8(q, s, jnp.float32)
    # per-channel int8: max error bounded by scale/2
    max_err = float(jnp.max(jnp.abs(back - w)))
    max_scale = float(jnp.max(s))
    assert max_err <= max_scale * 0.51


def test_quantized_model_close_loss():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    qparams = quantize_tree(params, min_size=1)  # quantize everything 2D
    deq = dequantize_tree(qparams, jnp.float32)
    batch = _tiny_batch(cfg)
    l0, _ = vlm_loss(params, cfg, batch)
    l1, _ = vlm_loss(deq, cfg, batch)
    assert abs(float(l0) - float(l1)) < 0.2, (float(l0), float(l1))
    assert tree_bytes(qparams) < tree_bytes(params)


def test_int8_linear_path_in_llama():
    """linear() consumes quantized kernels: generation works with an int8 LM."""
    from tokenpacker_tpu.generate import Generator
    from tokenpacker_tpu.models.splice import build_splice_plan
    from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX

    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    params_q = dict(params)
    params_q["lm"] = quantize_tree(params["lm"], min_size=1)

    rng = np.random.default_rng(0)
    images = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids = np.array([1, 17, IMAGE_TOKEN_INDEX, 40], dtype=np.int64)
    plan = build_splice_plan([ids], [[(1, 1)]], cfg.tokens_per_view, "single", 7, 8, 0, pad_to=16)
    batch = {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_slot": plan.image_slot,
        "lengths": plan.lengths,
        "images": images,
    }
    out_q = Generator(params_q, cfg).generate(batch, max_new_tokens=3)
    out_f = Generator(params, cfg).generate(batch, max_new_tokens=3)
    assert len(out_q.sequences[0]) >= 1  # runs end-to-end on int8 weights
