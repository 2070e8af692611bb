"""LoRA tests: adapter targeting, zero-init identity, training updates."""

import numpy as np
import optax

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.models.vlm import init_vlm, vlm_loss
from tokenpacker_tpu.train.lora import (
    LoraConfig,
    export_lora_state_dict,
    init_lora,
    lora_train_step_factory,
    merge_lora_params,
)
from tests.test_train_step import _tiny_batch


def test_lora_targets_lm_only():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    lora = init_lora(jax.random.PRNGKey(1), params, LoraConfig(r=4, alpha=8))
    assert lora["lm"]["layers"]["attn"]["q"]["kernel"] is not None
    assert lora["lm"]["layers"]["mlp"]["down"]["kernel"] is not None
    assert lora["lm"]["lm_head"]["kernel"] is None
    flat_vision = jax.tree.leaves(lora["vision"])
    assert flat_vision == []  # all None → no adapters on the tower
    assert jax.tree.leaves(lora["projector"]) == []


def test_zero_b_is_identity():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    lcfg = LoraConfig(r=4, alpha=8)
    lora = init_lora(jax.random.PRNGKey(1), params, lcfg)
    merged = merge_lora_params(params, lora, lcfg)
    batch = _tiny_batch(cfg)
    l0, _ = vlm_loss(params, cfg, batch)
    l1, _ = vlm_loss(merged, cfg, batch)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)


def test_lora_training_reduces_loss():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    lcfg = LoraConfig(r=4, alpha=8)
    lora = init_lora(jax.random.PRNGKey(1), params, lcfg)
    trainable = (lora, params["projector"])
    tx = optax.adam(1e-3)
    opt_state = tx.init(trainable)
    step = lora_train_step_factory(cfg, lcfg, tx)
    batch = _tiny_batch(cfg)
    losses = []
    for _ in range(6):
        trainable, opt_state, metrics = step(trainable, params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_export_lora_state_dict():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    lcfg = LoraConfig(r=4, alpha=8)
    lora = init_lora(jax.random.PRNGKey(1), params, lcfg)
    sd = export_lora_state_dict(lora, lcfg)
    n_layers = cfg.lm.num_hidden_layers
    assert "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight" in sd
    # 7 targets * 2 tensors * n_layers
    assert len(sd) == 7 * 2 * n_layers
    a = sd["base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight"]
    assert a.shape == (4, cfg.lm.hidden_size)  # [r, in] torch layout


def test_qlora_int8_base_adapters_active():
    """Regression: with an int8-quantized frozen base, adapters must
    actually influence the forward (they were silently dropped — the merge
    only handled dense kernels) and training must reduce the loss without
    densifying the base."""
    from tokenpacker_tpu.ops.quantize import quantize_tree, tree_bytes

    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    base = dict(params)
    base["lm"] = quantize_tree(params["lm"], min_size=1024)
    lcfg = LoraConfig(r=4, alpha=8)
    lora = init_lora(jax.random.PRNGKey(1), base, lcfg)
    # adapters exist over the quantized kernels
    assert lora["lm"]["layers"]["attn"]["q"]["kernel"] is not None

    batch = _tiny_batch(cfg)
    # zero-B identity still holds
    merged = merge_lora_params(base, lora, lcfg)
    # base stays quantized (no densification)
    assert tree_bytes(merged["lm"]) < tree_bytes(params["lm"])
    l0, _ = vlm_loss(base, cfg, batch)
    l1, _ = vlm_loss(merged, cfg, batch)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)

    # a nonzero B changes the loss (adapters are live)
    hot = jax.tree.map(lambda x: x + 0.05 if x is not None else None, lora)
    l2, _ = vlm_loss(merge_lora_params(base, hot, lcfg), cfg, batch)
    assert abs(float(l2) - float(l0)) > 1e-4

    # and training over the int8 base reduces loss
    trainable = (lora, base["projector"])
    tx = optax.adam(3e-3)
    opt_state = tx.init(trainable)
    step = lora_train_step_factory(cfg, lcfg, tx)
    losses = []
    for _ in range(6):
        trainable, opt_state, metrics = step(trainable, base, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_qlora_int8_matches_dense_merge_numerics():
    """The attached-adapter formulation equals mathematically merging the
    dequantized base with the same adapters."""
    from tokenpacker_tpu.ops.layers import linear
    from tokenpacker_tpu.ops.quantize import dequantize_int8, quantize_int8

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 48)) * 0.02, jnp.float32)
    q, scale = quantize_int8(w)
    a = jnp.asarray(rng.standard_normal((64, 4)) * 0.01, jnp.float32)
    b = jnp.asarray(rng.standard_normal((4, 48)) * 0.01, jnp.float32)
    x = jnp.asarray(rng.standard_normal((3, 64)), jnp.float32)
    got = linear({"kernel": {"q": q, "scale": scale, "lora_a": a, "lora_b": b}}, x)
    ref = x @ (dequantize_int8(q, scale, jnp.float32) + a @ b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
