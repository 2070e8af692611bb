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
