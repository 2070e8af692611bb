"""Training step tests: stage-wise freezing, loss decrease, grad flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from tokenpacker_tpu.models.splice import build_splice_plan
from tokenpacker_tpu.models.vlm import init_vlm, vlm_loss
from tokenpacker_tpu.train.step import TrainConfig, make_optimizer, make_train_step


def _tiny_batch(cfg, n=2, seed=0):
    rng = np.random.default_rng(seed)
    ids = np.array([1, 5, IMAGE_TOKEN_INDEX, 9, 10, 11, 12], dtype=np.int64)
    labels = np.array([IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 9, 10, 11, 12], dtype=np.int64)
    plan = build_splice_plan(
        [ids] * n, [[(1, 1)]] * n, cfg.tokens_per_view, "single", 0, 0, 0,
        labels=[labels] * n, pad_to=24,
    )
    l = plan.token_ids.shape[1]
    imgs = rng.standard_normal((n, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(
        np.float32
    )
    return {
        "images": jnp.asarray(imgs),
        "token_ids": jnp.asarray(plan.token_ids),
        "is_image": jnp.asarray(plan.is_image),
        "image_slot": jnp.asarray(plan.image_slot),
        "positions": jnp.broadcast_to(jnp.arange(l), (n, l)),
        "key_valid": jnp.asarray(plan.attn_mask),
        "labels": jnp.asarray(plan.labels),
    }


def test_loss_finite_and_grads_flow():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    batch = _tiny_batch(cfg)
    (loss, metrics), grads = jax.value_and_grad(vlm_loss, has_aux=True)(params, cfg, batch)
    assert np.isfinite(float(loss))
    # projector and LM get gradients; frozen tower gets zeros (stop_gradient)
    pg = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()), grads["projector"], 0.0)
    lg = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()), grads["lm"], 0.0)
    vg = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()), grads["vision"], 0.0)
    assert pg > 0 and lg > 0
    assert vg == 0.0


def test_pretrain_stage_only_updates_projector():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(stage="pretrain", learning_rate=1e-3, total_steps=10)
    tx = make_optimizer(tcfg, params)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx)
    # warmup starts at lr=0, so take a few steps before comparing
    new_params, new_opt_state = params, opt_state
    for _ in range(3):
        new_params, new_opt_state, metrics = step(new_params, new_opt_state, _tiny_batch(cfg))

    def changed(a, b):
        return any(
            float(jnp.abs(x - y).max()) > 0 for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    assert changed(params["projector"], new_params["projector"])
    assert not changed(params["lm"], new_params["lm"])
    assert not changed(params["vision"], new_params["vision"])


def test_finetune_loss_decreases():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(stage="finetune", learning_rate=1e-3, mm_projector_lr=2e-3, total_steps=30)
    tx = make_optimizer(tcfg, params)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx)
    batch = _tiny_batch(cfg)
    losses = []
    for _ in range(8):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_gradient_accumulation_matches_large_batch():
    """VERDICT r2 item 4: MultiSteps(k) over k equal-size microbatches must
    equal one step over the k-times-larger batch (grad mean == concat-batch
    grad when the microbatches have identical valid-token counts, as these
    do). This is how the reference reproduces global batch 256/128 on 8
    GPUs (scripts/v1_5/pretrain.sh batch math)."""
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    k = 2
    micro = [_tiny_batch(cfg, n=2, seed=s) for s in range(k)]
    big = {
        key: (jnp.concatenate([m[key] for m in micro], axis=0)
              if key != "images" else jnp.concatenate([m[key] for m in micro], axis=0))
        for key in micro[0]
    }

    tcfg = TrainConfig(stage="finetune", learning_rate=1e-3, total_steps=10)
    tx_accum = make_optimizer(
        TrainConfig(stage="finetune", learning_rate=1e-3, total_steps=10,
                    gradient_accumulation_steps=k),
        params,
    )
    tx_big = make_optimizer(tcfg, params)

    step_accum = make_train_step(cfg, tx_accum)
    step_big = make_train_step(cfg, tx_big)

    pa, sa = params, tx_accum.init(params)
    for m in micro:
        pa_next, sa, _ = step_accum(pa, sa, m)
        # mid-accumulation micro-steps must not touch the params
        if m is micro[0]:
            same = all(
                float(jnp.abs(x - y).max()) == 0
                for x, y in zip(jax.tree.leaves(pa_next), jax.tree.leaves(pa))
            )
            assert same, "params changed before the accumulation window closed"
        pa = pa_next

    pb, sb, _ = step_big(params, tx_big.init(params), big)

    for x, y in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("mode", ["1", "dots", "dots:1", "dots:0", "dots:99"])
def test_remat_matches_no_remat(mode, monkeypatch):
    """TOKENPACKER_REMAT (per-layer jax.checkpoint on the training path)
    must not change loss or gradients — only memory/recompute scheduling.
    "dots" is the save-matmul-outputs policy (train.py --remat dots);
    "dots:K" is the hybrid split (full remat + dots on the last K layers,
    K clamped to the depth)."""
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    batch = _tiny_batch(cfg)

    monkeypatch.delenv("TOKENPACKER_REMAT", raising=False)
    (l0, _), g0 = jax.value_and_grad(vlm_loss, has_aux=True)(params, cfg, batch)
    monkeypatch.setenv("TOKENPACKER_REMAT", mode)
    (l1, _), g1 = jax.value_and_grad(vlm_loss, has_aux=True)(params, cfg, batch)

    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
