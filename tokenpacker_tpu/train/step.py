"""Training step: optax optimizer with per-group LRs + jitted SPMD step.

Reference recipe parity (scripts/v1_5/pretrain.sh, finetune.sh,
llava_trainer.py:150-237):
- stage 1 ("pretrain"): only the projector trains, lr 1e-3
- stage 2 ("finetune"): LLM + projector train; optional separate
  `mm_projector_lr` group; vision tower always frozen
- cosine decay with 3% linear warmup, AdamW(β1=0.9, β2=0.999, wd=0)
- ZeRO sharding comes from NamedShardings (parallel/sharding.py), not from
  the optimizer — optax state inherits the param shardings.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import optax

from tokenpacker_tpu.config import TokenPackerVLMConfig
from tokenpacker_tpu.models.vlm import vlm_loss


@dataclass(frozen=True)
class TrainConfig:
    stage: str = "finetune"  # "pretrain" | "finetune"
    learning_rate: float = 2e-5
    mm_projector_lr: float | None = None  # None → same as learning_rate
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    max_grad_norm: float = 1.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    gradient_accumulation_steps: int = 1


def _group_of(path) -> str:
    top = str(getattr(path[0], "key", path[0]))
    if top == "vision":
        return "frozen"
    if top == "projector":
        return "projector"
    return "lm"


def param_groups(params):
    return jax.tree_util.tree_map_with_path(lambda path, _: _group_of(path), params)


def _schedule(base_lr: float, tcfg: TrainConfig):
    warmup = max(int(tcfg.total_steps * tcfg.warmup_ratio), 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=warmup,
        decay_steps=max(tcfg.total_steps, warmup + 1),
        end_value=0.0,
    )


def make_optimizer(tcfg: TrainConfig, params) -> optax.GradientTransformation:
    labels = param_groups(params)

    def adamw(lr_schedule):
        return optax.chain(
            optax.clip_by_global_norm(tcfg.max_grad_norm),
            optax.adamw(
                lr_schedule,
                b1=tcfg.adam_b1,
                b2=tcfg.adam_b2,
                eps=tcfg.adam_eps,
                weight_decay=tcfg.weight_decay,
            ),
        )

    proj_lr = tcfg.mm_projector_lr or tcfg.learning_rate
    transforms = {
        "frozen": optax.set_to_zero(),
        "projector": adamw(_schedule(proj_lr, tcfg)),
        "lm": adamw(_schedule(tcfg.learning_rate, tcfg))
        if tcfg.stage != "pretrain"
        else optax.set_to_zero(),
    }
    tx = optax.multi_transform(transforms, labels)
    if tcfg.gradient_accumulation_steps > 1:
        # the reference reaches its global batch (256/128) via DeepSpeed
        # grad accumulation; optax.MultiSteps is the in-graph equivalent
        tx = optax.MultiSteps(tx, every_k_schedule=tcfg.gradient_accumulation_steps)
    return tx


@partial(jax.jit, static_argnames=("cfg", "tx"), donate_argnums=(0, 1))
def train_step(params, opt_state, batch, cfg: TokenPackerVLMConfig, tx):
    """One SPMD training step. Shardings flow in from the arguments."""
    (loss, metrics), grads = jax.value_and_grad(vlm_loss, has_aux=True)(params, cfg, batch)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    metrics = {**metrics, "grad_norm": optax.global_norm(grads)}
    return params, opt_state, metrics


def make_train_step(cfg: TokenPackerVLMConfig, tx):
    """Bind cfg/tx statically; returns step(params, opt_state, batch)."""

    @jax.jit
    def step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(vlm_loss, has_aux=True)(params, cfg, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {**metrics, "grad_norm": optax.global_norm(grads)}
        return params, opt_state, metrics

    return step
