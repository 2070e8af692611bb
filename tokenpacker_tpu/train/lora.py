"""LoRA fine-tuning for the VLM pytrees.

Reference parity (SURVEY.md §2.3 "Quantized/LoRA training",
train.py:168-181 find_all_linear_names, llava_trainer lora splitting):
adapters attach to every LM linear except lm_head, and never to the
multimodal modules (tower/projector) — the projector trains in full
precision alongside, like the reference's `mm_projector_lr` group.

Functional formulation: a `lora` pytree parallels the base params; the
merged weight W + (alpha/r)·A@B is materialized inside the jitted step
(XLA fuses the small matmuls). Gradients flow only to the lora tree (and
optionally projector), so optimizer state is tiny — the TPU stand-in for
bitsandbytes QLoRA's memory savings (base weights can additionally be kept
in int8 via quantize.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class LoraConfig:
    r: int = 128
    alpha: int = 256
    dropout: float = 0.05  # applied to the A-side input during training
    train_projector: bool = True


_TARGET_LEAVES = ("q", "k", "v", "o", "gate", "up", "down")


def _is_target(path) -> bool:
    names = [str(getattr(p, "key", p)) for p in path]
    if not names or names[0] != "lm":
        return False
    if "lm_head" in names or "embed" in names:
        return False
    return names[-1] == "kernel" and names[-2] in _TARGET_LEAVES


def _is_quant_leaf(x) -> bool:
    return isinstance(x, dict) and (
        "q" in x and "scale" in x or any(k.startswith("q4:") for k in x)
    )


def _quant_leaf_shape_dtype(x):
    if "q" in x:
        return x["q"].shape, jnp.bfloat16
    key = next(k for k in x if k.startswith("q4:"))
    packed = x[key]
    return (*packed.shape[:-2], packed.shape[-2] * 2, packed.shape[-1]), jnp.bfloat16


def init_lora(key, params, cfg: LoraConfig):
    """Build the adapter tree: {path: {'a': [.., in, r], 'b': [.., r, out]}}
    for every target kernel (stacked-layer leading dims preserved). Works on
    dense AND quantized (int8/q4) base trees — QLoRA initializes adapters
    over the already-quantized frozen base (reference train.py:827-874)."""

    def make(path, leaf):
        if leaf is None or not _is_target(path):
            return None
        if _is_quant_leaf(leaf):
            shape, dtype = _quant_leaf_shape_dtype(leaf)
        else:
            shape, dtype = leaf.shape, leaf.dtype
        *batch_dims, d_in, d_out = shape
        k = jax.random.fold_in(key, hash(jax.tree_util.keystr(path)) % (2**31))
        a = jax.random.normal(k, (*batch_dims, d_in, cfg.r), dtype) * 0.01
        b = jnp.zeros((*batch_dims, cfg.r, d_out), dtype)
        return {"a": a, "b": b}

    return jax.tree_util.tree_map_with_path(
        make, params, is_leaf=lambda x: x is None or _is_quant_leaf(x)
    )


def merge_lora_params(params, lora, cfg: LoraConfig):
    """Effective params: W + (alpha/r) * A @ B for dense kernels.

    Quantized kernels (int8 {'q','scale'} / 4-bit 'q4:*' dicts) are NOT
    densified — bnb-QLoRA semantics keep the frozen base quantized and add
    the low-rank term beside it: the adapter (with the alpha/r scale folded
    into B) is attached to the leaf dict and ops/layers.linear computes
    y = x @ W_q + (x @ A) @ B."""
    scale = cfg.alpha / cfg.r

    def merge(path, leaf):
        if leaf is None:
            return leaf
        # walk the lora tree by path
        node = lora
        for p in path:
            key = getattr(p, "key", None)
            if key is None:
                return leaf
            if not isinstance(node, dict) or key not in node:
                return leaf
            node = node[key]
        if node is None or not isinstance(node, dict) or "a" not in node:
            return leaf
        if _is_quant_leaf(leaf):
            return {**leaf, "lora_a": node["a"],
                    "lora_b": (node["b"] * scale).astype(node["b"].dtype)}
        delta = jnp.einsum("...ir,...ro->...io", node["a"], node["b"]) * scale
        return leaf + delta.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(
        merge, params, is_leaf=lambda x: x is None or _is_quant_leaf(x)
    )


def lora_train_step_factory(vlm_cfg, lcfg: LoraConfig, tx):
    """Returns step(lora, proj_params, base_params, opt_state, batch).

    trainable = (lora, projector); base stays frozen (and may be int8 —
    dequantized inside merge)."""
    from tokenpacker_tpu.models.vlm import vlm_loss

    def loss_fn(trainable, base_params, batch):
        lora, proj = trainable
        params = dict(base_params)
        params["projector"] = proj if lcfg.train_projector else base_params["projector"]
        params = merge_lora_params(params, lora, lcfg)
        return vlm_loss(params, vlm_cfg, batch)

    @jax.jit
    def step(trainable, base_params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, base_params, batch
        )
        import optax

        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, metrics

    return step


def export_lora_state_dict(lora, cfg: LoraConfig) -> dict:
    """Reference-style adapter dict: base_model.model.<module>.lora_A/B
    weights, [r, in] / [out, r] torch layout, per stacked layer."""
    import numpy as np

    out = {}

    def walk(node, path):
        if node is None:
            return
        if isinstance(node, dict) and "a" in node:
            a = np.asarray(node["a"], np.float32)
            b = np.asarray(node["b"], np.float32)
            name = _torch_name(path)
            if a.ndim == 3:  # stacked layers
                for i in range(a.shape[0]):
                    n = name.replace("layers.", f"layers.{i}.")
                    out[f"base_model.model.{n}.lora_A.weight"] = a[i].T
                    out[f"base_model.model.{n}.lora_B.weight"] = b[i].T
            else:
                out[f"base_model.model.{name}.lora_A.weight"] = a.T
                out[f"base_model.model.{name}.lora_B.weight"] = b.T
            return
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])

    walk(lora, [])
    return out


_NAME_MAP = {
    "q": "self_attn.q_proj", "k": "self_attn.k_proj", "v": "self_attn.v_proj",
    "o": "self_attn.o_proj", "gate": "mlp.gate_proj", "up": "mlp.up_proj",
    "down": "mlp.down_proj",
}


def _torch_name(path) -> str:
    # path like ['lm', 'layers', 'attn', 'q', 'kernel']
    mod = _NAME_MAP[path[-2]]
    return f"model.layers.{mod}"
