"""Weight-only int8 quantization (the bitsandbytes-equivalent slot,
SURVEY.md §2.6 "bitsandbytes 4/8-bit" → int8 weight-only quant on TPU).

Per-output-channel symmetric int8: W ≈ q * scale, q int8, scale fp32 per
column. Used to hold frozen base weights during QLoRA-style runs
(train/lora.py) and for 8-bit serving loads (`load_8bit` in the reference's
load_pretrained_model, builder.py:29-40).

Dequant happens at use inside jit — XLA fuses int8→bf16 conversion into the
consuming matmul; a Pallas dequant-in-kernel matmul is a further
optimization for serving.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_int8(w: jnp.ndarray, axis: int = -2):
    """w: [..., in, out] → (q int8 [..., in, out], scale fp32 [..., 1, out]).

    Symmetric per-out-channel over the reduction (in) axis."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_int8(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scale).astype(dtype)


def quantize_tree(params, dtype=jnp.bfloat16, min_size: int = 1 << 16):
    """Quantize every 2D+ 'kernel' leaf bigger than min_size elements.

    Returns a pytree where quantized leaves become {'q': int8, 'scale':
    fp32} (detected structurally by those exact keys). Use `dequantize_tree`
    (inside jit) to recover compute-ready params."""

    def f(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        if leaf is None or "kernel" not in names or leaf.ndim < 2 or leaf.size < min_size:
            return leaf
        q, scale = quantize_int8(leaf)
        return {"q": q, "scale": scale}

    return jax.tree_util.tree_map_with_path(f, params)


def _is_qleaf(x):
    return isinstance(x, dict) and set(x.keys()) == {"q", "scale"}


def dequantize_tree(params, dtype=jnp.bfloat16):
    def f(x):
        if _is_qleaf(x):
            return dequantize_int8(x["q"], x["scale"], dtype)
        return x

    return jax.tree.map(f, params, is_leaf=lambda x: _is_qleaf(x) or x is None)


def tree_bytes(params) -> int:
    total = 0
    for leaf in jax.tree.leaves(params):
        if hasattr(leaf, "size") and hasattr(leaf, "dtype"):
            total += leaf.size * leaf.dtype.itemsize
    return total
