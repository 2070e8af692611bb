"""Primitive NN ops with torch-matching numerics.

All parameters live in plain pytrees (dicts of jnp arrays). Linear kernels are
stored **[in, out]** (x @ W, the TPU/MXU-friendly layout); the HF importer
transposes torch's [out, in] once at load time (see io/hf_import.py).

Numerical parity notes (vs the reference's torch modules):
- `gelu`: torch `nn.GELU()` default is the *exact* erf formulation, while
  `jax.nn.gelu`'s default is tanh-approx — we always pass approximate=False.
- `layer_norm`: matches torch `nn.LayerNorm` (biased variance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def linear(params, x):
    """y = x @ kernel + bias. kernel: [in, out]; bias optional.

    int8 weight-only kernels (ops/quantize.quantize_tree leaves) are consumed
    directly: y = (x @ q) * scale — the int8→compute-dtype cast fuses into
    the matmul read and the per-out-channel scale is a cheap column rescale,
    so the dense weight never materializes in HBM (8-bit serving path).
    """
    k = params["kernel"]
    if isinstance(k, dict) and "qp" in k:
        # u16-row-packed int8 (ops/quantize.pack_fused_weights — the fast
        # DMA storage for the fused decode kernel). This fallback unpacks
        # on the fly: correct everywhere, fast only where it matters (the
        # kernel consumes qp via a free in-VMEM bitcast).
        from tokenpacker_tpu.ops.quantize import unpack_int8_rows

        y = x @ unpack_int8_rows(k["qp"]).astype(x.dtype)
        y = y * jnp.squeeze(k["scale"], axis=-2).astype(x.dtype)
    elif isinstance(k, dict) and "q" in k:
        import os

        import jax

        m = 1
        for s in x.shape[:-1]:
            m *= s
        if (os.environ.get("TOKENPACKER_W8A8") == "1" and k["q"].ndim == 2
                and jax.default_backend() == "tpu" and m <= 64):
            # m <= 64 covers single-stream decode, batched cb decode, and
            # speculative verify rounds (slots x (k+1) rows)
            # opt-in decode GEMV on the native int8 MXU path (per-token
            # activation quant) — 1.62x the convert-in-dot GEMV on v5e;
            # see ops/q8_matmul.py for the numerics tradeoff
            from tokenpacker_tpu.ops.q8_matmul import w8a8_matmul

            y = w8a8_matmul(x, k)
        elif (os.environ.get("TOKENPACKER_W8A8") == "1" and k["q"].ndim == 2
                and jax.default_backend() == "tpu" and m >= 256
                and x.shape[-1] % 128 == 0 and k["q"].shape[1] % 128 == 0):
            # large-M regime (ViT tower batches, prefill): tiled w8a8 GEMM
            # with in-kernel activation quant — the int8 MXU runs at 2x the
            # bf16 FLOP rate on v5e (see ops/s8_gemm.py)
            from tokenpacker_tpu.ops.s8_gemm import w8a8_gemm

            y = w8a8_gemm(x, k)
        else:
            y = x @ k["q"].astype(x.dtype)
            y = y * jnp.squeeze(k["scale"], axis=-2).astype(x.dtype)
        if "lora_a" in k:  # QLoRA: low-rank term beside the frozen int8 base
            y = y + (x @ k["lora_a"].astype(x.dtype)) @ k["lora_b"].astype(x.dtype)
    elif isinstance(k, dict) and any(s.startswith("q4:") for s in k):
        # 4-bit weight-only (nf4/int4, ops/quantize.quantize_tree_4bit):
        # on TPU with a small left operand (decode GEMV) the Pallas
        # dequant-in-kernel matmul avoids materializing the dense weight;
        # otherwise dequantize and let XLA take the dense matmul.
        import jax

        from tokenpacker_tpu.ops.quantize import dequantize_4bit

        m = 1
        for s in x.shape[:-1]:
            m *= s
        if jax.default_backend() == "tpu" and m <= 32:
            from tokenpacker_tpu.ops.q4_matmul import q4_matmul

            y = q4_matmul(x, k)
        else:
            y = x @ dequantize_4bit(k, x.dtype)
        if "lora_a" in k:  # QLoRA over a 4-bit frozen base
            y = y + (x @ k["lora_a"].astype(x.dtype)) @ k["lora_b"].astype(x.dtype)
    else:
        y = x @ k
    a = params.get("slot_lora_a")
    if a is not None:
        # multi-LoRA serving term (serve/multi_lora.py): all n adapters'
        # rank-r products computed (tiny vs the base matmul) and combined
        # by each batch row's one-hot selection — an all-zero row selects
        # the base model exactly.
        b = params["slot_lora_b"]
        sel = params["slot_lora_sel"].astype(x.dtype)
        xa = jnp.einsum("b...d,ndr->b...nr", x, a.astype(x.dtype))
        ctx = jnp.einsum("b...nr,nro->b...no", xa, b.astype(x.dtype))
        y = y + jnp.einsum("b...no,bn->b...o", ctx, sel)
    if params.get("bias") is not None:
        y = y + params["bias"]
    return y


def init_linear(key, in_dim, out_dim, bias=True, std=0.02, dtype=jnp.float32):
    """trunc_normal(std) weights + zero bias (reference projector init,
    builder.py:87-94)."""
    w = std * jax.random.truncated_normal(key, -2.0, 2.0, (in_dim, out_dim))
    p = {"kernel": w.astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def layer_norm(params, x, eps=1e-5):
    """torch-compatible LayerNorm over the last axis, computed in fp32."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def init_layer_norm(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def rms_norm(params, x, eps=1e-5):
    """LLaMA RMSNorm: normalize in fp32, scale in input dtype (HF semantics)."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = (x32 * jax.lax.rsqrt(var + eps)).astype(orig_dtype)
    return y * params["scale"]


def init_rms_norm(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype)}


def gelu(x):
    """Exact (erf) GELU — torch nn.GELU() default."""
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x):
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def silu(x):
    return jax.nn.silu(x)


def mlp_gelu(params, x):
    """Linear → GELU → Linear (the reference's 2-layer MLP pattern)."""
    return linear(params["fc2"], gelu(linear(params["fc1"], x)))


def init_mlp_gelu(key, in_dim, hidden_dim, out_dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, in_dim, hidden_dim, dtype=dtype),
        "fc2": init_linear(k2, hidden_dim, out_dim, dtype=dtype),
    }


def bilinear_resize_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] 1-D interpolation matrix reproducing torch
    `F.interpolate(mode='bilinear', align_corners=False, antialias=False)`.

    Out pixel i samples input position (i+0.5)*src/dst - 0.5 with a 2-tap
    triangle kernel and edge clamping. Separable: apply along rows then cols.
    The projector's coarse-query downsample (reference builder.py:117) is this
    exact gather — as a dense matmul it runs on the MXU instead of a gather.
    """
    w = np.zeros((dst, src), dtype=np.float64)
    scale = src / dst
    for i in range(dst):
        pos = (i + 0.5) * scale - 0.5
        i0 = int(np.floor(pos))
        frac = pos - i0
        i0c = min(max(i0, 0), src - 1)
        i1c = min(max(i0 + 1, 0), src - 1)
        w[i, i0c] += 1.0 - frac
        w[i, i1c] += frac
    return w.astype(np.float32)


def bilinear_downsample_2d(x, dst_h: int, dst_w: int):
    """x: [..., H, W, C] → [..., dst_h, dst_w, C] in fp32 (reference
    builder.py:117 forces .float() for this resize)."""
    h, w = x.shape[-3], x.shape[-2]
    wh = jnp.asarray(bilinear_resize_matrix(h, dst_h))
    ww = jnp.asarray(bilinear_resize_matrix(w, dst_w))
    y = x.astype(jnp.float32)
    y = jnp.einsum("oh,...hwc->...owc", wh, y)
    y = jnp.einsum("pw,...owc->...opc", ww, y)
    return y
