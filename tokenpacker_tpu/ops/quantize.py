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


# ---------------------------------------------------------------------------
# 4-bit: blockwise absmax, int4 (symmetric) or NF4 (QLoRA codebook)
# ---------------------------------------------------------------------------

# NormalFloat4 codebook (QLoRA paper, appendix E / bitsandbytes
# functional.create_normal_map): 16 quantiles of N(0,1) normalized to [-1,1].
NF4_VALUES = (
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
)
NF4_CODE = jnp.asarray(NF4_VALUES, jnp.float32)


def quantize_4bit(w: jnp.ndarray, block: int = 64, quant_type: str = "nf4"):
    """w: [in, out] → {'q4:<quant_type>:<block>': packed uint8, 'absmax'}.

    Blockwise over the IN (reduction) axis: each column's consecutive
    `block` rows share one absmax (the bitsandbytes load_4bit slot,
    reference builder.py:29-40; blocks along `in` keep dequant a cheap
    row-broadcast on TPU instead of bnb's flat row-major blocks).
    q4 packs two 4-bit codes per uint8: row 2i in the low nibble, 2i+1 in
    the high nibble.
    """
    k, n = w.shape
    assert k % block == 0 and k % 2 == 0, (k, block)
    wf = w.astype(jnp.float32).reshape(k // block, block, n)
    absmax = jnp.max(jnp.abs(wf), axis=1)  # [k/block, n]
    safe = jnp.where(absmax == 0, 1.0, absmax)
    norm = (wf / safe[:, None, :]).reshape(k, n)  # in [-1, 1]
    if quant_type == "nf4":
        # nearest codebook entry
        idx = jnp.argmin(jnp.abs(norm[..., None] - NF4_CODE), axis=-1).astype(jnp.uint8)
    elif quant_type == "int4":
        # symmetric round to [-7, 7], stored biased by +8 in [1, 15]
        idx = (jnp.clip(jnp.round(norm * 7.0), -7, 7) + 8).astype(jnp.uint8)
    else:
        raise ValueError(f"unknown quant_type {quant_type}")
    lo = idx[0::2]
    hi = idx[1::2]
    packed = (lo | (hi << 4)).astype(jnp.uint8)  # [k/2, n]
    # quant_type/block live in the KEY so the leaf dict contains only array
    # leaves (lax.scan slices every xs leaf along axis 0)
    return {f"q4:{quant_type}:{block}": packed, "absmax": absmax.astype(jnp.float32)}


def q4_meta(q: dict):
    """(packed_key, quant_type, block) from a q4 leaf dict."""
    key = next(k for k in q if k.startswith("q4:"))
    _, quant_type, block = key.split(":")
    return key, quant_type, int(block)


def dequantize_4bit(q: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Inverse of quantize_4bit → dense [in, out] (leading dims pass through)."""
    key, quant_type, block = q4_meta(q)
    packed = q[key]
    k2, n = packed.shape[-2:]
    lead = packed.shape[:-2]
    k = k2 * 2
    lo = (packed & 0xF).astype(jnp.int32)
    hi = (packed >> 4).astype(jnp.int32)
    idx = jnp.stack([lo, hi], axis=-2).reshape(*lead, k, n)
    if quant_type == "nf4":
        norm = NF4_CODE[idx]
    else:
        norm = (idx.astype(jnp.float32) - 8.0) / 7.0
    w = norm.reshape(*lead, k // block, block, n) * q["absmax"][..., :, None, :]
    return w.reshape(*lead, k, n).astype(dtype)


def _is_q4leaf(x):
    return isinstance(x, dict) and any(k.startswith("q4:") for k in x)


def quantize_tree_4bit(params, quant_type: str = "nf4", block: int = 64,
                       min_size: int = 1 << 16):
    """4-bit analog of quantize_tree: 2D 'kernel' leaves → q4 dicts.

    Leaves whose in-dim is not divisible by (block, 2) stay dense."""

    def f(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        if leaf is None or "kernel" not in names or leaf.ndim < 2 or leaf.size < min_size:
            return leaf
        if leaf.shape[-2] % block or leaf.shape[-2] % 2:
            return leaf
        if leaf.ndim == 2:
            return quantize_4bit(leaf, block, quant_type)
        # stacked layers [L, in, out]: quantize each slice, stack arrays
        slices = [quantize_4bit(leaf[i], block, quant_type) for i in range(leaf.shape[0])]
        pk = next(k for k in slices[0] if k.startswith("q4:"))
        return {
            pk: jnp.stack([s[pk] for s in slices]),
            "absmax": jnp.stack([s["absmax"] for s in slices]),
        }

    return jax.tree_util.tree_map_with_path(f, params)


def fuse_llama_layers(lm_params):
    """Fuse q/k/v → qkv and gate/up → gateup kernels in a LLaMA param tree
    (stacked-layer layout). models/llama._layer consumes either layout; the
    fused one halves matmul dispatches on the quantized decode path (each
    Pallas call costs ~55us on v5e regardless of size)."""
    layers = dict(lm_params["layers"])
    attn = dict(layers["attn"])
    mlp = dict(layers["mlp"])
    qkv = jnp.concatenate(
        [attn["q"]["kernel"], attn["k"]["kernel"], attn["v"]["kernel"]], axis=-1
    )
    gateup = jnp.concatenate([mlp["gate"]["kernel"], mlp["up"]["kernel"]], axis=-1)
    attn = {"qkv": {"kernel": qkv}, "o": attn["o"]}
    mlp = {"gateup": {"kernel": gateup}, "down": mlp["down"]}
    layers["attn"] = attn
    layers["mlp"] = mlp
    return {**lm_params, "layers": layers}


def dequantize_tree_4bit(params, dtype=jnp.bfloat16):
    def f(x):
        if _is_q4leaf(x):
            return dequantize_4bit(x, dtype)
        return x

    return jax.tree.map(f, params, is_leaf=lambda x: _is_q4leaf(x) or x is None)


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


def pack_int8_rows(q):
    """[..., K, N] int8 → [..., K/2, N] uint16: adjacent ROWS bit-packed
    into one 16-bit lane (lo byte = row 2r, hi byte = row 2r+1, same
    column).

    Why: the v5e DMA engine streams 16-bit VMEM tiles at ~2.5x the byte
    rate of int8's (32, 128)-packed tile format (measured 728 vs 294 GB/s
    — ROADMAP round-3), and the fused decode kernel is weight-DMA-bound.
    The pairing matches pltpu.bitcast's sublane semantics exactly
    (scripts/probe_bitcast_pack.py), so the kernel recovers int8 rows with
    a free in-VMEM bitcast. uint16 (not bf16): float-typed copies can
    quietly canonicalize sNaN bit patterns (measured in interpret mode —
    lo-byte bit 6 flipped wherever the exponent field was 0xFF); integer
    lanes are bit-safe everywhere."""
    assert q.shape[-2] % 2 == 0, "row count must be even to pack"
    u16 = jax.lax.bitcast_convert_type(q, jnp.uint8).astype(jnp.uint16)
    lo = u16[..., 0::2, :]
    hi = u16[..., 1::2, :]
    return (lo | (hi << 8)).astype(jnp.uint16)


def unpack_int8_rows(qp):
    """Inverse of pack_int8_rows (XLA ops — used by the fallback matmul
    path and CPU tests; the fused kernel uses the free pltpu.bitcast)."""
    u16 = qp
    lo = (u16 & jnp.uint16(0xFF)).astype(jnp.uint8)
    hi = (u16 >> jnp.uint16(8)).astype(jnp.uint8)
    inter = jnp.stack([lo, hi], axis=-2)  # [..., K/2, 2, N]
    out_shape = (*u16.shape[:-2], 2 * u16.shape[-2], u16.shape[-1])
    return jax.lax.bitcast_convert_type(inter.reshape(out_shape), jnp.int8)


def pack_fused_weights(lm_params):
    """Convert the four streamed int8 matrices of the fused llama layout
    (attn.qkv / attn.o / mlp.gateup / mlp.down) from {'q': int8 [L, K, N]}
    to {'qp': uint16 [L, K/2, N]} for the fast-DMA fused decode kernel
    (TOKENPACKER_FD_PACK=1). Other paths unpack on the fly
    (ops/layers.linear) — correct everywhere, fast where it matters."""
    layers = dict(lm_params["layers"])
    attn = dict(layers["attn"])
    mlp = dict(layers["mlp"])

    def repack(leaf):
        k = leaf.get("kernel")
        if not (isinstance(k, dict) and "q" in k and k["q"].dtype == jnp.int8):
            return leaf
        if "lora_a" in k or k["q"].shape[-2] % 2:
            return leaf
        nk = {kk: v for kk, v in k.items() if kk != "q"}
        # pack_int8_rows builds a full-size uint16 intermediate (2x the
        # int8 bytes — 5.8 GB for a 7B gateup stack): map over the layer
        # axis so the transient is per-layer (~90 MB), or packing a full
        # int8 7B on one v5e OOMs (RESOURCE_EXHAUSTED, measured)
        qv = k["q"]
        nk["qp"] = jax.lax.map(pack_int8_rows, qv) if qv.ndim == 3 else pack_int8_rows(qv)
        return {**leaf, "kernel": nk}

    for d, name in ((attn, "qkv"), (attn, "o"), (mlp, "gateup"), (mlp, "down")):
        if name in d:
            d[name] = repack(d[name])
    layers["attn"] = attn
    layers["mlp"] = mlp
    return {**lm_params, "layers": layers}
