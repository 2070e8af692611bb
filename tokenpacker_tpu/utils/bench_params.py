"""On-device random parameter builders for benchmarks.

Random params must be materialized by ONE jitted program on the device —
per-op dispatch or multi-GB host→device transfers don't survive the axon
tunnel (CLAUDE.md). Shared by bench.py, scripts/bench_hd.py, and ad-hoc
measurements so the int8/int4 fake-quantization layouts stay consistent
with ops/quantize.py's real ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_params_like(shapes, seed: int = 0):
    """Dense random params with the given eval_shape tree."""

    @jax.jit
    def make():
        key = jax.random.PRNGKey(seed)
        leaves, td = jax.tree.flatten(shapes)
        out = [
            0.02 * jax.random.normal(jax.random.fold_in(key, i), l.shape, jnp.float32).astype(l.dtype)
            for i, l in enumerate(leaves)
        ]
        return jax.tree.unflatten(td, out)

    return make()


def transformed_params_like(shapes, seed: int = 0, transform=None):
    """Materialize `transform(dense_random_tree)` as ONE jitted program.

    The dense base regenerates deterministically from `seed` inside the
    program (same fold_in indices as random_params_like over the same
    shapes tree), so quantized trees built with different transforms share
    the EXACT same underlying values without the dense tree ever
    co-residing with the quantized one in HBM — the numeric-fidelity rig
    (scripts/quant_fidelity.py, docs/kernels.md) depends on this."""

    @jax.jit
    def make():
        key = jax.random.PRNGKey(seed)
        leaves, td = jax.tree.flatten(shapes)
        dense = jax.tree.unflatten(td, [
            0.02 * jax.random.normal(
                jax.random.fold_in(key, i), l.shape, jnp.float32
            ).astype(l.dtype)
            for i, l in enumerate(leaves)
        ])
        return transform(dense) if transform is not None else dense

    return make()


def _is_big_lm_kernel(names, leaf) -> bool:
    return (
        names[0] == "lm" and "kernel" in names and leaf.ndim >= 2 and leaf.size > (1 << 16)
    )


def int8_params_like(shapes, seed: int = 0):
    """Random params with the LM's big kernels in the int8 {'q','scale'}
    layout (ops/quantize.quantize_tree)."""

    @jax.jit
    def make():
        key = jax.random.PRNGKey(seed)
        leaves, td = jax.tree_util.tree_flatten_with_path(shapes)
        out = []
        for i, (path, leaf) in enumerate(leaves):
            names = [str(getattr(p, "key", p)) for p in path]
            k = jax.random.fold_in(key, i)
            if _is_big_lm_kernel(names, leaf):
                out.append({
                    "q": jax.random.randint(k, leaf.shape, -127, 128, jnp.int8),
                    "scale": jnp.full(leaf.shape[:-2] + (1, leaf.shape[-1]), 2e-4, jnp.float32),
                })
            else:
                out.append(
                    0.02 * jax.random.normal(k, leaf.shape, jnp.float32).astype(leaf.dtype)
                )
        return jax.tree_util.tree_unflatten(td, out)

    return make()


def repeater_params_like(shapes, seed: int = 0, quant: str = "none"):
    """Random params rigged so the LM always predicts its input token:
    attention-out and MLP-down kernels are zero (the residual stream stays
    the token embedding) and lm_head is tied to the embedding, so
    argmax(norm(e_t) @ E^T) = t. Built in ONE jitted program (no post-hoc
    tree surgery — that would double peak HBM at 7B scale). Used by the
    speculative-decoding bench as the full-acceptance upper bound.

    quant='int8' puts the remaining big LM kernels in the int8 layout (the
    single-chip serving configuration; 7B bf16 + speculation buffers does
    not fit one v5e); lm_head stays dense so the tie is exact."""

    @jax.jit
    def make():
        key = jax.random.PRNGKey(seed)
        leaves, td = jax.tree_util.tree_flatten_with_path(shapes)
        # the embedding is generated once and reused (transposed) for lm_head
        embed32 = None
        for i, (path, leaf) in enumerate(leaves):
            names = [str(getattr(p, "key", p)) for p in path]
            if names[:2] == ["lm", "embed"]:
                embed32 = 0.02 * jax.random.normal(
                    jax.random.fold_in(key, i), leaf.shape, jnp.float32
                )
        out = []
        for i, (path, leaf) in enumerate(leaves):
            names = [str(getattr(p, "key", p)) for p in path]
            k = jax.random.fold_in(key, i)
            if names[:2] == ["lm", "embed"]:
                out.append(embed32.astype(leaf.dtype))
            elif names[:2] == ["lm", "lm_head"]:
                out.append(embed32.T.astype(leaf.dtype))
            elif names[0] == "lm" and (
                ("attn" in names and "o" in names) or ("mlp" in names and "down" in names)
            ):
                if quant == "int8" and _is_big_lm_kernel(names, leaf):
                    out.append({
                        "q": jnp.zeros(leaf.shape, jnp.int8),
                        "scale": jnp.zeros(leaf.shape[:-2] + (1, leaf.shape[-1]), jnp.float32),
                    })
                else:
                    out.append(jnp.zeros(leaf.shape, leaf.dtype))
            elif quant == "int8" and _is_big_lm_kernel(names, leaf):
                out.append({
                    "q": jax.random.randint(k, leaf.shape, -127, 128, jnp.int8),
                    "scale": jnp.full(leaf.shape[:-2] + (1, leaf.shape[-1]), 2e-4, jnp.float32),
                })
            else:
                out.append(
                    0.02 * jax.random.normal(k, leaf.shape, jnp.float32).astype(leaf.dtype)
                )
        return jax.tree.unflatten(td, out)

    return make()


def q4_params_like(shapes, lm_cfg, quant_type: str = "int4", block: int = 64,
                   fused: bool = True, seed: int = 3):
    """Random params with the LM in the 4-bit packed layout
    (ops/quantize.quantize_tree_4bit), optionally with fused qkv/gateup
    kernels (quantize.fuse_llama_layers layout)."""
    d = lm_cfg.hidden_size
    dkv = lm_cfg.kv_heads * lm_cfg.head_dim
    inter = lm_cfg.intermediate_size
    n_layers = lm_cfg.num_hidden_layers

    @jax.jit
    def make():
        key = jax.random.PRNGKey(seed)

        def q4(k, shape):
            kd, n = shape[-2], shape[-1]
            lead = shape[:-2]
            packed = jax.random.randint(k, (*lead, kd // 2, n), 0, 256, jnp.int32).astype(jnp.uint8)
            absmax = jnp.full((*lead, kd // block, n), 2e-2, jnp.float32)
            return {f"q4:{quant_type}:{block}": packed, "absmax": absmax}

        leaves, td = jax.tree_util.tree_flatten_with_path(shapes)
        out = []
        for i, (path, leaf) in enumerate(leaves):
            names = [str(getattr(p, "key", p)) for p in path]
            k = jax.random.fold_in(key, i)
            if _is_big_lm_kernel(names, leaf):
                out.append(q4(k, leaf.shape))
            else:
                out.append(
                    0.02 * jax.random.normal(k, leaf.shape, jnp.float32).astype(leaf.dtype)
                )
        tree = jax.tree_util.tree_unflatten(td, out)
        if fused:
            layers = dict(tree["lm"]["layers"])
            layers["attn"] = {
                "qkv": {"kernel": q4(jax.random.fold_in(key, 1001), (n_layers, d, d + 2 * dkv))},
                "o": layers["attn"]["o"],
            }
            layers["mlp"] = {
                "gateup": {"kernel": q4(jax.random.fold_in(key, 1002), (n_layers, d, 2 * inter))},
                "down": layers["mlp"]["down"],
            }
            tree["lm"] = {**tree["lm"], "layers": layers}
        return tree

    return make()
