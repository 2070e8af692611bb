"""Parameter sharding rules for the TokenPacker VLM.

ZeRO-3/FSDP over 'data' + Megatron TP over 'model', expressed purely as
NamedShardings — XLA inserts the all-gathers/reduce-scatters (the TPU
replacement for DeepSpeed ZeRO, reference scripts/zero*.json).

Rules (kernels are [in, out]; stacked decoder layers carry a leading L axis):
- column-parallel (q/k/v, gate/up, lm_head): out dim over 'model', in over 'data'
- row-parallel (o_proj, down_proj): in dim over 'model', out over 'data'
- embeddings: vocab over 'data', features over 'model'
- norms/biases: replicated
- vision tower + projector: small (≈0.4 B total) → FSDP-shard the big
  kernels over 'data' only; batch of image crops is sharded over 'data'
  (per-crop vision DP — SURVEY.md §2.7 "first-class")

Divisibility: falls back to replication on any axis that doesn't divide,
so tiny test configs work on any mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tokenpacker_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _fits(dim: int, mesh: Mesh, axis: str | None) -> bool:
    if axis is None:
        return True
    return dim % mesh.shape[axis] == 0


def _spec_for(path: tuple, leaf, mesh: Mesh) -> P:
    """Decide a PartitionSpec from the param's path and shape."""
    names = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
    joined = "/".join(names)
    shape = leaf.shape
    ndim = len(shape)

    def spec(*axes):
        # pad to ndim, drop axes that don't divide
        full = list(axes) + [None] * (ndim - len(axes))
        full = [a if _fits(shape[i], mesh, a) else None for i, a in enumerate(full)]
        return P(*full)

    # --- LM ---
    if joined.startswith("lm/"):
        stacked = "layers" in names  # leading L axis
        off = 1 if stacked else 0

        def lspec(*axes):
            full = [None] * off + list(axes)
            return spec(*full)

        if joined.endswith("embed") or joined.endswith("wte"):
            return spec(DATA_AXIS, MODEL_AXIS)
        if "lm_head" in names:
            return spec(DATA_AXIS, MODEL_AXIS)
        if "kernel" in names and ndim >= 2:
            # LLaMA family (q/k/v/o, gate/up/down) incl. the fused
            # qkv/gateup layout, and the MPT family (wqkv/out, ffn up/down).
            # Quantized kernels nest their payload below 'kernel'
            # ({'q','scale'} int8, {'q4:*','absmax'} 4-bit): the big int8/
            # packed payload shards like the dense kernel (same [.., in, out]
            # layout; q4 halves the in dim but _fits re-checks divisibility);
            # the small scale/absmax tensors replicate.
            ki = names.index("kernel")
            role = names[ki - 1]
            sub = names[ki + 1] if ki + 1 < len(names) else None
            if sub in ("scale", "absmax"):
                return P()
            if "attn" in names and role in ("q", "k", "v", "qkv", "wqkv"):
                return lspec(DATA_AXIS, MODEL_AXIS)
            if "attn" in names and role in ("o", "out"):
                return lspec(MODEL_AXIS, DATA_AXIS)
            if ("mlp" in names or "ffn" in names) and role in ("gate", "up", "gateup"):
                return lspec(DATA_AXIS, MODEL_AXIS)
            if ("mlp" in names or "ffn" in names) and role == "down":
                return lspec(MODEL_AXIS, DATA_AXIS)
        return P()  # norms, biases

    # --- vision tower / projector: FSDP-only on 2D+ kernels ---
    if "kernel" in names and ndim >= 2:
        # shard the largest dim over 'data'
        big = int(np.argmax(shape))
        axes = [None] * ndim
        if _fits(shape[big], mesh, DATA_AXIS):
            axes[big] = DATA_AXIS
        return P(*axes)
    return P()


def vlm_param_shardings(params, mesh: Mesh):
    """Pytree of NamedSharding matching `params`' structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf, mesh)), params
    )


def shard_params(params, mesh: Mesh):
    shardings = vlm_param_shardings(params, mesh)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, shardings)


def batch_shardings(batch_spec: dict, mesh: Mesh):
    """Shard every batch array's leading axis over 'data'."""
    return {
        k: NamedSharding(mesh, P(DATA_AXIS) if v is not None else P())
        for k, v in batch_spec.items()
    }


# ---------------------------------------------------------------------------
# Deployment presets: recommended (dp, tp) on a single v5e-8 host
# ---------------------------------------------------------------------------

# One v5e chip: 16 GiB HBM, ~15.75 GiB usable. Weights: 7B bf16 14.2 GB /
# int8 7.1 / int4 3.5; 13B bf16 26.1 / int8 13.0 / int4 6.5. HD serving adds
# ~1 GB KV per slot at ~1k visual tokens (see docs/deploy_13b.md).
PARALLEL_PRESETS: dict[str, dict] = {
    "7b-bf16": dict(tp=1),       # weights + 1-2 KV slots fit one chip; DP for throughput
    "7b-hd-bf16": dict(tp=2),    # HD multi-slot KV exceeds one chip next to bf16 weights
    "7b-int8": dict(tp=1),
    "7b-int4": dict(tp=1),
    "13b-bf16": dict(tp=2),      # 13.05 GB/chip + KV headroom
    "13b-int8": dict(tp=2),      # tp=1 fits weights (13.0) but leaves <3 GB for KV
    "13b-int4": dict(tp=1),      # 6.5 GB weights: single-chip 13B
    "13b-hd-bf16": dict(tp=4),
}


def recommended_mesh(preset: str, n_devices: int | None = None) -> Mesh:
    """Build the preset's ('data','model') mesh over the available devices."""
    from tokenpacker_tpu.parallel.mesh import make_mesh

    if preset not in PARALLEL_PRESETS:
        raise KeyError(f"unknown preset {preset!r}; known: {sorted(PARALLEL_PRESETS)}")
    tp = PARALLEL_PRESETS[preset]["tp"]
    devices = jax.devices()[: n_devices or len(jax.devices())]
    if len(devices) % tp:
        raise ValueError(f"{len(devices)} devices not divisible by preset tp={tp}")
    return make_mesh(dp=len(devices) // tp, tp=tp, devices=devices)
