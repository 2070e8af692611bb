"""Device mesh construction.

TPU equivalent of the reference's DeepSpeed/NCCL plane (SURVEY.md §2.8):
a 2-D `jax.sharding.Mesh` with axes

  'data'  — batch parallelism + ZeRO-3/FSDP param sharding (params are
            sharded over this axis and all-gathered by XLA on use, which is
            exactly DeepSpeed ZeRO-3 semantics without a runtime)
  'model' — Megatron-style tensor parallelism (attention heads / MLP width)

Collectives ride ICI inside a slice; `jax.distributed.initialize` extends the
same mesh across hosts over DCN.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. dp defaults to n_devices // tp."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        if n % tp != 0:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp * tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(dp=1, tp=1, devices=jax.devices()[:1])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))
