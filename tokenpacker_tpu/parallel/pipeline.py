"""GPipe-style pipeline parallelism for the decoder stack.

Beyond-reference parallelism axis (the reference's DeepSpeed config shards
optimizer state, never layers — /root/reference/scripts/zero2.json,
zero3.json). On TPU pods, pipelining the layer stack over a 'stage' mesh
axis trades ICI point-to-point traffic (one [mb, T, D] activation per tick)
for holding only L/S layers of weights + optimizer state per device —
the standard recipe for models that do not fit even fully FSDP-sharded.

Design (the scaling-book collective pipeline, shard_map + ppermute):

- `params["layers"]` leaves are layer-stacked on axis 0 (llama.py builds
  them that way for `lax.scan`); sharding that axis over 'stage' gives each
  device a contiguous [L/S, ...] block — the natural TPU layout, no
  per-layer scatter.
- The global batch is split into M microbatches. At tick t, stage s runs
  its local layers on microbatch (t - s); activations move to stage s+1 via
  `lax.ppermute`. M + S - 1 ticks drain the pipe.
- Everything is one `lax.scan` over ticks inside one `shard_map`, so XLA
  sees a single static program: no per-tick dispatch, and `jax.grad`
  differentiates straight through (ppermute transposes to the reverse
  ring), yielding the classic 1F1B-equivalent reverse pipeline for free.
- Per-layer `jax.checkpoint` inside the stage keeps activation memory
  O(ticks) in the [mb, T, D] boundary tensors only.

Composes with the 'data' axis: a ('data', 'stage') mesh runs an
independent pipeline per data-parallel row; gradients sync over 'data'
exactly as in the FSDP path (tests/test_pipeline.py covers dp×pp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tokenpacker_tpu.models.llama import (
    LMConfig,
    _layer,
    make_attention_bias,
    rms_norm,
    rope_cos_sin,
)

STAGE_AXIS = "stage"
DATA_AXIS = "data"


def make_pp_mesh(pp: int, dp: int | None = None, devices=None) -> Mesh:
    """A ('data', 'stage') mesh: dp independent pipelines of pp stages."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        if n % pp != 0:
            raise ValueError(f"{n} devices not divisible by pp={pp}")
        dp = n // pp
    if dp * pp != n:
        # an explicit dp that underuses the devices would silently idle the
        # rest (ADVICE r3) — match the strictness of the dp=None path
        raise ValueError(f"dp*pp = {dp * pp} != {n} devices")
    arr = np.asarray(devices[: dp * pp]).reshape(dp, pp)
    return Mesh(arr, (DATA_AXIS, STAGE_AXIS))


def pp_param_shardings(params, mesh: Mesh):
    """Layer-stacked leaves shard over 'stage'; everything else replicates.

    The embed/norm/lm_head params are tiny next to the layer stack, so they
    replicate (every stage can run the head; only the last stage's result
    is used)."""

    def spec(path, leaf):
        keys = tuple(getattr(p, "key", getattr(p, "name", None)) for p in path)
        if "layers" in keys:
            return NamedSharding(mesh, P(STAGE_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def _stage_scan(local_layers, cfg: LMConfig, x, cos, sin, bias, use_flash):
    """Run this stage's local layer block (a lax.scan over [L/S, ...])."""

    def step(carry, layer_params):
        y, _ = _layer(
            layer_params, cfg, carry, cos, sin, bias, None,
            jnp.zeros((), jnp.int32), use_flash,
        )
        return y, None

    step = jax.checkpoint(step)
    y, _ = jax.lax.scan(step, x, local_layers)
    return y


def pipeline_llama_hidden(
    params,
    cfg: LMConfig,
    inputs_embeds,  # [B, T, D]
    positions,  # [B, T]
    key_valid,  # [B, T] bool
    mesh: Mesh,
    num_microbatches: int,
    use_flash: bool = False,
):
    """Decoder-stack forward (training path, no cache) pipelined over
    mesh axis 'stage', batch-parallel over 'data' if present.

    Equivalent to `llama_apply(..., cache=None)` (same per-layer math in
    the same order — parity pinned by tests/test_pipeline.py); returns the
    final-norm hidden states [B, T, D].
    """
    n_stages = mesh.shape[STAGE_AXIS]
    m = num_microbatches
    b, t, d = inputs_embeds.shape
    has_data = DATA_AXIS in mesh.shape
    dp = mesh.shape.get(DATA_AXIS, 1)
    if b % (dp * m):
        raise ValueError(f"batch {b} not divisible by dp*microbatches {dp * m}")
    n_layers = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible by {n_stages} stages")

    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    bias = make_attention_bias(positions, key_valid, jnp.zeros((), jnp.int32), t)

    bspec = P(DATA_AXIS) if has_data else P()
    in_specs = (P(STAGE_AXIS), bspec, bspec, bspec, bspec)
    out_spec = bspec

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs,
        out_specs=out_spec, check_vma=False,
    )
    def run(local_layers, x, cos, sin, bias):
        s = jax.lax.axis_index(STAGE_AXIS)
        mb = x.shape[0] // m  # local microbatch rows

        def split(a):
            return a.reshape((m, mb) + a.shape[1:])

        x_mb, cos_mb, sin_mb, bias_mb = map(split, (x, cos, sin, bias))

        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        ticks = m + n_stages - 1

        def tick(carry, t_idx):
            # bubble ticks (t_idx outside [s, s+m-1]) re-run the clipped edge
            # microbatch and discard the result — deliberate: SPMD lockstep
            # means gating them saves no wall-clock (every stage waits for
            # the slowest tick anyway), and a lax.cond would double-trace the
            # stage body. The redundant forwards (and their remat backward)
            # are the inherent pipeline-bubble cost, paid in FLOPs/energy
            # only (ADVICE r3, documented trade).
            state, outputs = carry
            mb_idx = jnp.clip(t_idx - s, 0, m - 1)
            pick = lambda a: jax.lax.dynamic_index_in_dim(a, mb_idx, 0, False)
            my_in = jnp.where(s == 0, pick(x_mb), state)
            out = _stage_scan(
                local_layers, cfg, my_in, pick(cos_mb), pick(sin_mb),
                pick(bias_mb), use_flash,
            )
            # the last stage owns microbatch t-(S-1)'s final activations
            w_idx = jnp.clip(t_idx - (n_stages - 1), 0, m - 1)
            do_write = jnp.logical_and(s == n_stages - 1, t_idx >= n_stages - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, w_idx, 0, False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(do_write, out, cur), w_idx, 0
            )
            state = jax.lax.ppermute(out, STAGE_AXIS, perm)
            return (state, outputs), None

        init = (jnp.zeros_like(x_mb[0]), jnp.zeros_like(x_mb))
        (_, outputs), _ = jax.lax.scan(tick, init, jnp.arange(ticks))
        # replicate the last stage's outputs across the stage axis so the
        # head/loss can run replicated (tiny vs the stack; a production
        # last-stage-only loss would skip this psum)
        outputs = jax.lax.psum(
            jnp.where(s == n_stages - 1, outputs, jnp.zeros_like(outputs)),
            STAGE_AXIS,
        )
        return outputs.reshape((m * mb,) + outputs.shape[2:])

    hidden = run(params["layers"], inputs_embeds, cos, sin, bias)
    return rms_norm(params["norm"], hidden, cfg.rms_norm_eps)
