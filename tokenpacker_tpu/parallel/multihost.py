"""Multi-host SPMD training: jax.distributed + one global device mesh.

The reference trains multi-node through the deepspeed launcher (scripts pass
--include/--num_nodes; train.py relies on HF/deepspeed to wire NCCL across
hosts). The TPU-native equivalent needs no launcher framework: every host
calls `jax.distributed.initialize`, builds the SAME global ('data','model')
mesh over `jax.devices()` (which now spans all hosts), and the exact
NamedShardings used single-host (parallel/sharding.py) scale across hosts —
XLA inserts the cross-host collectives (ICI within a pod slice, DCN across
slices).

`run_dryrun` is the runnable template and the CI smoke: tests/
test_multihost.py executes it as 2 coordinated CPU processes x 4 virtual
devices each (cross-process collectives ride Gloo) and asserts every process
computes the same train-step loss as a single-process 8-device run. On a
real pod, the only changes are the env setup (drop the CPU forcing) and the
model config.

Usage (run once per host/process):
  python -m tokenpacker_tpu.parallel.multihost \
      --coordinator HOST0:12345 --num-processes N --process-id I
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def init_process(coordinator: str, num_processes: int, process_id: int,
                 cpu_local_devices: int | None = None) -> None:
    """Join the distributed system. Must run before any other jax call.

    cpu_local_devices: when set, force the virtual-CPU backend with that many
    local devices (the multi-process smoke configuration; real TPU hosts
    leave it None and let libtpu discover local chips)."""
    import os

    if cpu_local_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={cpu_local_devices}"
            )
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def host_to_global(host_tree, shardings):
    """Place host-replicated numpy/jax arrays as GLOBAL arrays with the given
    shardings. Every process passes the same full-size host values (cheap at
    init; real checkpoint loading would read only the local shard) and
    contributes the shards its local devices own."""

    def mk(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree.map(mk, host_tree, shardings)


def run_dryrun(tp: int = 2, seed: int = 0) -> float:
    """One FSDP x TP train step on the global mesh with tiny shapes; returns
    the (replicated) loss. Mirrors __graft_entry__.dryrun_multichip but with
    multi-process-safe array creation throughout."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tokenpacker_tpu.config import tiny_vlm_config
    from tokenpacker_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
    from tokenpacker_tpu.models.splice import build_splice_plan
    from tokenpacker_tpu.models.vlm import init_vlm
    from tokenpacker_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from tokenpacker_tpu.parallel.sharding import vlm_param_shardings
    from tokenpacker_tpu.train.step import TrainConfig, make_optimizer, make_train_step

    mesh = make_mesh(tp=tp)  # over ALL global devices
    cfg = tiny_vlm_config()

    # identical host-side init on every process (same seed, same jax PRNG)
    params_host = init_vlm(jax.random.PRNGKey(seed), cfg)

    dp = mesh.shape[DATA_AXIS]
    ids = np.array([1, 5, IMAGE_TOKEN_INDEX, 9, 10, 11], dtype=np.int64)
    labels = np.array([IGNORE_INDEX] * 3 + [9, 10, 11], dtype=np.int64)
    plan = build_splice_plan(
        [ids] * dp, [[(1, 1)]] * dp, cfg.tokens_per_view, "single", 0, 0, 0,
        labels=[labels] * dp, pad_to=32,
    )
    l = plan.token_ids.shape[1]
    imgs = np.random.default_rng(0).standard_normal(
        (dp, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    host_batch = {
        "images": imgs,
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_slot": plan.image_slot,
        "positions": np.broadcast_to(np.arange(l), (dp, l)).copy(),
        "key_valid": plan.attn_mask,
        "labels": plan.labels,
    }

    with jax.set_mesh(mesh):
        params = host_to_global(params_host, vlm_param_shardings(params_host, mesh))
        data = NamedSharding(mesh, P(DATA_AXIS))
        batch = host_to_global(host_batch, {k: data for k in host_batch})
        tcfg = TrainConfig(stage="finetune", total_steps=10, mm_projector_lr=1e-4)
        tx = make_optimizer(tcfg, params)
        # eager optax init would touch non-addressable shards; jit it so the
        # state inherits the params' shardings
        opt_state = jax.jit(tx.init)(params)
        step = make_train_step(cfg, tx)
        _, _, metrics = step(params, opt_state, batch)
        loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss), f"non-finite loss {loss}"
    print(
        f"multihost_dryrun: pid={jax.process_index()}/{jax.process_count()} "
        f"mesh={dict(mesh.shape)} loss={loss:.6f} OK",
        flush=True,
    )
    return loss


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default="localhost:12357")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--cpu-local-devices", type=int, default=None,
                    help="force the virtual-CPU backend with this many local "
                         "devices (multi-process smoke mode)")
    ap.add_argument("--tp", type=int, default=2)
    args = ap.parse_args(argv)
    init_process(args.coordinator, args.num_processes, args.process_id,
                 args.cpu_local_devices)
    run_dryrun(tp=args.tp)


if __name__ == "__main__":
    main()
