"""Micro-probe: pipelined HBM→VMEM DMA rate, contiguous vs column-sliced.

The fused decode kernel's measured chain floor is DMA-bound at ~412 GB/s
(nodot,noattn ablation). This reproduces the kernel's exact streaming
structure — a [2, CK, NCOLS] ring, wait(ci) then start(ci+2) — with the
dots replaced by a scalar touch, against (a) a contiguous [4096, NCOLS]
source and (b) column slices of a fused [4096, 2*NCOLS] source (the
gate/up layout). If (b) ≪ (a), the fused gateup storage must split into
contiguous planes; if (a) is also ~400 GB/s, the ring structure itself
(2-deep, wait-before-start-next) is the limiter.

Usage: python scripts/probe_dma_stride.py [reps_per_call]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CK = 512
NCOLS = 11008
NROWS = 4096


def _kernel(src_ref, out_ref, ring, sem, *, col_off, reps):
    nchunks = NROWS // CK

    def dma(ci, slot: int):
        row = jax.lax.rem(ci, nchunks) * CK
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(row, CK), pl.ds(col_off, NCOLS)],
            ring.at[slot], sem.at[slot],
        )

    def slot_branch(ci, fn):
        slot = jax.lax.rem(ci, 2)

        @pl.when(slot == 0)
        def _():
            fn(dma(ci, 0))

        @pl.when(slot == 1)
        def _():
            fn(dma(ci, 1))

    slot_branch(0, lambda d: d.start())
    slot_branch(1, lambda d: d.start())

    def body(ci, acc):
        slot_branch(ci, lambda d: d.wait())
        # tiny unconditional touch of both slots (a lax.cond here would
        # materialize ring-sized branch values and swamp the timing)
        acc = acc + ring[0, 0:1, 0:1].astype(jnp.float32)
        acc = acc + ring[1, 0:1, 0:1].astype(jnp.float32)

        @pl.when(ci + 2 < reps)
        def _():
            slot_branch(ci + 2, lambda d: d.start())

        return acc

    out_ref[...] = jax.lax.fori_loop(0, reps, body, jnp.zeros((1, 1), jnp.float32))


@functools.partial(jax.jit, static_argnames=("col_off", "reps"),
                   compiler_options={"xla_tpu_scoped_vmem_limit_kib": 65536})
def run(src, col_off: int, reps: int):
    return pl.pallas_call(
        functools.partial(_kernel, col_off=col_off, reps=reps),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, CK, NCOLS), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(src)


def time_case(name, src, col_off, reps):
    float(run(src, col_off, reps)[0, 0])  # compile + warm
    t0 = time.perf_counter()
    float(run(src, col_off, reps + 2)[0, 0])  # +2 busts any memoization
    dt = time.perf_counter() - t0
    gb = (reps + 2) * CK * NCOLS / 1e9
    print(f"{name}: {dt*1e3:.2f} ms for {gb:.2f} GB -> {gb/dt:.0f} GB/s", flush=True)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    key = jax.random.PRNGKey(0)
    wide = jax.random.randint(key, (NROWS, 2 * NCOLS), -127, 127, jnp.int8)
    narrow = jax.random.randint(key, (NROWS, NCOLS), -127, 127, jnp.int8)
    print(f"backend={jax.default_backend()} reps={reps}")
    time_case("contiguous [4096,11008] full-width       ", narrow, 0, reps)
    time_case("column slice [*,0:11008] of [4096,22016] ", wide, 0, reps)
    time_case("column slice [*,11008:] of [4096,22016]  ", wide, NCOLS, reps)


if __name__ == "__main__":
    main()
