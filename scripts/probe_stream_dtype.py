"""Probe: does the weight-stream DMA rate depend on element dtype?

The fused decode kernel's chain floor is DMA-bound at ~412 GB/s (half of
v5e HBM peak) and is invariant to chunk size, ring depth, and pipelining
mode. This probe streams the SAME byte volume through the kernel's own
_Seg ring machinery (hooks, slot branches, fori chunk loop — the code
that measurably achieves 412 GB/s in the nodot ablation) with the source
stored as int8 / int32 / bfloat16. If int32 or bf16 streams faster per
byte, the v5e DMA engine's int8 (32,128)-packed tile format is the
limiter, and weights should be stored int32-packed ([K/4, N] rows) and
bitcast back to int8 in VMEM (a sublane-packing no-op per ROADMAP).

Usage: python scripts/probe_stream_dtype.py [dtype ...]  (default all)
Env: REPS (layer-stream repetitions per call, default 8)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TOKENPACKER_FD_DEBUG", "nodot")  # skip the dots

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tokenpacker_tpu.ops.fused_decode import _Seg

L = 8  # layers in the probe stack (cycled REPS times)
N = 12288
K_BYTES = 4096  # contraction extent in BYTES (int8 rows)
CK_BYTES = 512
B = 8
NSLOTS = 2


def _kernel(x_ref, w_ref, out_ref, ring, xbuf, sem, *, reps, k, ck):
    nck = k // ck
    total = nck  # ring chunks per "layer" (one segment each)

    def seg_for(li):
        par = jax.lax.rem(li * total, NSLOTS)
        return _Seg(w_ref, jax.lax.rem(li, L), 0, N, k, ck, ring, sem, xbuf,
                    par, hooks=True)

    first = seg_for(0)
    for s in range(NSLOTS):
        first.start(s)

    def body(li, acc):
        seg = seg_for(li)
        nxt = seg_for(li + 1)
        guard = li + 1 < reps
        a = seg.gemv(x_ref[...], tuple(nxt.starter(i, guard) for i in range(NSLOTS)))
        return acc + jnp.sum(a, axis=1, keepdims=True)

    out_ref[...] = jax.lax.fori_loop(
        0, reps, body, jnp.zeros((B, 1), jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("reps", "k", "ck"),
                   compiler_options={"xla_tpu_scoped_vmem_limit_kib": 65536})
def run(x, w, salt, reps: int, k: int, ck: int):
    x = x + (salt * 0).astype(x.dtype)
    nck = k // ck
    return pl.pallas_call(
        functools.partial(_kernel, reps=reps, k=k, ck=ck),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, ck, N), w.dtype),
            pltpu.VMEM((nck, B, ck), x.dtype),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
        ],
    )(x, w)


def main():
    cases = {
        "int8": (jnp.int8, 1),
        "int32": (jnp.int32, 4),
        "bf16": (jnp.bfloat16, 2),
        "uint16": (jnp.uint16, 2),  # fails: mosaic can't reduce unsigned —
        # use int16 (same 16-bit VMEM tile format, signedness is irrelevant
        # to the DMA engine) as the stand-in for the FD_PACK u16 ring
        "int16": (jnp.int16, 2),
    }
    names = sys.argv[1:] or list(cases)
    reps_layers = int(os.environ.get("REPS", "8")) * L
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()} stream={reps_layers} x "
          f"[{K_BYTES}B x {N}] rows", flush=True)
    for name in names:
        dtype, esize = cases[name]
        k = K_BYTES // esize
        ck = CK_BYTES // esize
        if dtype == jnp.bfloat16:
            w = (jax.random.normal(key, (L, k, N)) * 0.1).astype(dtype)
            x = (jax.random.normal(key, (B, k)) * 0.1).astype(dtype)
        elif dtype == jnp.uint16:
            w = jax.random.randint(key, (L, k, N), 0, 60000, jnp.int32).astype(dtype)
            x = jax.random.randint(key, (B, k), 0, 60000, jnp.int32).astype(dtype)
        else:
            w = jax.random.randint(key, (L, k, N), -127, 127, dtype)
            x = jax.random.randint(key, (B, k), -127, 127, dtype)
        float(run(x, w, jnp.asarray(0), reps_layers, k, ck)[0, 0])  # compile+warm
        t0 = time.perf_counter()
        float(run(x, w, jnp.asarray(1), reps_layers, k, ck)[0, 0])
        dt = time.perf_counter() - t0
        gb = reps_layers * K_BYTES * N / 1e9
        print(f"{name:>6}: {dt*1e3:7.2f} ms for {gb:.2f} GB -> {gb/dt:.0f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
