"""Probe: int4 nibble-packed weights through the fused-decode ring.

Question: would storing the fused kernel's weights as int4 (two nibbles per
int8 source row, plane-split per chunk) beat int8 streaming? The DMA bytes
halve, but every weight pays a VPU unpack (shift/mask/concat) before the
convert-dots. This streams the SAME effective weight volume through the
kernel's own _Seg machinery (real convert-dots, hooks, ring) as:

  int8 : [L, K, N] int8 source, the production path
  int4 : [L, K/2, N] int8 source holding nibble pairs, unpacked in-VMEM to
         [ck, N] int32 planes per chunk (hi = p >> 4 sign-extends; lo =
         ((p & 15) ^ 8) - 8), then the same tiled convert-dots

Decision rule: if int4 wall-time ≈ int8/2, the fused-int4 path is worth
building (13B single-chip decode 45 → ~70+ tok/s); if the unpack VPU cost
eats the DMA saving (wall ≈ int8), it is not — record and move on.

Usage: python scripts/probe_int4_ring.py   (real TPU)
Env: REPS (default 16), B (default 1)
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

from tokenpacker_tpu.ops.fused_decode import _Seg

L = 8
N = 12288
K = 4096  # effective (unpacked) contraction rows
CK = 512
NSLOTS = 2
B = int(os.environ.get("B", "1"))


def unpack_int4_nibbles(p):
    """int8 [r, n] nibble pairs → int32 [2r, n] values in [-8, 7]:
    hi plane rows first, then lo plane (the packer writes chunks in this
    plane-split order so no interleave is ever needed)."""
    p32 = p.astype(jnp.int32)
    hi = p32 >> 4  # arithmetic shift sign-extends the high nibble
    lo = ((p32 & 15) ^ 8) - 8  # sign-extend the low nibble without shifts
    return jnp.concatenate([hi, lo], axis=0)


def _kernel(x_ref, w_ref, out_ref, ring, xbuf, sem, *, reps, unpack):
    def seg_for(li):
        par = jax.lax.rem(li * (K // CK), NSLOTS)
        return _Seg(w_ref, jax.lax.rem(li, L), 0, N, K, CK, ring, sem, xbuf,
                    par, hooks=True, unpack=unpack)

    first = seg_for(0)
    for s in range(NSLOTS):
        first.start(s)

    def body(li, acc):
        seg = seg_for(li)
        nxt = seg_for(li + 1)
        guard = li + 1 < reps
        a = seg.gemv(x_ref[...], tuple(nxt.starter(i, guard) for i in range(NSLOTS)))
        return acc + jnp.sum(a, axis=1, keepdims=True)

    out_ref[...] = jax.lax.fori_loop(0, reps, body, jnp.zeros((B, 1), jnp.float32))


@functools.partial(jax.jit, static_argnames=("reps", "mode"),
                   compiler_options={"xla_tpu_scoped_vmem_limit_kib": 98304})
def run(x, w, salt, reps: int, mode: str):
    x = x + (salt * 0).astype(x.dtype)
    unpack = unpack_int4_nibbles if mode == "int4" else None
    rck = CK // 2 if mode == "int4" else CK
    return pl.pallas_call(
        functools.partial(_kernel, reps=reps, unpack=unpack),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, rck, N), jnp.int8),
            pltpu.VMEM((K // CK, B, CK), x.dtype),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
        ],
    )(x, w)


def main():
    reps = int(os.environ.get("REPS", "16")) * L
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (B, K)) * 0.1).astype(jnp.bfloat16)
    print(f"backend={jax.default_backend()} B={B} stream={reps} x [{K} x {N}]",
          flush=True)
    results = {}
    for mode, src_rows in (("int8", K), ("int4", K // 2)):
        w = jax.random.randint(key, (L, src_rows, N), -127, 127, jnp.int8)
        float(run(x, w, jnp.asarray(0), reps, mode)[0, 0])  # compile+warm
        t0 = time.perf_counter()
        float(run(x, w, jnp.asarray(1), reps, mode)[0, 0])
        dt = time.perf_counter() - t0
        src_gb = reps * src_rows * N / 1e9
        eff_gb = reps * K * N / 1e9  # int8-equivalent weight volume
        results[mode] = dt
        print(f"{mode}: {dt*1e3:8.2f} ms  src {src_gb:.2f} GB ({src_gb/dt:.0f} GB/s)"
              f"  effective {eff_gb:.2f} GB ({eff_gb/dt:.0f} GB/s-eq)", flush=True)
    if "int8" in results and "int4" in results:
        print(f"int4/int8 wall ratio: {results['int4']/results['int8']:.3f} "
              f"(0.5 = perfect; >0.9 = not worth building)", flush=True)


if __name__ == "__main__":
    main()
