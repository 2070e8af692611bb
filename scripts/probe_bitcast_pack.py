"""Probe: pltpu.bitcast row-pairing semantics + packed-bf16 weight streaming.

probe_stream_dtype measured the v5e DMA engine streaming bf16 at ~2.5x the
byte rate of int8 (728 vs 294 GB/s dispatch-corrected) — the int8
(32,128)-packed tile format is the fused decode kernel's 412 GB/s chain
floor. Plan: store the int8 weights bit-packed into bf16 rows in HBM,
stream through a bf16 ring, and pltpu.bitcast each slot back to int8
[ck, N] before the convert-dots.

Step 1 (this file, `semantics`): determine which int8 rows pltpu.bitcast
packs into one bf16 row — interleaved pairs (2r, 2r+1) at the same column,
split halves (r, r+K/2), or row-major byte pairs — by round-tripping a
labeled pattern. Step 2 (`stream`): time the real _Seg chain over a
packed-bf16 source with in-kernel bitcast + convert-dots and compare
against the plain int8 source.

Usage: python scripts/probe_bitcast_pack.py semantics|stream
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def semantics():
    """int8 [64, 256] labeled rows -> bitcast bf16 [32, 256] -> bitcast back
    to int8 [64, 256]: print the row mapping both ways."""

    def kern(src_ref, rt_ref, bf_ref):
        as_bf16 = pltpu.bitcast(src_ref[...], jnp.bfloat16)  # [32, 256]
        rt_ref[...] = pltpu.bitcast(as_bf16, jnp.int8)  # [64, 256]
        bf_ref[...] = as_bf16

    src = jnp.broadcast_to(jnp.arange(64, dtype=jnp.int8)[:, None], (64, 256))
    rt, bf = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((64, 256), jnp.int8),
            jax.ShapeDtypeStruct((32, 256), jnp.bfloat16),
        ],
    )(src)
    rt = np.asarray(rt)[:, 0]
    u16 = np.asarray(bf).view(np.uint16)[:, 0]
    print("roundtrip row labels (should be 0..63 in order):")
    print(rt.tolist())
    print("bf16/u16 row r = (lo byte <- int8 row, hi byte <- int8 row):")
    print([(int(v & 0xFF), int(v >> 8)) for v in u16])


CK = 512
N = 12288
K = 4096
B = 8
L = 8
NSLOTS = 2


def _chain_kernel(x_ref, w_ref, out_ref, ring, xbuf, sem, *, reps, packed):
    from tokenpacker_tpu.ops.fused_decode import _Seg

    # ck in SOURCE rows: packed sources have half the rows
    ck = CK // 2 if packed else CK
    k = K // 2 if packed else K
    total = k // ck

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

        # inline gemv with the dots consuming bitcast-to-int8 ring slots
        b = B
        x = x_ref[...]
        for ci in range(seg.nck):
            seg.xbuf[ci, :b, :] = x[:, ci * CK : (ci + 1) * CK]

        def chunk(ci, a):
            slot = seg._slot(ci)
            seg._wait_chunk(ci)
            xs = seg.xbuf[pl.ds(ci, 1), :b, :][0]  # [B, CK] bf16
            for s in range(NSLOTS):
                @pl.when(slot == s)
                def _(s=s):
                    w = ring[s]
                    if packed:
                        w = pltpu.bitcast(w, jnp.int8)  # [CK, N]
                    a[0] = a[0] + jax.lax.dot_general(
                        xs, w.astype(jnp.bfloat16)[:, :4096],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

            @pl.when(ci + NSLOTS < seg.nck)
            def _():
                seg._start_chunk(ci + NSLOTS)

            for j in range(NSLOTS):
                @pl.when(ci + NSLOTS - j == seg.nck)
                def _(j=j):
                    nxt.start(j, guard)

            return a

        # python-level accumulation container to allow pl.when writes
        acc_box = [jnp.zeros((B, 4096), jnp.float32)]
        acc_box = jax.lax.fori_loop(
            0, seg.nck,
            lambda ci, ab: [chunk(ci, [ab[0]])[0]], [acc_box[0]],
        )
        return acc + jnp.sum(acc_box[0], axis=1, keepdims=True)

    out_ref[...] = jax.lax.fori_loop(0, reps, body, jnp.zeros((B, 1), jnp.float32))


def stream():
    """Time the chain over plain int8 vs packed-bf16 sources."""
    print("NOTE: run semantics first; packing below assumes interleaved"
          " (2r, 2r+1) sublane pairs — verify before trusting parity")
    reps = int(os.environ.get("REPS", "64")) * L
    key = jax.random.PRNGKey(0)
    w8 = jax.random.randint(key, (L, K, N), -127, 127, jnp.int8)
    # interleaved-pair packing: bf16 row r <- (int8 row 2r = lo, 2r+1 = hi)
    w_np = np.asarray(w8).astype(np.uint8).astype(np.uint16)
    packed = (w_np[:, 0::2, :] | (w_np[:, 1::2, :] << 8)).astype(np.uint16)
    wp = jnp.asarray(packed.view(np.int16)).view(jnp.bfloat16)

    x = (jax.random.normal(key, (B, K)) * 0.1).astype(jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("reps", "packed"),
                       compiler_options={"xla_tpu_scoped_vmem_limit_kib": 65536})
    def run(x, w, salt, reps: int, packed: bool):
        x = x + (salt * 0).astype(x.dtype)
        ck = CK // 2 if packed else CK
        k = K // 2 if packed else K
        return pl.pallas_call(
            functools.partial(_chain_kernel, reps=reps, packed=packed),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((NSLOTS, ck, N), w.dtype),
                pltpu.VMEM((k // ck, B, CK), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((NSLOTS,)),
            ],
        )(x, w)

    for name, w, pk in (("int8", w8, False), ("packed-bf16", wp, True)):
        r0 = float(run(x, w, jnp.asarray(0), reps, pk)[0, 0])
        t0 = time.perf_counter()
        r1 = float(run(x, w, jnp.asarray(1), reps, pk)[0, 0])
        dt = time.perf_counter() - t0
        gb = reps * K * N / 1e9
        print(f"{name:>12}: {dt*1e3:7.2f} ms for {gb:.2f} GB -> "
              f"{gb/dt:.0f} GB/s (sum={r1:.1f})", flush=True)


if __name__ == "__main__":
    {"semantics": semantics, "stream": stream}[sys.argv[1]]()
