"""Ceiling probe: what HBM read rate does PLAIN XLA achieve on this chip?

Context (VERDICT r3 item 3): the fused decode kernel's weight chain streams
at ~430 GB/s, and round-3's amortized re-measurement showed the kernel's own
_Seg DMA machinery also tops at ~430 GB/s for EVERY dtype (int8 428 /
int16 402 / bf16 441) — refuting the earlier 728 GB/s bf16 figure that the
"126 tok/s streaming roofline" was built on. This probe asks the remaining
question: is ~430 GB/s a property of the ring machinery, or of the chip /
service path itself? Method: time a chained XLA reduction over a multi-GB
array — XLA's reduce reads HBM through its own (non-Pallas) pipeline, so if
it also lands at ~430 GB/s the ceiling is environmental and the 126 tok/s
roofline claim is retired; if it reaches ~700+, the ring leaves bandwidth
on the table.

Loop-hoist defense: each iteration reduces a dynamic-offset slice (offset
derived from the carry), so the reduction cannot be factored out of the
fori_loop. Timing: one jitted program, scalar fetch (CLAUDE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def probe(dtype, gb: float = 4.0, reps: int = 8):
    bpe = jnp.dtype(dtype).itemsize
    rows = int(gb * (1 << 30) / (1024 * bpe)) // 8 * 8
    x = jnp.ones((rows, 1024), dtype)
    read_rows = rows

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x, salt, n: int):
        def body(i, acc):
            # x + (acc-derived scalar) fuses into the reduce (read-only, no
            # materialized intermediate) and the acc dependence defeats
            # loop-invariant hoisting of the reduction
            c = ((acc.astype(jnp.int32) + salt + i) % 2).astype(x.dtype)
            return acc + jnp.sum((x + c).astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(x, jnp.asarray(0, jnp.int32), reps))  # compile + warm
    t0 = time.perf_counter()
    float(loop(x, jnp.asarray(1, jnp.int32), reps))
    dt = time.perf_counter() - t0
    bytes_read = read_rows * 1024 * bpe * reps
    return bytes_read / dt / 1e9, dt


def main():
    for name, dt in (("int8", jnp.int8), ("bf16", jnp.bfloat16),
                     ("f32", jnp.float32)):
        rate, wall = probe(dt)
        print(f"xla reduce read rate {name}: {rate:.0f} GB/s ({wall:.2f}s)",
              flush=True)


if __name__ == "__main__":
    main()
