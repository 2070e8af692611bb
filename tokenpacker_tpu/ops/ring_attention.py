"""Ring attention — sequence-parallel exact attention over the mesh.

The reference has no sequence parallelism (max ctx 2048, SURVEY.md §2.7/§5);
this provides the capability for longer contexts: the sequence is sharded
over an axis of the mesh, each device holds its Q/K/V shard, and K/V shards
rotate around the ring with `jax.lax.ppermute` while every device
accumulates its queries' online softmax — attention memory per device stays
O(T/n · T/n) and activations never gather.

Built with shard_map + collectives (the TPU-idiomatic formulation; a Pallas
RDMA variant that overlaps compute with the ring transfer is the next
optimization). Exact-match tested against full attention on the CPU mesh
(tests/test_ring_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _block_accum(q, k, v, scale, q_offset, k_offset, causal, m, l, acc):
    """One K/V block's contribution to the online softmax.

    q: [N, Tq, H, D]; k/v: [N, Tk, H, D]; m/l: [N, H, Tq, 1]; acc like q
    transposed to [N, H, Tq, D].
    """
    s = jnp.einsum("nqhd,nkhd->nhqk", q, k).astype(jnp.float32) * scale
    if causal:
        qpos = q_offset + jnp.arange(q.shape[1])[:, None]
        kpos = k_offset + jnp.arange(k.shape[1])[None, :]
        s = jnp.where(kpos <= qpos, s, NEG_INF)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + jnp.einsum(
        "nhqk,nkhd->nhqd", p.astype(v.dtype), v
    ).astype(jnp.float32)
    return m_new, l_new, acc_new


def ring_attention(q, k, v, mesh: Mesh, axis: str = "data", causal: bool = True):
    """q/k/v: [N, T, H, D] sharded on T over `axis`. Returns [N, T, H, D]
    with the same sharding. Exact (not blockwise-approximate)."""
    n_dev = mesh.shape[axis]
    t = q.shape[1]
    assert t % n_dev == 0, "sequence must divide the ring size"
    t_local = t // n_dev
    d = q.shape[-1]
    scale = d**-0.5

    def local_fn(q_loc, k_loc, v_loc):
        idx = jax.lax.axis_index(axis)
        q_offset = idx * t_local
        nq, h = q_loc.shape[0], q_loc.shape[2]
        m = jnp.full((nq, h, t_local, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((nq, h, t_local, 1), jnp.float32)
        acc = jnp.zeros((nq, h, t_local, d), jnp.float32)
        # mark the accumulators as device-varying so the scan carry type
        # matches after the axis-dependent updates (jax 0.9 shard_map typing);
        # pcast replaces the deprecated pvary, keep the fallback for older jax
        if hasattr(jax.lax, "pcast"):
            m, l, acc = jax.lax.pcast((m, l, acc), (axis,), to="varying")
        else:
            m, l, acc = jax.lax.pvary((m, l, acc), (axis,))

        def step(carry, r):
            m, l, acc, k_cur, v_cur = carry
            # k block r originated on device (idx - r) mod n
            src = (idx - r) % n_dev
            k_offset = src * t_local
            m, l, acc = _block_accum(
                q_loc, k_cur, v_cur, scale, q_offset, k_offset, causal, m, l, acc
            )
            # rotate K/V shards to the next device
            perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            return (m, l, acc, k_nxt, v_nxt), None

        (m, l, acc, _, _), _ = jax.lax.scan(
            step, (m, l, acc, k_loc, v_loc), jnp.arange(n_dev)
        )
        l_safe = jnp.where(l == 0, 1.0, l)
        out = (acc / l_safe).astype(q_loc.dtype)  # [N, H, Tq, D]
        return out.transpose(0, 2, 1, 3)

    spec = P(None, axis)
    shard_fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return shard_fn(q, k, v)
