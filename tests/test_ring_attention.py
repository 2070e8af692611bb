"""Ring attention (sequence parallel over the mesh) vs full attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tokenpacker_tpu.ops.flash_attention import attention_reference
from tokenpacker_tpu.ops.ring_attention import ring_attention
from tokenpacker_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full_attention(causal):
    mesh = make_mesh(tp=1)  # 8-way ring over 'data'
    n, t, h, d = 2, 64, 4, 16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((n, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((n, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, t, h, d)), jnp.float32)

    ref = attention_reference(q, k, v, causal=causal)

    sharding = NamedSharding(mesh, P(None, "data"))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))
    with jax.set_mesh(mesh):
        got = ring_attention(qs, ks, vs, mesh, axis="data", causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
