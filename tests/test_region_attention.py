"""Fused region-attention Pallas kernel vs the einsum reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from tokenpacker_tpu.ops.region_attention import (
    region_attention_pallas,
    region_attention_reference,
)


@pytest.mark.parametrize("s,g", [(2, 144), (3, 64), (4, 36)])
def test_kernel_matches_einsum(s, g):
    rng = np.random.default_rng(0)
    n, e, h = 2, 256, 8
    q = jnp.asarray(rng.standard_normal((n, g, e)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((n, g, s * s, e)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, g, s * s, e)), jnp.float32)
    ref = region_attention_reference(q, k, v, h)
    got = region_attention_pallas(q, k, v, h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
