"""Flash-attention kernel vs jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tokenpacker_tpu.ops.flash_attention import (
    attention_reference,
    flash_attention,
    mha_flash,
)


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("tq,tk", [(128, 128), (64, 192), (200, 200)])
def test_forward_matches_reference(causal, tq, tk):
    if causal and tq > tk:
        pytest.skip("causal requires tq <= tk")
    n, h, d = 2, 2, 64
    q, k, v = _rand((n, tq, h, d), 0), _rand((n, tk, h, d), 1), _rand((n, tk, h, d), 2)
    ref = attention_reference(q, k, v, causal=causal)
    got = flash_attention(q, k, v, None, causal, None, 128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_forward_with_bias():
    n, h, tq, tk, d = 1, 2, 128, 128, 64
    q, k, v = _rand((n, tq, h, d), 0), _rand((n, tk, h, d), 1), _rand((n, tk, h, d), 2)
    bias = _rand((1, h, tq, tk), 3)
    ref = attention_reference(q, k, v, bias=bias, causal=True)
    got = flash_attention(q, k, v, bias, True, None, 128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gqa_wrapper():
    n, tq, d = 1, 64, 64
    q = _rand((n, tq, 4, d), 0)
    k = _rand((n, tq, 2, d), 1)
    v = _rand((n, tq, 2, d), 2)
    got = mha_flash(q, k, v, causal=True, interpret=True)
    ref = attention_reference(
        q, jnp.repeat(k, 2, axis=2), jnp.repeat(v, 2, axis=2), causal=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_backward_matches_reference(causal):
    n, h, t, d = 1, 2, 128, 64
    q, k, v = _rand((n, t, h, d), 0), _rand((n, t, h, d), 1), _rand((n, t, h, d), 2)
    bias = _rand((1, 1, t, t), 3)

    def loss_flash(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias, causal, None, 128, 128, True) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(attention_reference(q, k, v, bias=bias, causal=causal) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(g1, g2, "qkvb"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_padding_lengths_not_multiple_of_block():
    """Tq=130, Tk=70: padded internally, result matches on the valid region."""
    n, h, d = 1, 1, 32
    q, k, v = _rand((n, 130, h, d), 0), _rand((n, 70, h, d), 1), _rand((n, 70, h, d), 2)
    ref = attention_reference(q, k, v, causal=False)
    got = flash_attention(q, k, v, None, False, None, 128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("tq,tk", [(128, 128), (64, 192), (200, 200)])
def test_pallas_backward_no_bias(causal, tq, tk):
    """The no-bias backward runs the Pallas dQ/dKV kernels."""
    if causal and tq > tk:
        pytest.skip("causal requires tq <= tk")
    n, h, d = 1, 2, 64
    q, k, v = _rand((n, tq, h, d), 4), _rand((n, tk, h, d), 5), _rand((n, tk, h, d), 6)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, causal, None, 128, 128, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, causal=causal) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_backward_fully_masked_row_finite_grads():
    """A query row whose keys are ALL masked by the bias must yield zero (not
    NaN) gradients: the forward sentinels its LSE with +inf so the backward's
    p = exp(s - lse) collapses to 0 (ADVICE r1: lse was saved as -1e30)."""
    n, h, t, d = 1, 2, 128, 64
    q, k, v = _rand((n, t, h, d), 0), _rand((n, t, h, d), 1), _rand((n, t, h, d), 2)
    neg = jnp.finfo(jnp.float32).min
    bias = jnp.zeros((1, 1, t, t), jnp.float32).at[0, 0, 0, :].set(neg)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bias, False, None, 128, 128, True) ** 2)

    out = flash_attention(q, k, v, bias, False, None, 128, 128, True)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out)[0, 0], 0.0)  # masked row outputs 0
    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_key_bias_forward_matches_reference():
    """Key-only bias ([1, H, 1, Tk], the ALiBi shape) rides a broadcast
    block — never materialized to [Tq, Tk]."""
    n, h, tq, tk, d = 2, 4, 128, 128, 64
    q, k, v = _rand((n, tq, h, d), 0), _rand((n, tk, h, d), 1), _rand((n, tk, h, d), 2)
    bias = _rand((1, h, 1, tk), 3)
    ref = attention_reference(q, k, v, bias=bias, causal=True)
    got = flash_attention(q, k, v, bias, True, None, 128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_key_bias_backward_matches_reference():
    """dQ/dK/dV through the Pallas bwd with a key-only (ALiBi) bias match the
    einsum-reference grads (VERDICT r1 item 7 — the MPT training path)."""
    n, h, t, d = 1, 2, 128, 64
    q, k, v = _rand((n, t, h, d), 0), _rand((n, t, h, d), 1), _rand((n, t, h, d), 2)
    bias = _rand((1, h, 1, t), 3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bias, True, None, 128, 128, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, bias=bias, causal=True) ** 2)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-3, atol=2e-3)
