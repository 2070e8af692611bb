"""LLaMA flash-attention path (interpret mode) vs the einsum path."""

import numpy as np

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import LMConfig
from tokenpacker_tpu.models.llama import (
    embed_tokens,
    init_llama,
    llama_apply,
    llama_logits,
    make_attention_bias,
)


def test_flash_prefill_matches_einsum_right_padded():
    cfg = LMConfig(
        vocab_size=64,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
    )
    params = init_llama(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    n, t = 2, 24
    lengths = np.array([24, 17])  # sample 1 right-padded
    ids = jnp.asarray(rng.integers(0, 64, (n, t)))
    emb = embed_tokens(params, ids)
    positions = jnp.broadcast_to(jnp.arange(t), (n, t))
    key_valid = jnp.arange(t)[None, :] < jnp.asarray(lengths)[:, None]
    bias = make_attention_bias(positions, key_valid, 0, t)

    h_ref, _ = llama_apply(params, cfg, emb, positions, bias, use_flash=False)
    h_flash, _ = llama_apply(params, cfg, emb, positions, bias, use_flash=True)
    ref = np.asarray(llama_logits(params, h_ref))
    got = np.asarray(llama_logits(params, h_flash))
    # valid positions must agree exactly; pad positions are don't-care
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(got[i, :l], ref[i, :l], rtol=2e-4, atol=2e-4)
