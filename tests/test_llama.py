"""Parity of the JAX LLaMA decoder vs HF `LlamaForCausalLM` (tiny config),
including GQA, RoPE, KV-cache decode, and inputs_embeds entry.
"""

import numpy as np
import torch
from transformers import LlamaConfig, LlamaForCausalLM

import jax.numpy as jnp

from tokenpacker_tpu.config import LMConfig
from tokenpacker_tpu.io.hf_import import import_llama
from tokenpacker_tpu.models.llama import (
    KVCache,
    embed_tokens,
    llama_apply,
    llama_logits,
    make_attention_bias,
)


def make_tiny(num_kv_heads=2):
    hf_cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=num_kv_heads,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = LMConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=num_kv_heads,
        max_position_embeddings=256,
    )
    params = import_llama(model.state_dict(), cfg)
    return model, cfg, params


def full_forward(params, cfg, ids):
    n, t = ids.shape
    emb = embed_tokens(params, ids)
    positions = jnp.broadcast_to(jnp.arange(t), (n, t))
    bias = make_attention_bias(positions, jnp.ones((n, t), bool), 0, t)
    hidden, _ = llama_apply(params, cfg, emb, positions, bias)
    return llama_logits(params, hidden)


def test_full_sequence_parity():
    model, cfg, params = make_tiny()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 11))
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(full_forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_mha_no_gqa_parity():
    model, cfg, params = make_tiny(num_kv_heads=4)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 128, size=(1, 7))
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(full_forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_kv_cache_decode_matches_full_forward():
    """Prefill T tokens then decode one-by-one; logits must equal the
    full-sequence forward at every step."""
    _, cfg, params = make_tiny()
    rng = np.random.default_rng(2)
    n, t_prompt, t_total, s_max = 2, 5, 9, 16
    ids = jnp.asarray(rng.integers(0, 128, size=(n, t_total)))

    full_logits = np.asarray(full_forward(params, cfg, ids))

    cache = KVCache.create(cfg, n, s_max, dtype=jnp.float32)
    # prefill
    emb = embed_tokens(params, ids[:, :t_prompt])
    pos = jnp.broadcast_to(jnp.arange(t_prompt), (n, t_prompt))
    key_valid = jnp.arange(s_max)[None, :] < t_prompt
    bias = make_attention_bias(pos, jnp.broadcast_to(key_valid, (n, s_max)), 0, s_max)
    hidden, cache = llama_apply(params, cfg, emb, pos, bias, cache)
    np.testing.assert_allclose(
        np.asarray(llama_logits(params, hidden)),
        full_logits[:, :t_prompt],
        rtol=3e-4,
        atol=3e-4,
    )
    # decode steps
    for step in range(t_prompt, t_total):
        emb = embed_tokens(params, ids[:, step : step + 1])
        pos = jnp.full((n, 1), step)
        key_valid = jnp.broadcast_to(jnp.arange(s_max)[None, :] < step + 1, (n, s_max))
        bias = make_attention_bias(pos, key_valid, step, s_max)
        hidden, cache = llama_apply(params, cfg, emb, pos, bias, cache)
        step_logits = np.asarray(llama_logits(params, hidden))[:, 0]
        np.testing.assert_allclose(
            step_logits, full_logits[:, step], rtol=5e-4, atol=5e-4, err_msg=f"step {step}"
        )
