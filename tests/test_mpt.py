"""MPT decoder parity vs HF `MptForCausalLM` (ALiBi, no-bias, tied logits)."""

import numpy as np
import torch
from transformers import MptConfig, MptForCausalLM

import jax.numpy as jnp

from tokenpacker_tpu.models.llama import KVCache, make_attention_bias
from tokenpacker_tpu.models.mpt import (
    alibi_slopes,
    import_mpt,
    mpt_apply,
    mpt_config,
    mpt_embed,
    mpt_logits,
)


def make_tiny():
    hf_cfg = MptConfig(
        d_model=64,
        n_heads=4,
        n_layers=2,
        vocab_size=128,
        max_seq_len=128,
        expansion_ratio=4,
    )
    torch.manual_seed(0)
    model = MptForCausalLM(hf_cfg).eval()
    cfg = mpt_config(d_model=64, n_heads=4, n_layers=2, vocab_size=128, max_seq_len=128)
    params = import_mpt(model.state_dict(), cfg)
    return model, cfg, params


def _full_forward(params, cfg, ids):
    n, t = ids.shape
    emb = mpt_embed(params, ids)
    positions = jnp.broadcast_to(jnp.arange(t), (n, t))
    bias = make_attention_bias(positions, jnp.ones((n, t), bool), 0, t)
    hidden, _ = mpt_apply(params, cfg, emb, bias)
    return mpt_logits(params, hidden)


def test_alibi_slopes_power_of_two():
    s = np.asarray(alibi_slopes(4))
    np.testing.assert_allclose(s, [2.0**-2, 2.0**-4, 2.0**-6, 2.0**-8], rtol=1e-6)


def test_full_sequence_parity():
    model, cfg, params = make_tiny()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 9))
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(_full_forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_kv_cache_decode_matches_full():
    _, cfg, params = make_tiny()
    rng = np.random.default_rng(1)
    n, t_prompt, t_total, s_max = 1, 4, 7, 8
    ids = jnp.asarray(rng.integers(0, 128, size=(n, t_total)))
    full = np.asarray(_full_forward(params, cfg, ids))

    cache = KVCache.create(cfg, n, s_max, dtype=jnp.float32)
    emb = mpt_embed(params, ids[:, :t_prompt])
    pos = jnp.broadcast_to(jnp.arange(t_prompt), (n, t_prompt))
    key_valid = jnp.broadcast_to(jnp.arange(s_max)[None, :] < t_prompt, (n, s_max))
    bias = make_attention_bias(pos, key_valid, 0, s_max)
    hidden, cache = mpt_apply(params, cfg, emb, bias, cache)
    np.testing.assert_allclose(
        np.asarray(mpt_logits(params, hidden)), full[:, :t_prompt], rtol=3e-4, atol=3e-4
    )
    for step in range(t_prompt, t_total):
        emb = mpt_embed(params, ids[:, step : step + 1])
        pos = jnp.full((n, 1), step)
        key_valid = jnp.broadcast_to(jnp.arange(s_max)[None, :] < step + 1, (n, s_max))
        bias = make_attention_bias(pos, key_valid, step, s_max)
        hidden, cache = mpt_apply(params, cfg, emb, bias, cache)
        np.testing.assert_allclose(
            np.asarray(mpt_logits(params, hidden))[:, 0],
            full[:, step],
            rtol=5e-4,
            atol=5e-4,
            err_msg=f"step {step}",
        )


def test_mpt_flash_path_matches_einsum():
    """The flash (Pallas, interpret on CPU) MPT prefill path — ALiBi as a
    key-only bias, pure causal mask — matches the einsum path on a
    right-padded batch, in both forward and gradients."""
    import jax

    cfg = mpt_config(d_model=32, n_heads=4, n_layers=2, vocab_size=64, expansion_ratio=2)
    from tokenpacker_tpu.models.mpt import init_mpt

    params = init_mpt(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    n, t = 2, 12
    ids = rng.integers(0, 64, (n, t))
    lengths = np.array([12, 9])  # second sample right-padded
    key_valid = np.arange(t)[None, :] < lengths[:, None]
    positions = np.broadcast_to(np.arange(t), (n, t))

    from tokenpacker_tpu.models.llama import make_attention_bias

    bias = make_attention_bias(jnp.asarray(positions), jnp.asarray(key_valid), 0, t)
    emb = mpt_embed(params, jnp.asarray(ids))

    def mean_valid(h):
        m = jnp.asarray(key_valid)[..., None]
        return jnp.sum(h * m) / jnp.sum(m)

    ref, _ = mpt_apply(params, cfg, emb, bias, use_flash=False)
    got, _ = mpt_apply(params, cfg, emb, bias, use_flash=True)
    # compare only valid positions (flash ignores pad rows by causality)
    mask = key_valid[..., None]
    np.testing.assert_allclose(
        np.asarray(got) * mask, np.asarray(ref) * mask, rtol=2e-5, atol=2e-5
    )

    g_ref = jax.grad(lambda p: mean_valid(mpt_apply(p, cfg, emb, bias, use_flash=False)[0]))(params)
    g_got = jax.grad(lambda p: mean_valid(mpt_apply(p, cfg, emb, bias, use_flash=True)[0]))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4),
        g_got, g_ref,
    )


def test_prefix_lm_bias_semantics():
    """make_prefix_lm_bias: bidirectional inside the per-sample prefix,
    causal after, padding masked (the reference's hf_prefixlm_converter
    capability, expressed as an additive mask)."""
    from tokenpacker_tpu.models.mpt import make_prefix_lm_bias

    n, t = 2, 6
    positions = jnp.broadcast_to(jnp.arange(t), (n, t))
    key_valid = jnp.asarray([[True] * 6, [True] * 5 + [False]])
    prefix_lengths = jnp.asarray([3, 2])
    bias = np.asarray(make_prefix_lm_bias(positions, key_valid, prefix_lengths, t))
    allowed = bias[:, 0] == 0.0  # [N, T, S]
    # sample 0: query 0 sees keys 0..2 (prefix is bidirectional)
    assert allowed[0, 0].tolist() == [True, True, True, False, False, False]
    # sample 0: query 4 is causal
    assert allowed[0, 4].tolist() == [True, True, True, True, True, False]
    # sample 1: prefix 2 wide, key 5 padded out everywhere
    assert allowed[1, 0].tolist() == [True, True, False, False, False, False]
    assert allowed[1, 5].tolist() == [True, True, True, True, True, False]

    # and it runs through the decoder (use_flash must stay off for
    # non-causal biases)
    cfg = mpt_config(d_model=32, n_heads=4, n_layers=2, vocab_size=64, expansion_ratio=2)
    from tokenpacker_tpu.models.mpt import init_mpt, mpt_embed

    import jax

    params = init_mpt(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (n, t)))
    emb = mpt_embed(params, ids)
    hidden, _ = mpt_apply(params, cfg, emb, make_prefix_lm_bias(positions, key_valid, prefix_lengths, t), use_flash=False)
    assert np.isfinite(np.asarray(hidden)).all()
    # a later PREFIX token must influence an earlier prefix position
    # (bidirectional), unlike the causal mask
    from tokenpacker_tpu.models.llama import make_attention_bias

    causal_bias = make_attention_bias(positions, key_valid, 0, t)
    hidden_causal, _ = mpt_apply(params, cfg, emb, causal_bias, use_flash=False)
    diff = np.abs(np.asarray(hidden)[0, 0] - np.asarray(hidden_causal)[0, 0]).max()
    assert diff > 1e-6
