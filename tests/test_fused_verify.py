"""Parity tests for the fused-kernel verify step (speculative decoding
through ops/fused_decode.fused_verify_hidden), in Pallas interpret mode.

A verify step feeds T = k+1 tokens (last accepted + drafts) through one
weight-streaming pass; the in-kernel causal block scores the drafts. These
tests pin it against the XLA verify path (speculative._verify math) and
against the fused decode path itself (the greedy-parity invariant of
speculation rides on verify ≈ decode numerics).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenpacker_tpu.config import TokenPackerVLMConfig
from tokenpacker_tpu.models.llama import KVCache, llama_apply
from tokenpacker_tpu.ops.fused_decode import fused_verify_hidden
from tokenpacker_tpu.ops.layers import rms_norm

from test_fused_decode import NEG, build_params, prefill, tiny_cfg


def _xla_verify_hidden(params, cfg, cache, emb, lengths, step, pre, s):
    """speculative._verify attention semantics on the XLA path (post-norm)."""
    b, t, _ = emb.shape
    offs = jnp.arange(t, dtype=jnp.int32)
    positions = lengths[:, None] + step + offs[None, :]
    key_idx = jnp.arange(s)[None, None, :]
    prompt_ok = key_idx < lengths[:, None, None]
    dec_ok = (key_idx >= pre) & (key_idx <= pre + step + offs[None, :, None])
    bias = jnp.where((prompt_ok | dec_ok)[:, None], 0.0, NEG).astype(jnp.float32)
    cache_at = cache._replace(length=pre + step)
    return llama_apply(params, cfg, emb, positions, bias, cache_at)


@pytest.mark.parametrize("pack", [False, True])
def test_fused_verify_matches_xla_verify(pack):
    """Bucket-layout verify (speculative_chunk's _verify): hidden states at
    every fed position and the written K/V rows match the XLA path."""
    cfg = tiny_cfg(layers=2)
    params = build_params(cfg)
    if pack:
        from tokenpacker_tpu.ops.quantize import pack_fused_weights

        params = pack_fused_weights(params)
    b, s, pre, t, step = 2, 64, 16, 3, 2
    lengths = jnp.asarray([10, 16], jnp.int32)
    cache = prefill(params, cfg, b, s, pre, lengths)
    emb = (
        0.1 * jax.random.normal(jax.random.PRNGKey(7), (b, t, cfg.hidden_size))
    ).astype(jnp.bfloat16)

    hx, ncx = _xla_verify_hidden(params, cfg, cache, emb, lengths, step, pre, s)

    offs = jnp.arange(t, dtype=jnp.int32)
    wpos0 = jnp.full((b,), pre + step, jnp.int32)
    hf_pre, nk, nv = fused_verify_hidden(
        params, cfg, emb, cache.k, cache.v,
        lengths, jnp.full((b,), pre, jnp.int32), wpos0, wpos0,
        lengths[:, None] + step + offs[None, :], interpret=True,
    )
    hf = rms_norm(params["norm"], hf_pre)

    ax = np.asarray(hx, np.float32)
    af = np.asarray(hf, np.float32)
    assert np.max(np.abs(ax - af)) / (np.max(np.abs(ax)) + 1e-9) < 0.02
    for tt in range(t):
        kx = np.asarray(ncx.k[:, :, pre + step + tt], np.float32)
        kf = np.asarray(nk[:, :, pre + step + tt], np.float32)
        assert np.max(np.abs(kx - kf)) / (np.max(np.abs(kx)) + 1e-9) < 0.02
        vx = np.asarray(ncx.v[:, :, pre + step + tt], np.float32)
        vf = np.asarray(nv[:, :, pre + step + tt], np.float32)
        assert np.max(np.abs(vx - vf)) / (np.max(np.abs(vx)) + 1e-9) < 0.02


def test_verify_step_cb_dispatch_matches_xla(monkeypatch):
    """The public continuous-batching verify step produces matching logits
    through both dispatches (slot-contiguous caches, ragged fills)."""
    from tokenpacker_tpu import speculative as spec

    cfg_lm = tiny_cfg(layers=2)
    lm = build_params(cfg_lm)
    cfg = TokenPackerVLMConfig(lm=cfg_lm, dtype=jnp.bfloat16)
    params = {"lm": lm}
    b, s, t = 2, 64, 3
    cur_lens = jnp.asarray([12, 31], jnp.int32)
    cache = prefill(lm, cfg_lm, b, s, 32, cur_lens)
    tokens = jnp.asarray([[5, 9, 11], [3, 7, 2]], jnp.int32)
    active = jnp.ones((b,), bool)

    monkeypatch.setenv("TOKENPACKER_FUSED_DECODE", "0")
    jax.clear_caches()
    lx, ncx = spec.verify_step_cb(params, cfg, cache, tokens, cur_lens, active)
    monkeypatch.setenv("TOKENPACKER_FUSED_DECODE", "interpret")
    jax.clear_caches()
    lf, ncf = spec.verify_step_cb(params, cfg, cache, tokens, cur_lens, active)
    jax.clear_caches()

    ax = np.asarray(lx, np.float32)
    af = np.asarray(lf, np.float32)
    assert np.max(np.abs(ax - af)) / (np.max(np.abs(ax)) + 1e-9) < 0.03
    assert (np.asarray(ncf.length) == np.asarray(cur_lens)).all()
    # written rows land at cur_lens[i] + j on both paths
    for i in range(b):
        for j in range(t):
            kx = np.asarray(ncx.k[:, i, int(cur_lens[i]) + j], np.float32)
            kf = np.asarray(ncf.k[:, i, int(cur_lens[i]) + j], np.float32)
            assert np.max(np.abs(kx - kf)) / (np.max(np.abs(kx)) + 1e-9) < 0.03


def test_verify_consistent_with_qg_decode(monkeypatch):
    """Speculation's greedy-parity invariant needs verify logits ==
    decode-step logits for the same fed prefix. With decode on the qg
    attention form (TOKENPACKER_FD_ATTN=qg), a T-token fused verify and T
    single-token fused decode steps run IDENTICAL per-row accumulation
    (row-independent GEMV chains; per-column attention dots), so the match
    is near-exact — far tighter than the bf16-reorder tolerance."""
    from tokenpacker_tpu.ops.fused_decode import fused_decode_hidden

    monkeypatch.setenv("TOKENPACKER_FD_ATTN", "qg")
    jax.clear_caches()
    cfg = tiny_cfg(layers=2)
    params = build_params(cfg)
    b, s, pre, t, step0 = 2, 64, 16, 3, 0
    lengths = jnp.asarray([10, 16], jnp.int32)
    cache = prefill(params, cfg, b, s, pre, lengths)
    emb = (
        0.1 * jax.random.normal(jax.random.PRNGKey(9), (b, t, cfg.hidden_size))
    ).astype(jnp.bfloat16)

    # T single-token fused decode steps (qg form)
    ck, cv = cache.k, cache.v
    h_steps = []
    for j in range(t):
        wpos = jnp.full((b,), pre + step0 + j, jnp.int32)
        h, ck, cv = fused_decode_hidden(
            params, cfg, emb[:, j], ck, cv,
            lengths, jnp.full((b,), pre, jnp.int32), wpos, wpos,
            positions=lengths + step0 + j, interpret=True,
        )
        h_steps.append(np.asarray(h, np.float32))

    offs = jnp.arange(t, dtype=jnp.int32)
    wpos0 = jnp.full((b,), pre + step0, jnp.int32)
    hv, _, _ = fused_verify_hidden(
        params, cfg, emb, cache.k, cache.v,
        lengths, jnp.full((b,), pre, jnp.int32), wpos0, wpos0,
        lengths[:, None] + step0 + offs[None, :], interpret=True,
    )
    hv = np.asarray(hv, np.float32)
    jax.clear_caches()

    for j in range(t):
        diff = np.max(np.abs(h_steps[j] - hv[:, j]))
        denom = np.max(np.abs(h_steps[j])) + 1e-9
        assert diff / denom < 1e-3, (j, diff / denom)


def test_fused_verify_split_geometry(monkeypatch):
    """T>1 verify through the 13B shape class (3D > MAX_WIDE qkv column
    segments + gate/up column splits + down k-splits, MAX_WIDE patched so a
    CPU-sized model exercises the machinery)."""
    import tokenpacker_tpu.ops.fused_decode as fd
    from tokenpacker_tpu.config import LMConfig

    monkeypatch.setattr(fd, "MAX_WIDE", 1024)
    monkeypatch.setenv("TOKENPACKER_FD_CK", "256")
    jax.clear_caches()
    cfg = LMConfig(
        vocab_size=128,
        hidden_size=512,
        intermediate_size=2560,
        num_hidden_layers=2,
        num_attention_heads=4,
        model_family="llama",
    )
    params = build_params(cfg)
    b, s, pre, t, step = 2, 32, 8, 2, 0
    lengths = jnp.asarray([5, 8], jnp.int32)
    cache = prefill(params, cfg, b, s, pre, lengths)
    emb = (
        0.1 * jax.random.normal(jax.random.PRNGKey(11), (b, t, cfg.hidden_size))
    ).astype(jnp.bfloat16)

    hx, _ = _xla_verify_hidden(params, cfg, cache, emb, lengths, step, pre, s)
    offs = jnp.arange(t, dtype=jnp.int32)
    wpos0 = jnp.full((b,), pre + step, jnp.int32)
    hf_pre, _, _ = fused_verify_hidden(
        params, cfg, emb, cache.k, cache.v,
        lengths, jnp.full((b,), pre, jnp.int32), wpos0, wpos0,
        lengths[:, None] + step + offs[None, :], interpret=True,
    )
    hf = rms_norm(params["norm"], hf_pre)
    ax = np.asarray(hx, np.float32)
    af = np.asarray(hf, np.float32)
    assert np.max(np.abs(ax - af)) / (np.max(np.abs(ax)) + 1e-9) < 0.02
    jax.clear_caches()


def test_speculative_chunk_fused_runs(monkeypatch):
    """speculative_chunk with the fused verify inside the while_loop:
    produces >= n_max tokens, advances the bookkeeping, and every emitted
    token is a real vocab id (the full dispatch + acceptance path)."""
    from tokenpacker_tpu import speculative as spec

    monkeypatch.setenv("TOKENPACKER_FUSED_DECODE", "interpret")
    jax.clear_caches()
    cfg_lm = tiny_cfg(layers=2)
    lm = build_params(cfg_lm)
    cfg = TokenPackerVLMConfig(lm=cfg_lm, dtype=jnp.bfloat16)
    params = {"lm": lm}
    s, pre, k, n_max = 64, 16, 3, 6
    lengths = jnp.asarray([10], jnp.int32)
    cache = prefill(lm, cfg_lm, 1, s, pre, lengths)

    ctx = np.full((64,), -1, np.int32)
    ctx[:10] = [2, 3, 4, 5, 2, 3, 4, 5, 2, 3]  # repetitive: drafts fire
    out, produced, _, _, _, _, rounds = spec.speculative_chunk(
        params, cfg, cache, jnp.asarray(ctx), jnp.asarray(10, jnp.int32),
        lengths, jnp.asarray(7, jnp.int32), jnp.asarray(0, jnp.int32),
        pre, n_max, k,
    )
    jax.clear_caches()
    produced = int(produced)
    assert produced >= n_max
    assert int(rounds) >= 1
    toks = np.asarray(out)[:produced]
    assert ((toks >= 0) & (toks < cfg_lm.vocab_size)).all()


def test_fused_verify_matches_xla_verify_int8_kv():
    """Verify (T>1, qg attention form) over an int8-quantized cache: the
    kernel's int8 staging + factored scales + in-kernel qdq of the fed
    tokens' k/v must match the XLA int8-cache verify path (VERDICT r3
    item 2 — the composition covers decode AND speculative verify)."""
    cfg = tiny_cfg(layers=2)
    params = build_params(cfg)
    b, s, pre, t, step = 2, 64, 16, 3, 2
    lengths = jnp.asarray([10, 16], jnp.int32)
    cache = prefill(params, cfg, b, s, pre, lengths, cache_dtype=jnp.int8)
    assert cache.k_scale is not None
    emb = (
        0.1 * jax.random.normal(jax.random.PRNGKey(7), (b, t, cfg.hidden_size))
    ).astype(jnp.bfloat16)

    hx, ncx = _xla_verify_hidden(params, cfg, cache, emb, lengths, step, pre, s)

    offs = jnp.arange(t, dtype=jnp.int32)
    wpos0 = jnp.full((b,), pre + step, jnp.int32)
    hf_pre, nk, nv, nks, nvs = fused_verify_hidden(
        params, cfg, emb, cache.k, cache.v,
        lengths, jnp.full((b,), pre, jnp.int32), wpos0, wpos0,
        lengths[:, None] + step + offs[None, :], interpret=True,
        k_scale=cache.k_scale, v_scale=cache.v_scale,
    )
    hf = rms_norm(params["norm"], hf_pre)

    ax = np.asarray(hx, np.float32)
    af = np.asarray(hf, np.float32)
    assert np.max(np.abs(ax - af)) / (np.max(np.abs(ax)) + 1e-9) < 0.02
    # written int8 rows + scales track the XLA writes (+-1 LSB wobble from
    # bf16 accumulation-order differences upstream of the quantizer)
    for tt in range(t):
        kx = np.asarray(ncx.k[:, :, pre + step + tt], np.int32)
        kf = np.asarray(nk[:, :, pre + step + tt], np.int32)
        assert np.mean(np.abs(kx - kf) <= 1) > 0.99
        sx = np.asarray(ncx.k_scale[:, :, pre + step + tt], np.float32)
        sf = np.asarray(nks[:, :, pre + step + tt], np.float32)
        assert np.max(np.abs(sx - sf)) / (np.max(np.abs(sx)) + 1e-9) < 0.02
