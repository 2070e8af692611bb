"""Parity tests for the single-dispatch fused decode kernel
(ops/fused_decode.py) against the per-layer XLA decode path, in Pallas
interpret mode on CPU.

The kernel replaces the whole int8 llama decoder stack for one decode step;
numerics differ from the XLA path only by f32-vs-bf16 accumulation order, so
hidden states are compared at ~1% relative tolerance and greedy argmax is
checked on well-separated logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenpacker_tpu.config import LMConfig
from tokenpacker_tpu.models.llama import (
    KVCache,
    init_llama,
    llama_apply,
    make_attention_bias,
)
from tokenpacker_tpu.ops.fused_decode import fused_decode_hidden, fused_eligible
from tokenpacker_tpu.ops.layers import rms_norm
from tokenpacker_tpu.ops.quantize import fuse_llama_layers, quantize_tree

NEG = jnp.finfo(jnp.float32).min


def tiny_cfg(layers=2):
    return LMConfig(
        vocab_size=256,
        hidden_size=512,
        intermediate_size=1024,
        num_hidden_layers=layers,
        num_attention_heads=4,
        model_family="llama",
    )


def build_params(cfg, seed=0):
    params = init_llama(jax.random.PRNGKey(seed), cfg, dtype=jnp.float32)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    return quantize_tree(fuse_llama_layers(params), min_size=1)


def xla_decode(params, cfg, cache, emb, lengths, step, prefill_len, s):
    pos = (lengths + step)[:, None]
    key_idx = jnp.arange(s)[None, :]
    kv = (key_idx < lengths[:, None]) | (
        (key_idx >= prefill_len) & (key_idx <= prefill_len + step)
    )
    bias = jnp.where(kv[:, None, None, :], 0.0, NEG).astype(jnp.float32)
    cache_at = cache._replace(length=prefill_len + step)
    hidden, new_cache = llama_apply(params, cfg, emb, pos, bias, cache_at)
    return hidden[:, 0], new_cache


def prefill(params, cfg, b, s, pre, lengths, seed=1, cache_dtype=jnp.bfloat16):
    emb = (
        0.1 * jax.random.normal(jax.random.PRNGKey(seed), (b, pre, cfg.hidden_size))
    ).astype(jnp.bfloat16)
    cache = KVCache.create(cfg, b, s, dtype=cache_dtype)
    positions = jnp.broadcast_to(jnp.arange(pre), (b, pre))
    key_valid = jnp.arange(s)[None, :] < lengths[:, None]
    bias = make_attention_bias(positions, key_valid, 0, s)
    _, cache = llama_apply(params, cfg, emb, positions, bias, cache)
    return cache


def test_eligibility():
    cfg = tiny_cfg()
    q = build_params(cfg)
    assert fused_eligible(q, cfg)
    # dense params: not eligible
    dense = init_llama(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    assert not fused_eligible(dense, cfg)
    assert not fused_eligible(fuse_llama_layers(dense), cfg)
    # mpt family: not eligible
    assert not fused_eligible(q, LMConfig(model_family="mpt", alibi=True))


def test_fused_matches_xla_decode_two_range():
    """decode_step semantics: ragged prompts + contiguous decoded span."""
    cfg = tiny_cfg()
    params = build_params(cfg)
    b, s, pre = 2, 64, 16
    lengths = jnp.asarray([10, 16], jnp.int32)
    cache = prefill(params, cfg, b, s, pre, lengths)

    cache_x = cache_f = cache
    rng = jax.random.PRNGKey(7)
    for step in range(3):
        rng, sub = jax.random.split(rng)
        emb = (0.1 * jax.random.normal(sub, (b, 1, cfg.hidden_size))).astype(jnp.bfloat16)
        hx, nx = xla_decode(params, cfg, cache_x, emb, lengths, step, pre, s)
        cache_x = KVCache(nx.k, nx.v, cache_x.length)

        wpos = jnp.full((b,), pre + step, jnp.int32)
        hf_pre, nk, nv = fused_decode_hidden(
            params, cfg, emb[:, 0], cache_f.k, cache_f.v,
            lengths, jnp.full((b,), pre, jnp.int32), wpos, wpos,
            positions=lengths + step, interpret=True,
        )
        cache_f = KVCache(nk, nv, cache_f.length)
        hf = rms_norm(params["norm"], hf_pre)

        ax = np.asarray(hx, np.float32)
        af = np.asarray(hf, np.float32)
        denom = np.max(np.abs(ax)) + 1e-9
        assert np.max(np.abs(ax - af)) / denom < 0.02, (step, np.max(np.abs(ax - af)))
        # the freshly written cache row must agree (bf16-rounded)
        rows = np.arange(b)
        for c_x, c_f in ((cache_x.k, cache_f.k), (cache_x.v, cache_f.v)):
            dx = np.asarray(
                (c_x[:, rows, pre + step] - c_f[:, rows, pre + step]).astype(jnp.float32)
            )
            assert np.max(np.abs(dx)) < 0.05


def test_fused_matches_xla_decode_pipelined_geometry():
    """A config with >=2 K-chunks per segment exercises the cross-segment
    prefetch hooks + shared-ring parity (the production code path; the tiny
    config above covers the non-pipelined fallback)."""
    cfg = LMConfig(
        vocab_size=128,
        hidden_size=1024,
        intermediate_size=2048,
        num_hidden_layers=2,
        num_attention_heads=8,
        model_family="llama",
    )
    params = build_params(cfg)
    assert fused_eligible(params, cfg)
    b, s, pre = 2, 32, 8
    lengths = jnp.asarray([5, 8], jnp.int32)
    cache = prefill(params, cfg, b, s, pre, lengths)

    emb = (0.1 * jax.random.normal(jax.random.PRNGKey(5), (b, 1, cfg.hidden_size))).astype(
        jnp.bfloat16
    )
    hx, _ = xla_decode(params, cfg, cache, emb, lengths, 0, pre, s)
    wpos = jnp.full((b,), pre, jnp.int32)
    hf_pre, _, _ = fused_decode_hidden(
        params, cfg, emb[:, 0], cache.k, cache.v,
        lengths, wpos, wpos, wpos, positions=lengths, interpret=True,
    )
    hf = rms_norm(params["norm"], hf_pre)
    ax = np.asarray(hx, np.float32)
    af = np.asarray(hf, np.float32)
    assert np.max(np.abs(ax - af)) / (np.max(np.abs(ax)) + 1e-9) < 0.02


def test_fused_matches_xla_decode_f_tail_geometry():
    """intermediate_size NOT a multiple of ck_f (1024) exercises the
    down-projection tail chunk (production 7B: 11008 % 1024 = 768) —
    _start_tail/_wait_tail and the tail-specific hook schedule."""
    cfg = LMConfig(
        vocab_size=128,
        hidden_size=1024,
        intermediate_size=2304,  # 2 main chunks + 256-row tail
        num_hidden_layers=2,
        num_attention_heads=8,
        model_family="llama",
    )
    params = build_params(cfg)
    assert fused_eligible(params, cfg)
    b, s, pre = 3, 32, 8
    lengths = jnp.asarray([4, 6, 8], jnp.int32)
    cache = prefill(params, cfg, b, s, pre, lengths)

    emb = (0.1 * jax.random.normal(jax.random.PRNGKey(9), (b, 1, cfg.hidden_size))).astype(
        jnp.bfloat16
    )
    hx, _ = xla_decode(params, cfg, cache, emb, lengths, 0, pre, s)
    wpos = jnp.full((b,), pre, jnp.int32)
    hf_pre, _, _ = fused_decode_hidden(
        params, cfg, emb[:, 0], cache.k, cache.v,
        lengths, wpos, wpos, wpos, positions=lengths, interpret=True,
    )
    hf = rms_norm(params["norm"], hf_pre)
    ax = np.asarray(hx, np.float32)
    af = np.asarray(hf, np.float32)
    assert np.max(np.abs(ax - af)) / (np.max(np.abs(ax)) + 1e-9) < 0.02


def test_debug_env_blocks_dispatch(monkeypatch):
    """A leftover kernel-bisection TOKENPACKER_FD_DEBUG env var must never
    reach the serving dispatch (its stubs produce wrong logits)."""
    from tokenpacker_tpu.config import TokenPackerVLMConfig
    from tokenpacker_tpu.generate import _fused_decode_mode
    from tokenpacker_tpu.models.llama import KVCache

    cfg_lm = tiny_cfg()
    params = {"lm": build_params(cfg_lm)}
    cfg = TokenPackerVLMConfig(lm=cfg_lm, dtype=jnp.bfloat16)
    cache = KVCache.create(cfg_lm, 1, 32, dtype=jnp.bfloat16)
    monkeypatch.setenv("TOKENPACKER_FUSED_DECODE", "interpret")
    assert _fused_decode_mode(params, cfg, cache) == "interpret"
    monkeypatch.setenv("TOKENPACKER_FD_DEBUG", "noattn")
    assert _fused_decode_mode(params, cfg, cache) is None
    monkeypatch.delenv("TOKENPACKER_FD_DEBUG")
    # non-bf16 caches and deep caches stay on the XLA path
    cache32 = KVCache.create(cfg_lm, 1, 32, dtype=jnp.float32)
    assert _fused_decode_mode(params, cfg, cache32) is None
    deep = KVCache.create(cfg_lm, 1, 2048, dtype=jnp.bfloat16)
    assert _fused_decode_mode(params, cfg, deep) is None


@pytest.mark.parametrize("staging", ["batched", "perb"])
def test_fused_matches_xla_decode_cb(staging, monkeypatch):
    """decode_step_cb semantics: slot-contiguous caches, per-slot lengths.
    Parametrized over both cache-staging modes (whole-batch single DMA vs
    the per-sample fallback when the scratch exceeds the scoped-vmem)."""
    if staging == "perb":
        monkeypatch.setenv("TOKENPACKER_FD_CACHE", "perb")
        # the env flag is read at TRACE time: without a cache clear this
        # parametrization would silently reuse the executable compiled for
        # the batched-staging run (identical avals) and test nothing
        jax.clear_caches()
    cfg = tiny_cfg()
    params = build_params(cfg)
    b, s = 2, 64
    cur_lens = jnp.asarray([12, 31], jnp.int32)
    # prefill both slots contiguously (per-slot lengths = cur_lens)
    cache = prefill(params, cfg, b, s, 32, cur_lens)

    emb = (0.1 * jax.random.normal(jax.random.PRNGKey(3), (b, 1, cfg.hidden_size))).astype(
        jnp.bfloat16
    )
    # XLA: decode_step_cb math inline
    key_idx = jnp.arange(s)[None, :]
    kv = key_idx <= cur_lens[:, None]
    bias = jnp.where(kv[:, None, None, :], 0.0, NEG).astype(jnp.float32)
    cache_at = KVCache(cache.k, cache.v, cur_lens)
    hx, _ = llama_apply(params, cfg, emb, cur_lens[:, None], bias, cache_at)
    hx = hx[:, 0]

    zeros = jnp.zeros((b,), jnp.int32)
    hf_pre, _, _ = fused_decode_hidden(
        params, cfg, emb[:, 0], cache.k, cache.v,
        cur_lens, zeros, zeros, cur_lens, positions=cur_lens, interpret=True,
    )
    hf = rms_norm(params["norm"], hf_pre)
    ax = np.asarray(hx, np.float32)
    af = np.asarray(hf, np.float32)
    assert np.max(np.abs(ax - af)) / (np.max(np.abs(ax)) + 1e-9) < 0.02


def test_fused_greedy_tokens_match():
    """End-to-end: generate.decode_step dispatches to the kernel when the
    env flag is set and produces the same greedy tokens as the XLA path."""
    import os

    from tokenpacker_tpu import generate as gen
    from tokenpacker_tpu.config import TokenPackerVLMConfig, VisionConfig

    cfg_lm = tiny_cfg()
    lm = build_params(cfg_lm)
    cfg = TokenPackerVLMConfig(
        vision=VisionConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=1,
            num_attention_heads=2, image_size=42, patch_size=14,
        ),
        lm=cfg_lm,
        dtype=jnp.bfloat16,
    )
    params = {"lm": lm}
    b, l = 2, 16
    token_ids = np.full((b, l), 5, np.int32)
    token_ids[0, :9] = np.arange(2, 11)
    batch = {
        "token_ids": jnp.asarray(token_ids),
        "is_image": jnp.zeros((b, l), bool),
        "image_slot": jnp.zeros((b, l), jnp.int32),
        "lengths": jnp.asarray([9, 16], jnp.int32),
        "images": None,
    }
    s_max = l + 8

    logits, cache = gen.prefill(params, cfg, batch, s_max)
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def run(fused: bool):
        os.environ["TOKENPACKER_FUSED_DECODE"] = "interpret" if fused else "0"
        toks, lgs = [], []
        c = cache
        for step in range(4):
            # feed a FIXED token stream to both runs so the trajectories
            # stay comparable even if a near-tie argmax differs
            t = jnp.full((b,), (step * 7 + 3) % 256, jnp.int32)
            lg, c = gen.decode_step(
                params, cfg, c, t, batch["lengths"], jnp.asarray(step, jnp.int32), l
            )
            toks.append(np.asarray(jnp.argmax(lg, axis=-1)))
            lgs.append(np.asarray(lg, np.float32))
        os.environ.pop("TOKENPACKER_FUSED_DECODE", None)
        return np.stack(toks), np.stack(lgs)

    ref_t, ref_l = run(fused=False)
    got_t, got_l = run(fused=True)
    # logits agree tightly; greedy tokens must agree wherever the XLA
    # path's top-2 margin exceeds the numeric slack (random untrained
    # weights produce near-ties that bf16 reassociation can flip)
    scale_ = np.max(np.abs(ref_l))
    diff = np.max(np.abs(ref_l - got_l))
    assert diff / (scale_ + 1e-9) < 0.03
    srt = np.sort(ref_l, axis=-1)
    margin = srt[..., -1] - srt[..., -2]
    decisive = margin > 5 * diff
    assert decisive.any()
    assert (ref_t == got_t)[decisive].all(), (ref_t, got_t, decisive)


@pytest.mark.parametrize("pack", [False, True])
def test_fused_w8a8_close_to_xla(pack, monkeypatch):
    """TOKENPACKER_FD_W8A8=1: native s8 MXU dots with dynamic per-row
    activation quantization. Numerics drift by the activation rounding
    (~0.8% per GEMV), so the tolerance is looser than the bf16-reorder
    tests. Uses a 3-layer geometry so the jitted _fused_call cannot reuse
    an executable traced with the flag off (env flags are trace-time).
    pack=True composes the u16-row-packed weight storage (the s8 dots must
    consume the bitcast-recovered rows identically)."""
    monkeypatch.setenv("TOKENPACKER_FD_W8A8", "1")
    cfg = tiny_cfg(layers=3)
    params = build_params(cfg, seed=11)
    if pack:
        from tokenpacker_tpu.ops.quantize import pack_fused_weights

        params = pack_fused_weights(params)
    b, s, pre = 2, 64, 16
    lengths = jnp.asarray([10, 16], jnp.int32)
    cache = prefill(params, cfg, b, s, pre, lengths)

    emb = (0.1 * jax.random.normal(jax.random.PRNGKey(5), (b, 1, cfg.hidden_size))).astype(
        jnp.bfloat16
    )
    hx, _ = xla_decode(params, cfg, cache, emb, lengths, 0, pre, s)
    wpos = jnp.full((b,), pre, jnp.int32)
    hf_pre, _, _ = fused_decode_hidden(
        params, cfg, emb[:, 0], cache.k, cache.v,
        lengths, wpos, wpos, wpos, positions=lengths, interpret=True,
    )
    hf = rms_norm(params["norm"], hf_pre)
    ax = np.asarray(hx, np.float32)
    af = np.asarray(hf, np.float32)
    rel = np.max(np.abs(ax - af)) / (np.max(np.abs(ax)) + 1e-9)
    assert rel < 0.08, rel
    # and it must really have changed the numerics vs the exact-int8 path
    # (guards against the flag silently not reaching the kernel): rerun with
    # the flag off — activation-quant rounding must move the output
    monkeypatch.delenv("TOKENPACKER_FD_W8A8")
    jax.clear_caches()  # env flags are trace-time
    hf_exact_pre, _, _ = fused_decode_hidden(
        params, cfg, emb[:, 0], cache.k, cache.v,
        lengths, wpos, wpos, wpos, positions=lengths, interpret=True,
    )
    ae = np.asarray(rms_norm(params["norm"], hf_exact_pre), np.float32)
    assert np.max(np.abs(ae - af)) > 0, "w8a8 flag did not reach the kernel"
    jax.clear_caches()  # don't leak 3-layer executables to other tests


@pytest.mark.parametrize("ring", ["3", "4"])
def test_fused_ring_depth_parity(ring, monkeypatch):
    """TOKENPACKER_FD_RING deepens the weight ring (more DMA streams in
    flight — the depth-2 chain floor measured 412 GB/s, half of HBM peak).
    Parity must hold with the cross-segment hooks ENGAGED: FD_CK=256 gives
    d//ck=4 chunks per segment >= nslots."""
    monkeypatch.setenv("TOKENPACKER_FD_RING", ring)
    monkeypatch.setenv("TOKENPACKER_FD_CK", "256")
    jax.clear_caches()  # env flags are trace-time
    cfg = LMConfig(
        vocab_size=128,
        hidden_size=1024,
        intermediate_size=2048,
        num_hidden_layers=2,
        num_attention_heads=8,
        model_family="llama",
    )
    params = build_params(cfg)
    b, s, pre = 2, 32, 8
    lengths = jnp.asarray([5, 8], jnp.int32)
    cache = prefill(params, cfg, b, s, pre, lengths)
    emb = (0.1 * jax.random.normal(jax.random.PRNGKey(5), (b, 1, cfg.hidden_size))).astype(
        jnp.bfloat16
    )
    hx, _ = xla_decode(params, cfg, cache, emb, lengths, 0, pre, s)
    wpos = jnp.full((b,), pre, jnp.int32)
    hf_pre, _, _ = fused_decode_hidden(
        params, cfg, emb[:, 0], cache.k, cache.v,
        lengths, wpos, wpos, wpos, positions=lengths, interpret=True,
    )
    hf = rms_norm(params["norm"], hf_pre)
    ax = np.asarray(hx, np.float32)
    af = np.asarray(hf, np.float32)
    assert np.max(np.abs(ax - af)) / (np.max(np.abs(ax)) + 1e-9) < 0.02
    jax.clear_caches()  # don't leak FD_CK=256 executables to other tests


def test_fused_packed_weights_parity():
    """u16-row-packed weight storage (ops/quantize.pack_fused_weights): the
    v5e DMA engine streams 16-bit tiles ~2.5x the byte rate of int8's
    packed tile format, so the fused kernel's weight ring can stream packed
    rows and recover int8 via bitcast. Parity across the pipelined and
    f-tail geometries, plus the XLA fallback path (linear unpacks qp)."""
    from tokenpacker_tpu.ops.quantize import pack_fused_weights

    for cfg in (
        LMConfig(vocab_size=128, hidden_size=1024, intermediate_size=2048,
                 num_hidden_layers=2, num_attention_heads=8,
                 model_family="llama"),
        LMConfig(vocab_size=128, hidden_size=1024, intermediate_size=2304,
                 num_hidden_layers=2, num_attention_heads=8,
                 model_family="llama"),
    ):
        params = build_params(cfg)
        packed = pack_fused_weights(params)
        assert fused_eligible(packed, cfg)
        assert packed["layers"]["attn"]["qkv"]["kernel"]["qp"].dtype == jnp.uint16
        b, s, pre = 2, 32, 8
        lengths = jnp.asarray([5, 8], jnp.int32)
        cache = prefill(params, cfg, b, s, pre, lengths)
        emb = (0.1 * jax.random.normal(jax.random.PRNGKey(5), (b, 1, cfg.hidden_size))).astype(jnp.bfloat16)
        hx, _ = xla_decode(params, cfg, cache, emb, lengths, 0, pre, s)
        wpos = jnp.full((b,), pre, jnp.int32)
        hf_pre, _, _ = fused_decode_hidden(
            packed, cfg, emb[:, 0], cache.k, cache.v,
            lengths, wpos, wpos, wpos, positions=lengths, interpret=True,
        )
        hf = rms_norm(params["norm"], hf_pre)
        ax = np.asarray(hx, np.float32)
        af = np.asarray(hf, np.float32)
        assert np.max(np.abs(ax - af)) / (np.max(np.abs(ax)) + 1e-9) < 0.02
        # XLA fallback consumes qp too (llama_apply -> linear unpack)
        hx2, _ = xla_decode(packed, cfg, cache, emb, lengths, 0, pre, s)
        np.testing.assert_allclose(
            np.asarray(hx2, np.float32), ax, rtol=1e-5, atol=1e-5
        )


def test_pack_unpack_roundtrip_and_pairing():
    """pack_int8_rows must match pltpu.bitcast's measured sublane pairing:
    u16 row r = (lo byte = int8 row 2r, hi byte = row 2r+1), same column."""
    from tokenpacker_tpu.ops.quantize import pack_int8_rows, unpack_int8_rows

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-128, 128, (3, 8, 16)), jnp.int8)
    qp = pack_int8_rows(q)
    assert qp.dtype == jnp.uint16 and qp.shape == (3, 4, 16)
    assert (np.asarray(unpack_int8_rows(qp)) == np.asarray(q)).all()
    u16 = np.asarray(qp)
    u8 = np.asarray(q).astype(np.uint8)
    assert (u16[..., 0, :] & 0xFF == u8[..., 0, :]).all()
    assert (u16[..., 0, :] >> 8 == u8[..., 1, :]).all()


@pytest.mark.parametrize("pack", [False, True])
def test_fused_mlp_column_splits(pack, monkeypatch):
    """F > MAX_WIDE geometry (the 13B shape class): gate/up stream as
    column segments with matching down-projection k-splits, and 3D >
    MAX_WIDE streams q/k/v as separate column segments. MAX_WIDE is
    patched down so a CPU-sized model exercises all the split machinery
    (3 qkv segs + 3 MLP splits + hooks via FD_CK=256); pack=True layers
    the u16-row-packed storage over the k-split row offsets."""
    import tokenpacker_tpu.ops.fused_decode as fd

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
    if pack:
        from tokenpacker_tpu.ops.quantize import pack_fused_weights

        params = pack_fused_weights(params)
    assert fused_eligible(params, cfg)
    b, s, pre = 2, 32, 8
    lengths = jnp.asarray([5, 8], jnp.int32)
    cache = prefill(params, cfg, b, s, pre, lengths)
    emb = (0.1 * jax.random.normal(jax.random.PRNGKey(7), (b, 1, cfg.hidden_size))).astype(
        jnp.bfloat16
    )
    hx, _ = xla_decode(params, cfg, cache, emb, lengths, 0, pre, s)
    wpos = jnp.full((b,), pre, jnp.int32)
    hf_pre, _, _ = fused_decode_hidden(
        params, cfg, emb[:, 0], cache.k, cache.v,
        lengths, wpos, wpos, wpos, positions=lengths, interpret=True,
    )
    hf = rms_norm(params["norm"], hf_pre)
    ax = np.asarray(hx, np.float32)
    af = np.asarray(hf, np.float32)
    assert np.max(np.abs(ax - af)) / (np.max(np.abs(ax)) + 1e-9) < 0.02
    jax.clear_caches()


def test_fused_13b_geometry_eligible_and_parity():
    """TRUE 13B widths (5120 / 13824 / 40 heads) at 1 layer: eligibility
    now passes (the round-2 hidden<=4096 / F<=12288 gates are lifted) and
    the interpret kernel matches the XLA path."""
    cfg = LMConfig(
        vocab_size=64,
        hidden_size=5120,
        intermediate_size=13824,
        num_hidden_layers=1,
        num_attention_heads=40,
        model_family="llama",
    )
    params = build_params(cfg)
    assert fused_eligible(params, cfg)
    b, s, pre = 1, 16, 4
    lengths = jnp.asarray([4], jnp.int32)
    cache = prefill(params, cfg, b, s, pre, lengths)
    emb = (0.1 * jax.random.normal(jax.random.PRNGKey(3), (b, 1, cfg.hidden_size))).astype(
        jnp.bfloat16
    )
    hx, _ = xla_decode(params, cfg, cache, emb, lengths, 0, pre, s)
    wpos = jnp.full((b,), pre, jnp.int32)
    hf_pre, _, _ = fused_decode_hidden(
        params, cfg, emb[:, 0], cache.k, cache.v,
        lengths, wpos, wpos, wpos, positions=lengths, interpret=True,
    )
    hf = rms_norm(params["norm"], hf_pre)
    ax = np.asarray(hx, np.float32)
    af = np.asarray(hf, np.float32)
    assert np.max(np.abs(ax - af)) / (np.max(np.abs(ax)) + 1e-9) < 0.02


def test_fused_matches_xla_decode_int8_kv():
    """int8 KV cache × fused kernel composition (VERDICT r3 item 2): the
    kernel stages int8 K/V + per-(position, head) scales, dequantizes via
    the factored scales, quantize-dequantizes the NEW token in-kernel (the
    XLA path attends through the cache's int8 representation), and the
    wrapper's quantize_kv reproduces the in-kernel (int8, scale) pair —
    multi-step parity vs the XLA int8-cache decode including cache-write
    equivalence."""
    cfg = tiny_cfg()
    params = build_params(cfg)
    b, s, pre = 2, 64, 16
    lengths = jnp.asarray([10, 16], jnp.int32)
    cache = prefill(params, cfg, b, s, pre, lengths, cache_dtype=jnp.int8)
    assert cache.k.dtype == jnp.int8 and cache.k_scale is not None

    cache_x = cache_f = cache
    rng = jax.random.PRNGKey(7)
    for step in range(3):
        rng, sub = jax.random.split(rng)
        emb = (0.1 * jax.random.normal(sub, (b, 1, cfg.hidden_size))).astype(jnp.bfloat16)
        hx, nx = xla_decode(params, cfg, cache_x, emb, lengths, step, pre, s)
        cache_x = nx._replace(length=cache_x.length)

        wpos = jnp.full((b,), pre + step, jnp.int32)
        hf_pre, nk, nv, nks, nvs = fused_decode_hidden(
            params, cfg, emb[:, 0], cache_f.k, cache_f.v,
            lengths, jnp.full((b,), pre, jnp.int32), wpos, wpos,
            positions=lengths + step, interpret=True,
            k_scale=cache_f.k_scale, v_scale=cache_f.v_scale,
        )
        cache_f = KVCache(nk, nv, cache_f.length, nks, nvs)
        hf = rms_norm(params["norm"], hf_pre)

        ax = np.asarray(hx, np.float32)
        af = np.asarray(hf, np.float32)
        denom = np.max(np.abs(ax)) + 1e-9
        assert np.max(np.abs(ax - af)) / denom < 0.02, (step, np.max(np.abs(ax - af)) / denom)
        # the written int8 rows + scales track the XLA path's quantized
        # writes closely (both quantize their own bf16 k/v, which differ by
        # accumulation order only — allow +-1 LSB wobble on a few lanes)
        kx = np.asarray(cache_x.k[:, :, pre + step], np.int32)
        kf = np.asarray(cache_f.k[:, :, pre + step], np.int32)
        assert np.mean(np.abs(kx - kf) <= 1) > 0.99


def test_fused_int8_kv_write_roundtrip():
    """The wrapper's quantize_kv must reproduce the kernel's in-kernel
    quantize-dequantize bit-exactly: dequantizing the written (int8, scale)
    row reproduces the qdq'd value the attention actually used."""
    from tokenpacker_tpu.ops.kv_quant import dequantize_kv, quantize_kv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 8, 128)), jnp.float32).astype(jnp.bfloat16)
    # emulate the kernel's qdq
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s_ = jnp.maximum(amax, 1e-8) / 127.0
    qdq = (jnp.round(x32 / s_) * s_).astype(jnp.bfloat16)
    q, sc = quantize_kv(qdq)
    np.testing.assert_array_equal(
        np.asarray(dequantize_kv(q, sc)), np.asarray(qdq)
    )
