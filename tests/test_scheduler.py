"""Continuous-batching scheduler tests.

Gold standard: requests served through the slot-based batched executor —
including requests admitted mid-flight while others are decoding — must
produce exactly the same greedy tokens as Generator one at a time.
"""

import time

import numpy as np
import pytest

import jax

from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX
from tokenpacker_tpu.generate import Generator
from tokenpacker_tpu.models.splice import build_splice_plan
from tokenpacker_tpu.models.vlm import init_vlm
from tokenpacker_tpu.serve.scheduler import ContinuousBatcher


@pytest.fixture(scope="module")
def model():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _request(cfg, seed, extra_len=0):
    rng = np.random.default_rng(seed)
    images = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids = np.concatenate(
        [[1, 17 + seed], [IMAGE_TOKEN_INDEX], 30 + np.arange(2 + extra_len)]
    ).astype(np.int64)
    plan = build_splice_plan([ids], [[(1, 1)]], cfg.tokens_per_view, "single", 7, 8, 0, pad_to=32)
    return {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_slot": plan.image_slot,
        "lengths": plan.lengths,
        "images": images,
    }


def test_batcher_matches_generator(model):
    cfg, params = model
    gen = Generator(params, cfg)
    max_new = 5

    requests = [_request(cfg, s, extra_len=s) for s in range(3)]
    expected = [
        gen.generate(r, max_new_tokens=max_new, temperature=0.0).sequences[0]
        for r in requests
    ]

    batcher = ContinuousBatcher(params, cfg, num_slots=2, max_seq_len=64)
    batcher.start()
    try:
        # submit 2 immediately, the third a bit later (mid-flight admission)
        futs = [batcher.submit(requests[0], max_new), batcher.submit(requests[1], max_new)]
        time.sleep(0.3)
        futs.append(batcher.submit(requests[2], max_new))
        results = [f.result(timeout=120) for f in futs]
    finally:
        batcher.stop()

    for got, exp in zip(results, expected):
        assert got == exp, (got, exp)


def test_batcher_streaming_callback(model):
    cfg, params = model
    batcher = ContinuousBatcher(params, cfg, num_slots=1, max_seq_len=64)
    batcher.start()
    seen = []
    try:
        fut = batcher.submit(_request(cfg, 9), 4, on_token=seen.append)
        result = fut.result(timeout=120)
    finally:
        batcher.stop()
    assert seen == result


def test_batcher_mpt_family():
    """Continuous batching works for the MPT (ALiBi) decoder family too."""
    from tests.test_vlm_mpt import mpt_tiny_cfg

    cfg = mpt_tiny_cfg()
    params = init_vlm(jax.random.PRNGKey(5), cfg)
    gen = Generator(params, cfg)
    req = _request(cfg, 1)
    expected = gen.generate(req, max_new_tokens=4, temperature=0.0).sequences[0]

    batcher = ContinuousBatcher(params, cfg, num_slots=2, max_seq_len=64)
    batcher.start()
    try:
        got = batcher.submit(req, 4).result(timeout=120)
    finally:
        batcher.stop()
    assert got == expected, (got, expected)


def test_paged_batcher_matches_generator(model):
    """Paged-KV continuous batching: same greedy tokens, pages recycled."""
    from tokenpacker_tpu.serve.scheduler import PagedContinuousBatcher

    cfg, params = model
    gen = Generator(params, cfg)
    max_new = 5
    requests = [_request(cfg, s, extra_len=s) for s in range(3)]
    expected = [
        gen.generate(r, max_new_tokens=max_new, temperature=0.0).sequences[0]
        for r in requests
    ]

    batcher = PagedContinuousBatcher(
        params, cfg, num_slots=2, num_pages=32, page_size=8, max_pages_per_seq=8
    )
    batcher.start()
    try:
        futs = [batcher.submit(requests[0], max_new), batcher.submit(requests[1], max_new)]
        time.sleep(0.3)
        futs.append(batcher.submit(requests[2], max_new))
        results = [f.result(timeout=120) for f in futs]
    finally:
        batcher.stop()
    for got, exp in zip(results, expected):
        assert got == exp, (got, exp)
    # every page not retained by the (default-on) prefix cache returned to
    # the free list: pool minus reserved page 0 minus cached prompt blocks
    assert batcher.allocator.available() == 31 - len(batcher.prefix.blocks)
    assert len(batcher.prefix.blocks) > 0  # full prompt blocks were cached


def test_paged_batcher_fused_layout(model):
    """Regression (ADVICE r2 high): load_8bit fuses q/k/v→qkv and
    gate/up→gateup, but the paged layers only knew the unfused layout —
    a worker with --scheduler paged --load-8bit crashed with KeyError 'q'
    on the first decode step. Both paged decode and paged verify must
    consume the fused layout."""
    from tokenpacker_tpu.ops.quantize import fuse_llama_layers
    from tokenpacker_tpu.serve.scheduler import PagedContinuousBatcher

    cfg, params = model
    gen = Generator(params, cfg)
    max_new = 5
    req = _request(cfg, 2)
    expected = gen.generate(req, max_new_tokens=max_new, temperature=0.0).sequences[0]

    fused = dict(params)
    fused["lm"] = fuse_llama_layers(params["lm"])
    batcher = PagedContinuousBatcher(
        fused, cfg, num_slots=2, num_pages=32, page_size=8, max_pages_per_seq=8
    )
    batcher.start()
    try:
        got = batcher.submit(req, max_new).result(timeout=120)
    finally:
        batcher.stop()
    assert got == expected, (got, expected)

    # speculative batcher exercises _paged_verify_layer on the fused layout
    spec = PagedContinuousBatcher(
        fused, cfg, num_slots=2, num_pages=32, page_size=8, max_pages_per_seq=8,
        speculative_k=2,
    )
    spec.start()
    try:
        got_spec = spec.submit(req, max_new).result(timeout=120)
    finally:
        spec.stop()
    assert got_spec == expected, (got_spec, expected)


def test_paged_batcher_page_reuse_no_corruption(model):
    """Regression (ADVICE r1 high): when a finished slot's pages are released
    and re-allocated to a still-growing sequence, the finished slot's stale
    page table must not let its (masked) decode writes corrupt the reused
    page. Slot A grows into slot B's released pages while B sits inactive."""
    from tokenpacker_tpu.serve.scheduler import PagedContinuousBatcher

    cfg, params = model
    gen = Generator(params, cfg)

    def req_with_pad(seed, pad_to):
        r = _request(cfg, seed)
        plan = build_splice_plan(
            [np.concatenate([[1, 17 + seed], [IMAGE_TOKEN_INDEX], 30 + np.arange(2)]).astype(np.int64)],
            [[(1, 1)]], cfg.tokens_per_view, "single", 7, 8, 0, pad_to=pad_to,
        )
        r.update(token_ids=plan.token_ids, is_image=plan.is_image,
                 image_slot=plan.image_slot, lengths=plan.lengths)
        return r

    req_a = req_with_pad(0, pad_to=8)    # 2 pages; grows by 3 more over 12 tokens
    req_b = req_with_pad(1, pad_to=16)   # 4 pages; finishes early, pages released
    exp_a = gen.generate(req_a, max_new_tokens=12, temperature=0.0).sequences[0]
    exp_b = gen.generate(req_b, max_new_tokens=2, temperature=0.0).sequences[0]

    batcher = PagedContinuousBatcher(
        params, cfg, num_slots=2, num_pages=24, page_size=4, max_pages_per_seq=8
    )
    batcher.start()
    try:
        fut_a = batcher.submit(req_a, 12)
        fut_b = batcher.submit(req_b, 2)
        got_a = fut_a.result(timeout=240)
        got_b = fut_b.result(timeout=240)
    finally:
        batcher.stop()
    assert got_b == exp_b, (got_b, exp_b)
    assert got_a == exp_a, (got_a, exp_a)


def test_per_slot_temperature(model):
    """Regression (ADVICE r1): co-scheduled requests with different
    temperatures sample independently — the greedy request stays greedy and
    the hot request is not silently collapsed to greedy."""
    cfg, params = model
    gen = Generator(params, cfg)
    req_greedy = _request(cfg, 0)
    req_hot = _request(cfg, 1)
    exp_greedy = gen.generate(req_greedy, max_new_tokens=12, temperature=0.0).sequences[0]
    exp_hot_greedy = gen.generate(req_hot, max_new_tokens=12, temperature=0.0).sequences[0]

    batcher = ContinuousBatcher(params, cfg, num_slots=2, max_seq_len=64)
    batcher.start()
    try:
        fut_g = batcher.submit(req_greedy, 12, temperature=0.0)
        fut_h = batcher.submit(req_hot, 12, temperature=5.0)
        got_g = fut_g.result(timeout=240)
        got_h = fut_h.result(timeout=240)
    finally:
        batcher.stop()
    assert got_g == exp_greedy, (got_g, exp_greedy)
    # at temperature 5 over a 256-vocab the chance of greedy-matching 12
    # tokens in a row is negligible
    assert got_h != exp_hot_greedy


def test_sample_tokens_per_row_unit():
    from tokenpacker_tpu.generate import sample_tokens_per_row

    rng = np.random.default_rng(0)
    logits = jax.numpy.asarray(rng.standard_normal((2, 64)), jax.numpy.float32)
    greedy = np.asarray(jax.numpy.argmax(logits, axis=-1))
    temps = np.array([0.0, 8.0], np.float32)
    row1_hits = 0
    for seed in range(8):
        toks = np.asarray(sample_tokens_per_row(logits, temps, jax.random.PRNGKey(seed)))
        assert toks[0] == greedy[0]  # temp 0 row is always greedy
        row1_hits += int(toks[1] == greedy[1])
    assert row1_hits < 8  # hot row actually samples


def test_sample_tokens_per_row_top_p():
    """Per-row nucleus filtering: a near-zero top_p collapses a hot row to
    greedy (nucleus = the single top token); top_p=1 rows are unaffected
    by the filter code path."""
    from tokenpacker_tpu.generate import sample_tokens_per_row

    rng = np.random.default_rng(1)
    logits = jax.numpy.asarray(rng.standard_normal((3, 64)), jax.numpy.float32)
    greedy = np.asarray(jax.numpy.argmax(logits, axis=-1))
    temps = np.array([8.0, 8.0, 0.0], np.float32)
    tps = np.array([1e-6, 1.0, 1.0], np.float32)
    row1_hits = 0
    for seed in range(8):
        toks = np.asarray(
            sample_tokens_per_row(logits, temps, jax.random.PRNGKey(seed), tps)
        )
        assert toks[0] == greedy[0]  # tiny nucleus => argmax even at temp 8
        assert toks[2] == greedy[2]  # greedy row untouched
        row1_hits += int(toks[1] == greedy[1])
    assert row1_hits < 8  # unfiltered hot row still samples


def test_per_slot_top_p_through_batcher(model):
    """A temperature>0 request with a near-zero top_p served through the
    batcher produces exactly the greedy tokens (nucleus of one), while a
    co-scheduled unfiltered hot request still samples."""
    cfg, params = model
    gen = Generator(params, cfg)
    req_a = _request(cfg, 0)
    req_b = _request(cfg, 1)
    exp_a = gen.generate(req_a, max_new_tokens=10, temperature=0.0).sequences[0]
    exp_b_greedy = gen.generate(req_b, max_new_tokens=10, temperature=0.0).sequences[0]

    batcher = ContinuousBatcher(params, cfg, num_slots=2, max_seq_len=64)
    batcher.start()
    try:
        fut_a = batcher.submit(req_a, 10, temperature=5.0, top_p=1e-6)
        fut_b = batcher.submit(req_b, 10, temperature=5.0)
        got_a = fut_a.result(timeout=240)
        got_b = fut_b.result(timeout=240)
    finally:
        batcher.stop()
    assert got_a == exp_a, (got_a, exp_a)
    assert got_b != exp_b_greedy


def test_paged_decode_inactive_slot_writes_masked(model):
    """Unit regression (ADVICE r1 high): an INACTIVE slot whose stale page
    table aliases a page now owned by an active sequence must not corrupt it.
    The active sequence's logits must be identical whether the stale row is
    present or zeroed."""
    from tokenpacker_tpu.ops.paged_kv import PagedKV, paged_decode_step_jit

    cfg, params = model
    lm = cfg.lm
    ps, num_pages, mp = 4, 8, 4
    rng = np.random.default_rng(7)
    kp = jax.numpy.asarray(
        rng.standard_normal((lm.num_hidden_layers, num_pages, ps, lm.kv_heads, lm.head_dim)),
        jax.numpy.float32,
    )
    vp = jax.numpy.asarray(
        rng.standard_normal((lm.num_hidden_layers, num_pages, ps, lm.kv_heads, lm.head_dim)),
        jax.numpy.float32,
    )
    # seq0 active: length 10 over pages [1,2,3]; seq1 inactive with a STALE
    # table whose write target (block 1 = page 2, offset 5%4=1) aliases
    # seq0's attendable position 5.
    table = np.zeros((2, mp), np.int32)
    table[0, :3] = [1, 2, 3]
    stale = table.copy()
    stale[1, 1] = 2
    lengths = np.array([10, 5], np.int32)
    active = jax.numpy.asarray(np.array([True, False]))
    tokens = jax.numpy.asarray(np.array([42, 99], np.int32))

    def run(tbl):
        paged = PagedKV(kp, vp, jax.numpy.asarray(tbl), jax.numpy.asarray(lengths))
        out = []
        toks = tokens
        for _ in range(2):
            logits, paged = paged_decode_step_jit(params, cfg, paged, toks, active)
            out.append(np.asarray(logits)[0])
            toks = jax.numpy.argmax(logits, axis=-1).astype(jax.numpy.int32)
        return out

    clean = run(table)
    aliased = run(stale)
    for a, b in zip(clean, aliased):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_paged_attention_kernel_matches_gather(model, monkeypatch):
    """The Pallas paged-attention kernel (forced via TOKENPACKER_PAGED_ATTN,
    interpret on CPU) produces the same logits as the XLA gather path —
    including a stale-table inactive slot and partially-filled pages."""
    from tokenpacker_tpu.ops.paged_kv import PagedKV, paged_decode_step

    cfg, params = model
    lm = cfg.lm
    ps, num_pages, mp = 8, 10, 4
    rng = np.random.default_rng(11)
    kp = jax.numpy.asarray(
        rng.standard_normal((lm.num_hidden_layers, num_pages, ps, lm.kv_heads, lm.head_dim)),
        jax.numpy.float32,
    )
    vp = jax.numpy.asarray(
        rng.standard_normal((lm.num_hidden_layers, num_pages, ps, lm.kv_heads, lm.head_dim)),
        jax.numpy.float32,
    )
    table = np.zeros((3, mp), np.int32)
    table[0, :3] = [1, 2, 3]   # len 19: page 3 partially filled
    table[1, :2] = [4, 5]      # len 10
    table[2, :1] = [6]         # inactive slot, stale row
    lengths = np.array([19, 10, 3], np.int32)
    active = jax.numpy.asarray(np.array([True, True, False]))
    tokens = jax.numpy.asarray(np.array([42, 99, 7], np.int32))

    def run(impl):
        monkeypatch.setenv("TOKENPACKER_PAGED_ATTN", impl)
        paged = PagedKV(kp, vp, jax.numpy.asarray(table), jax.numpy.asarray(lengths))
        logits, newp = paged_decode_step(params, cfg, paged, tokens, active)
        return np.asarray(logits)

    ref = run("xla")
    got = run("pallas")
    np.testing.assert_allclose(got[:2], ref[:2], rtol=2e-5, atol=2e-5)


def test_paged_attention_kernel_matches_gather_int8(model, monkeypatch):
    """int8 pools through the Pallas paged kernel: the per-(position, head)
    scale pages fold into the logit/probability matrices in-kernel (K/V are
    never dequantized) — logits match the XLA gather+dequant path."""
    import jax.numpy as jnp

    from tokenpacker_tpu.ops.kv_quant import quantize_kv
    from tokenpacker_tpu.ops.paged_kv import PagedKV, paged_decode_step

    cfg, params = model
    lm = cfg.lm
    ps, num_pages, mp = 8, 10, 4
    rng = np.random.default_rng(12)
    shape = (lm.num_hidden_layers, num_pages, ps, lm.kv_heads, lm.head_dim)
    kq, ks = quantize_kv(jnp.asarray(rng.standard_normal(shape), jnp.float32))
    vq, vs = quantize_kv(jnp.asarray(rng.standard_normal(shape), jnp.float32))
    table = np.zeros((3, mp), np.int32)
    table[0, :3] = [1, 2, 3]   # len 19: page 3 partially filled
    table[1, :2] = [4, 5]      # len 10
    table[2, :1] = [6]         # inactive slot, stale row
    lengths = np.array([19, 10, 3], np.int32)
    active = jnp.asarray(np.array([True, True, False]))
    tokens = jnp.asarray(np.array([42, 99, 7], np.int32))

    def run(impl):
        monkeypatch.setenv("TOKENPACKER_PAGED_ATTN", impl)
        paged = PagedKV(kq, vq, jnp.asarray(table), jnp.asarray(lengths), ks, vs)
        logits, _ = paged_decode_step(params, cfg, paged, tokens, active)
        return np.asarray(logits)

    ref = run("xla")
    got = run("pallas")
    # the gather path rounds dequantized K/V to the model dtype before the
    # dots; the kernel keeps f32 scales on the logit side — small reorder
    np.testing.assert_allclose(got[:2], ref[:2], rtol=2e-3, atol=2e-3)


def test_batcher_crash_fails_futures(model, monkeypatch):
    """Crash net: if the batcher loop dies, in-flight futures get the
    exception (clients unblock immediately) and new submits are rejected."""
    import tokenpacker_tpu.serve.scheduler as sched

    cfg, params = model

    def boom(*a, **k):
        raise RuntimeError("synthetic device failure")

    monkeypatch.setattr(sched, "prefill", boom)
    batcher = ContinuousBatcher(params, cfg, num_slots=1, max_seq_len=64)
    batcher.start()
    try:
        fut = batcher.submit(_request(cfg, 0), 4)
        with pytest.raises(RuntimeError, match="batcher loop died"):
            fut.result(timeout=30)
        # loop is dead: later submits fail fast instead of hanging
        time.sleep(0.1)
        fut2 = batcher.submit(_request(cfg, 1), 4)
        with pytest.raises(RuntimeError, match="batcher loop died"):
            fut2.result(timeout=5)
    finally:
        batcher.stop()


def test_batcher_hd_slice_request(model):
    """HD slice-mode requests (multi-crop + separators) through the
    continuous batcher match the Generator."""
    cfg, params = model
    rng = np.random.default_rng(21)
    hb, wb = 2, 2
    crops = rng.standard_normal(
        (hb * wb + 1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids = np.concatenate([[1, 25], [IMAGE_TOKEN_INDEX], [40, 41]]).astype(np.int64)
    plan = build_splice_plan([ids], [[(hb, wb)]], cfg.tokens_per_view, "slice",
                             7, 8, 0, pad_to=64)
    req = {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_slot": plan.image_slot,
        "lengths": plan.lengths,
        "images": crops,
    }
    expected = Generator(params, cfg).generate(req, max_new_tokens=4, temperature=0.0).sequences[0]
    batcher = ContinuousBatcher(params, cfg, num_slots=2, max_seq_len=96)
    batcher.start()
    try:
        got = batcher.submit(req, 4).result(timeout=240)
    finally:
        batcher.stop()
    assert got == expected, (got, expected)


def test_batcher_chunked_prefill_matches_generator(model):
    """Chunked-admission mode (prefill interleaved with decode): same greedy
    tokens as the Generator, including a mid-flight admission whose prompt
    prefills in chunks while another slot decodes."""
    cfg, params = model
    gen = Generator(params, cfg)
    max_new = 6
    requests = [_request(cfg, s, extra_len=3 * s) for s in range(3)]
    expected = [
        gen.generate(r, max_new_tokens=max_new, temperature=0.0).sequences[0]
        for r in requests
    ]
    batcher = ContinuousBatcher(params, cfg, num_slots=2, max_seq_len=64,
                                prefill_chunk_size=8)
    batcher.start()
    try:
        futs = [batcher.submit(requests[0], max_new), batcher.submit(requests[1], max_new)]
        time.sleep(0.3)
        futs.append(batcher.submit(requests[2], max_new))
        results = [f.result(timeout=240) for f in futs]
    finally:
        batcher.stop()
    for got, exp in zip(results, expected):
        assert got == exp, (got, exp)


def test_paged_chunked_prefill_matches_generator(model):
    """Chunked admissions over the paged pool (prefill_chunk_size, prefix
    cache off): same greedy tokens as one-at-a-time generation."""
    from tokenpacker_tpu.serve.scheduler import PagedContinuousBatcher

    cfg, params = model
    gen = Generator(params, cfg)
    requests = [_request(cfg, s, extra_len=s) for s in range(3)]
    expected = [
        gen.generate(r, max_new_tokens=5, temperature=0.0).sequences[0]
        for r in requests
    ]
    batcher = PagedContinuousBatcher(
        params, cfg, num_slots=2, num_pages=32, page_size=8,
        max_pages_per_seq=8, prefill_chunk_size=8, prefix_cache=False,
    )
    batcher.start()
    try:
        futs = [batcher.submit(r, 5) for r in requests]
        results = [f.result(timeout=120) for f in futs]
    finally:
        batcher.stop()
    assert results == expected
    # all pages returned (no prefix cache retaining any)
    assert batcher.allocator.available() == 31


def _request_padded(cfg, seed, pad_to):
    r = _request(cfg, seed)
    ids = np.concatenate(
        [[1, 17 + seed], [IMAGE_TOKEN_INDEX], 30 + np.arange(2)]
    ).astype(np.int64)
    plan = build_splice_plan(
        [ids], [[(1, 1)]], cfg.tokens_per_view, "single", 7, 8, 0, pad_to=pad_to
    )
    r.update(token_ids=plan.token_ids, is_image=plan.is_image,
             image_slot=plan.image_slot, lengths=plan.lengths)
    return r


def test_paged_admission_unaligned_page_pad(model):
    """Regression (ADVICE r3 medium): page_size=4 with a prompt whose
    page-aligned pad is NOT 8-aligned (pad_to=12 -> old l_pad 12) used to
    crash admission — prefill() rounds its cache to the sublane tile (8),
    so insert_prefill saw a 16-wide cache but only 3 allocated pages."""
    from tokenpacker_tpu.serve.scheduler import PagedContinuousBatcher

    cfg, params = model
    gen = Generator(params, cfg)
    req = _request_padded(cfg, 3, pad_to=12)
    exp = gen.generate(req, max_new_tokens=4, temperature=0.0).sequences[0]

    batcher = PagedContinuousBatcher(
        params, cfg, num_slots=2, num_pages=24, page_size=4, max_pages_per_seq=8
    )
    batcher.start()
    try:
        got = batcher.submit(req, 4).result(timeout=120)
    finally:
        batcher.stop()
    assert got == exp, (got, exp)


def test_batcher_unaligned_max_seq_len(model):
    """Regression (ADVICE r3 medium): max_seq_len not 8-aligned + a
    near-max prompt — prefill's 8-rounded cache (64) is wider than the
    shared cache (60); insert_into_cache must clamp the copy, not crash."""
    cfg, params = model
    gen = Generator(params, cfg)
    req = _request_padded(cfg, 4, pad_to=60)
    exp = gen.generate(req, max_new_tokens=2, temperature=0.0).sequences[0]

    batcher = ContinuousBatcher(params, cfg, num_slots=1, max_seq_len=60)
    batcher.start()
    try:
        got = batcher.submit(req, 2).result(timeout=120)
    finally:
        batcher.stop()
    assert got == exp, (got, exp)


def test_top_k_one_reproduces_greedy_through_batcher(model):
    """top_k=1 collapses sampling to argmax regardless of temperature —
    a deterministic end-to-end check of the top-k plumbing (submit →
    _Request → per-row sampler) against the greedy Generator."""
    cfg, params = model
    gen = Generator(params, cfg)
    max_new = 5
    requests = [_request(cfg, s) for s in range(2)]
    expected = [
        gen.generate(r, max_new_tokens=max_new, temperature=0.0).sequences[0]
        for r in requests
    ]
    batcher = ContinuousBatcher(params, cfg, num_slots=2, max_seq_len=64)
    batcher.start()
    try:
        futs = [
            batcher.submit(r, max_new, temperature=0.9, top_k=1)
            for r in requests
        ]
        got = [f.result(timeout=240) for f in futs]
    finally:
        batcher.stop()
    assert got == expected, (got, expected)
