"""Automatic prefix caching (serve/prefix_cache.py over the paged pool).

Gold standard: admissions that hit the cache must produce EXACTLY the same
greedy tokens as a fresh Generator — the reused pages hold bit-identical KV
(causal attention + absolute positions), so any splice/gather/offset error
breaks parity immediately. Plus unit coverage of the hash chain, refcounted
page lifetime, and LRU eviction under pool pressure.
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
from tokenpacker_tpu.ops.paged_kv import PageAllocator
from tokenpacker_tpu.serve.prefix_cache import PrefixCache, block_hashes, image_digest
from tokenpacker_tpu.serve.scheduler import PagedContinuousBatcher


@pytest.fixture(scope="module")
def model():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _request(cfg, image_seed=0, question=(1, 2, 3)):
    """Shared system prefix + image, then a per-request question suffix —
    the chat shape prefix caching targets."""
    rng = np.random.default_rng(image_seed)
    images = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids = np.concatenate(
        [[1], 100 + np.arange(6), [IMAGE_TOKEN_INDEX], 30 + np.asarray(question)]
    ).astype(np.int64)
    plan = build_splice_plan(
        [ids], [[(1, 1)]], cfg.tokens_per_view, "single", 7, 8, 0, pad_to=32
    )
    return {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_slot": plan.image_slot,
        "lengths": plan.lengths,
        "images": images,
    }


def _make_batcher(params, cfg, **kw):
    kw.setdefault("num_slots", 1)
    kw.setdefault("num_pages", 64)
    kw.setdefault("page_size", 4)
    kw.setdefault("max_pages_per_seq", 8)
    kw.setdefault("prefix_cache", True)
    return PagedContinuousBatcher(params, cfg, **kw)


# -- unit: hash chain ---------------------------------------------------------


def test_block_hashes_chain_and_image_identity():
    ids = np.arange(16)
    im = np.zeros(16, bool)
    im[4:8] = True
    slots = np.where(im, 0, 0).astype(np.int32)
    a = block_hashes(ids, im, slots, b"imgA", page_size=4)
    assert len(a) == 4
    # changing a token in block 0 changes EVERY hash (chained)
    ids2 = ids.copy()
    ids2[1] = 99
    b = block_hashes(ids2, im, slots, b"imgA", page_size=4)
    assert all(x != y for x, y in zip(a, b))
    # a different image changes the image block and everything after, but
    # not the pure-text block before it
    c = block_hashes(ids, im, slots, b"imgB", page_size=4)
    assert c[0] == a[0]
    assert all(x != y for x, y in zip(a[1:], c[1:]))
    # limit caps the block count
    assert block_hashes(ids, im, slots, b"imgA", 4, limit=2) == a[:2]


def test_prefix_cache_match_is_longest_chain():
    pc = PrefixCache(page_size=4)
    alloc = PageAllocator(8)
    pages = alloc.alloc(3)
    hashes = [b"h0", b"h1", b"h2"]
    pc.register(hashes, pages, alloc)
    m, ids = pc.match([b"h0", b"h1", b"XX"])
    assert m == 2 and ids == pages[:2]
    m, ids = pc.match([b"XX", b"h1"])  # chain must match from block 0
    assert m == 0 and ids == []


# -- unit: refcounted page lifetime ------------------------------------------


def test_refcounts_cache_plus_slot_claims():
    alloc = PageAllocator(8)
    pc = PrefixCache(page_size=4)
    (pid,) = alloc.alloc(1)
    pc.register([b"h"], [pid], alloc)  # cache ref
    alloc.incref(pid)  # a mapping sequence's claim
    alloc.release([pid])  # admitting sequence's original ownership ends
    assert pid not in alloc.free
    pc.evict_until_available(alloc, alloc.available() + 1)  # cache ref dropped
    assert pid not in alloc.free  # the mapping sequence still holds it
    alloc.release([pid])
    assert pid in alloc.free  # last reference gone


def test_eviction_frees_lru_first():
    alloc = PageAllocator(8)
    pc = PrefixCache(page_size=4)
    p = alloc.alloc(4)
    pc.register([b"a", b"b", b"c", b"d"], p, alloc)
    [alloc.release([x]) for x in p]  # only cache refs remain
    pc.match([b"a"])  # touch "a" → LRU order is b, c, d, a
    pc.evict_until_available(alloc, alloc.available() + 2)
    assert p[1] in alloc.free and p[2] in alloc.free
    assert p[0] not in alloc.free and p[3] not in alloc.free


# -- integration: parity through the paged batcher ---------------------------


def test_repeat_request_hits_cache_and_matches(model):
    """The same request admitted twice: the second admission reuses every
    cached block, SKIPS the vision encode, and still produces exactly the
    Generator's greedy tokens."""
    cfg, params = model
    req = _request(cfg)
    expected = Generator(params, cfg).generate(
        req, max_new_tokens=5, temperature=0.0
    ).sequences[0]

    batcher = _make_batcher(params, cfg)
    batcher.start()
    try:
        first = batcher.submit(req, 5).result(timeout=120)
        second = batcher.submit(req, 5).result(timeout=120)
    finally:
        batcher.stop()
    assert first == expected and second == expected
    assert batcher.prefix.hits == 1
    assert batcher.prefix.tokens_reused > 0
    assert batcher.prefix.vision_skipped == 1


def test_shared_prefix_divergent_questions(model):
    """Different questions over the same system+image prefix: each result
    matches its own Generator run; later admissions reuse the prefix."""
    cfg, params = model
    gen = Generator(params, cfg)
    reqs = [_request(cfg, question=q) for q in [(1, 2, 3), (4, 5, 6), (7, 8, 9)]]
    expected = [
        gen.generate(r, max_new_tokens=4, temperature=0.0).sequences[0] for r in reqs
    ]

    batcher = _make_batcher(params, cfg)
    batcher.start()
    try:
        got = [batcher.submit(r, 4).result(timeout=120) for r in reqs]
    finally:
        batcher.stop()
    assert got == expected
    assert batcher.prefix.hits >= 1
    assert batcher.prefix.tokens_reused > 0


def test_different_image_never_matches(model):
    """Same token stream over different pixels must NOT reuse KV."""
    cfg, params = model
    gen = Generator(params, cfg)
    r1 = _request(cfg, image_seed=0)
    r2 = _request(cfg, image_seed=1)
    e1 = gen.generate(r1, max_new_tokens=4, temperature=0.0).sequences[0]
    e2 = gen.generate(r2, max_new_tokens=4, temperature=0.0).sequences[0]

    batcher = _make_batcher(params, cfg)
    batcher.start()
    try:
        g1 = batcher.submit(r1, 4).result(timeout=120)
        g2 = batcher.submit(r2, 4).result(timeout=120)
    finally:
        batcher.stop()
    assert (g1, g2) == (e1, e2)
    # block 0 is pure text (bos + system tokens) and may legitimately hit;
    # what matters is no image block was reused and the outputs differ
    # per their own oracles — plus no vision encode was skipped
    assert batcher.prefix.vision_skipped == 0


def test_eviction_under_pool_pressure(model):
    """A pool barely larger than one request: every admission must evict
    the previous prompt's cached blocks — and still decode correctly."""
    cfg, params = model
    gen = Generator(params, cfg)
    reqs = [_request(cfg, question=(q, q + 1, q + 2)) for q in range(1, 6)]
    expected = [
        gen.generate(r, max_new_tokens=3, temperature=0.0).sequences[0] for r in reqs
    ]

    # 8 pages (page 0 reserved) at page_size 4: one 20-token padded prompt
    # + decode growth uses most of the pool, so cached blocks MUST evict
    batcher = _make_batcher(params, cfg, num_pages=12)
    batcher.start()
    try:
        got = [batcher.submit(r, 3).result(timeout=120) for r in reqs]
    finally:
        batcher.stop()
    assert got == expected


def test_prefix_cache_off_is_unchanged(model):
    """prefix_cache=False restores the round-3 admission path exactly."""
    cfg, params = model
    req = _request(cfg)
    expected = Generator(params, cfg).generate(
        req, max_new_tokens=4, temperature=0.0
    ).sequences[0]
    batcher = _make_batcher(params, cfg, prefix_cache=False)
    batcher.start()
    try:
        assert batcher.prefix is None
        a = batcher.submit(req, 4).result(timeout=120)
        b = batcher.submit(req, 4).result(timeout=120)
    finally:
        batcher.stop()
    assert a == expected and b == expected


def test_prefix_cache_with_speculation(model):
    """Prefix reuse composes with paged speculative decoding (verify writes
    land past the shared prefix; greedy parity holds)."""
    cfg, params = model
    req = _request(cfg)
    expected = Generator(params, cfg).generate(
        req, max_new_tokens=6, temperature=0.0
    ).sequences[0]
    batcher = _make_batcher(params, cfg, speculative_k=2, num_pages=64)
    batcher.start()
    try:
        first = batcher.submit(req, 6).result(timeout=120)
        second = batcher.submit(req, 6).result(timeout=120)
    finally:
        batcher.stop()
    assert first == expected and second == expected
    assert batcher.prefix.hits == 1


def test_prefix_cache_int8_pool(model, monkeypatch):
    """int8 KV pool × prefix cache: cached pages carry quantized K/V plus
    their scale pages through gather_prefix/prefix_admit; a warm admission
    reproduces the cold admission's greedy tokens exactly (and both match
    the Generator under the same cache dtype)."""
    monkeypatch.setenv("TOKENPACKER_KV_CACHE", "int8")
    monkeypatch.setenv("TOKENPACKER_FUSED_DECODE", "0")
    cfg, params = model
    req = _request(cfg)
    expected = Generator(params, cfg).generate(
        req, max_new_tokens=4, temperature=0.0
    ).sequences[0]
    batcher = _make_batcher(params, cfg)
    batcher.start()
    try:
        assert batcher.paged.k_pages.dtype.name == "int8"
        cold = batcher.submit(req, 4).result(timeout=120)
        warm = batcher.submit(req, 4).result(timeout=120)
    finally:
        batcher.stop()
    assert cold == warm == expected
    assert batcher.prefix.hits == 1


def test_chunked_paged_admission_with_prefix(model):
    """Chunked paged admissions (prefill_chunk_size) compose with prefix
    caching: the cold admission chunks the whole prompt, the warm one
    chunks only the un-cached suffix — same greedy tokens either way."""
    cfg, params = model
    gen = Generator(params, cfg)
    r1 = _request(cfg, question=(1, 2, 3))
    r2 = _request(cfg, question=(4, 5, 6))
    e1 = gen.generate(r1, max_new_tokens=4, temperature=0.0).sequences[0]
    e2 = gen.generate(r2, max_new_tokens=4, temperature=0.0).sequences[0]

    batcher = _make_batcher(params, cfg, num_slots=2, prefill_chunk_size=8)
    batcher.start()
    try:
        g1 = batcher.submit(r1, 4).result(timeout=120)  # cold, fully chunked
        g2 = batcher.submit(r2, 4).result(timeout=120)  # warm, suffix only
    finally:
        batcher.stop()
    assert (g1, g2) == (e1, e2)
    assert batcher.prefix.hits >= 1
    assert batcher.prefix.tokens_reused > 0


def test_chunked_paged_mid_flight_admission(model):
    """A second request admitted in chunks WHILE the first decodes: both
    match their oracles (decode steps interleave with admission chunks)."""
    cfg, params = model
    gen = Generator(params, cfg)
    r1 = _request(cfg, question=(1, 2, 3))
    r2 = _request(cfg, image_seed=2, question=(4, 5, 6))
    e1 = gen.generate(r1, max_new_tokens=8, temperature=0.0).sequences[0]
    e2 = gen.generate(r2, max_new_tokens=4, temperature=0.0).sequences[0]

    batcher = _make_batcher(params, cfg, num_slots=2, prefill_chunk_size=8)
    batcher.start()
    try:
        f1 = batcher.submit(r1, 8)
        time.sleep(0.3)
        f2 = batcher.submit(r2, 4)
        g1, g2 = f1.result(timeout=120), f2.result(timeout=120)
    finally:
        batcher.stop()
    assert (g1, g2) == (e1, e2)


def test_concurrent_slots_share_pages(model):
    """Two slots decoding simultaneously off the SAME physical prefix pages:
    submit a request, let it cache, then run two prefix-sharing requests
    concurrently — both must match their oracles."""
    cfg, params = model
    gen = Generator(params, cfg)
    warm = _request(cfg, question=(1, 2, 3))
    r1 = _request(cfg, question=(4, 5, 6))
    r2 = _request(cfg, question=(7, 8, 9))
    e1 = gen.generate(r1, max_new_tokens=5, temperature=0.0).sequences[0]
    e2 = gen.generate(r2, max_new_tokens=5, temperature=0.0).sequences[0]

    batcher = _make_batcher(params, cfg, num_slots=2)
    batcher.start()
    try:
        batcher.submit(warm, 2).result(timeout=120)
        f1 = batcher.submit(r1, 5)
        f2 = batcher.submit(r2, 5)
        g1, g2 = f1.result(timeout=120), f2.result(timeout=120)
    finally:
        batcher.stop()
    assert (g1, g2) == (e1, e2)
    assert batcher.prefix.hits >= 2
