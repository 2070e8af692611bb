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
    # all pages returned to the free list
    assert batcher.allocator.available() == 31  # pool minus reserved page 0
