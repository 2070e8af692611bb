"""Request cancellation (client disconnect / stop-string satisfied): slots
and paged KV pages free before the next decode step; queued requests
resolve without admission. The reference has no cancellation — abandoned
streams decode to max_new_tokens on the device."""

import queue
import threading
import time

import numpy as np
import pytest

import jax

from tests.test_trainer import Tok
from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.models.vlm import init_vlm
from tokenpacker_tpu.serve.scheduler import ContinuousBatcher, PagedContinuousBatcher


@pytest.fixture(scope="module")
def model():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _batch(prompt_len=8):
    ids = np.arange(2, 2 + prompt_len, dtype=np.int64)[None]
    return {
        "token_ids": ids,
        "is_image": np.zeros_like(ids, bool),
        "image_slot": np.zeros_like(ids, np.int32),
        "lengths": np.array([prompt_len]),
        "images": None,
    }


def _submit_streaming(batcher, max_new_tokens=64):
    q: queue.Queue = queue.Queue()
    fut = batcher.submit(_batch(), max_new_tokens=max_new_tokens,
                         temperature=0.0, on_token=q.put)
    return fut, q


def test_dense_cancel_mid_stream_frees_slot(model):
    cfg, params = model
    batcher = ContinuousBatcher(params, cfg, Tok(), num_slots=1, max_seq_len=128)
    batcher.start()
    try:
        fut, q = _submit_streaming(batcher, max_new_tokens=100)
        for _ in range(3):  # wait for a few streamed tokens
            q.get(timeout=120)
        assert batcher.cancel(fut)
        toks = fut.result(timeout=120)
        assert 3 <= len(toks) < 100  # partial result, not the full run
        # the single slot must be free again: a follow-up request completes
        fut2 = batcher.submit(_batch(), max_new_tokens=4, temperature=0.0)
        assert len(fut2.result(timeout=120)) <= 4
    finally:
        batcher.stop()


def test_cancel_queued_request_never_admits(model):
    cfg, params = model
    batcher = ContinuousBatcher(params, cfg, Tok(), num_slots=1, max_seq_len=128)
    fut = batcher.submit(_batch(), max_new_tokens=50, temperature=0.0)
    assert batcher.cancel(fut)
    batcher.start()  # dequeued AFTER cancellation → resolves empty
    try:
        assert fut.result(timeout=120) == []
    finally:
        batcher.stop()


def test_cancel_foreign_future_is_noop(model):
    cfg, params = model
    batcher = ContinuousBatcher(params, cfg, Tok(), num_slots=1, max_seq_len=128)
    from concurrent.futures import Future

    assert batcher.cancel(Future()) is False


def test_paged_cancel_releases_pages(model):
    cfg, params = model
    batcher = PagedContinuousBatcher(
        params, cfg, Tok(), num_slots=2, num_pages=64, page_size=4,
        max_pages_per_seq=16, prefix_cache=False,
    )
    free0 = batcher.allocator.available()
    batcher.start()
    try:
        fut, q = _submit_streaming(batcher, max_new_tokens=100)
        for _ in range(3):
            q.get(timeout=120)
        assert batcher.cancel(fut)
        toks = fut.result(timeout=120)
        assert len(toks) < 100
        # every page the request held returns to the pool
        deadline = time.time() + 120
        while batcher.allocator.available() != free0 and time.time() < deadline:
            time.sleep(0.05)
        assert batcher.allocator.available() == free0
        # pool is reusable afterwards
        fut2 = batcher.submit(_batch(), max_new_tokens=4, temperature=0.0)
        assert len(fut2.result(timeout=120)) <= 4
    finally:
        batcher.stop()


def test_worker_stop_string_cancels_slot(model):
    """When a stop string is hit, the worker cancels the batcher slot
    instead of letting it decode to max_new_tokens."""
    cfg, params = model
    from tokenpacker_tpu.generate import Generator
    from tokenpacker_tpu.serve.model_worker import ModelWorker

    tok = Tok()
    tok("hello world stop here now")

    class FakeLoaded:
        config = cfg
        generator = Generator(params, cfg, tok)

    w = ModelWorker.__new__(ModelWorker)
    w.worker_id = "t"
    w.controller_addr = None
    w.worker_addr = None
    w.model_name = "tiny"
    w.tokenizer = tok
    w.model = FakeLoaded()
    w.image_processor = None
    w.context_len = 512
    w.cfg = cfg
    w.semaphore = threading.Semaphore(2)
    w.queue_length = 0
    w._ql_lock = threading.Lock()
    w.call_ct = 0
    w.draining = False
    w.batcher = ContinuousBatcher(params, cfg, tok, num_slots=1, max_seq_len=512)
    w.batcher.start()
    try:
        # every decoded token decodes to SOME word; use the first streamed
        # word as the stop string so the stream stops after ~1 token
        first_words = []

        def probe():
            for chunk in w.generate_stream({"prompt": "hello world",
                                            "max_new_tokens": 2,
                                            "temperature": 0.0}):
                pass

        probe()  # warm up compile so timing below is scheduling-only
        chunks = list(w.generate_stream({
            "prompt": "hello world", "max_new_tokens": 200,
            "temperature": 0.0, "stop": " ",
        }))
        import json as _json

        final = _json.loads(chunks[-1][:-1])
        assert final["error_code"] == 0
        # the slot must be free promptly (cancelled, not run to 200 tokens)
        deadline = time.time() + 60
        while any(w.batcher.slots) and time.time() < deadline:
            time.sleep(0.05)
        assert not any(w.batcher.slots)
    finally:
        w.batcher.stop()
