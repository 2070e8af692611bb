"""Per-token logprob reporting (generate.token_logprob_entry + the serving
plumbing): entries carry the model's RAW next-token distribution
(log_softmax of the un-penalized, un-warped logits), 1:1 with emitted
tokens, through the streaming Generator and both batchers. The OpenAI
gateway's chat/legacy formatting is covered in tests/test_openai_api.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_llama import make_tiny
from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.generate import (
    Generator,
    decode_step,
    device_batch,
    prefill,
)
from tokenpacker_tpu.models.splice import build_splice_plan
from tokenpacker_tpu.models.vlm import init_vlm
from tokenpacker_tpu.serve.scheduler import (
    ContinuousBatcher,
    PagedContinuousBatcher,
)

SEP, RET, PAD = 7, 8, 0


class Tok:
    def decode(self, ids, **kw):
        return " ".join(str(t) for t in ids)


@pytest.fixture(scope="module")
def rig():
    model, lcfg, lm_params = make_tiny()
    cfg = tiny_vlm_config(lm=lcfg)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    params["lm"] = lm_params
    return cfg, params


def text_batch(cfg, ids):
    plan = build_splice_plan(
        [np.asarray(ids, np.int64)], [[]], cfg.tokens_per_view, "single",
        SEP, RET, PAD, pad_to=32,
    )
    return {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_slot": plan.image_slot,
        "lengths": plan.lengths,
        "images": None,
    }


IDS = [1, 11, 23, 42, 5]


def stream_entries(cfg, params, batch, max_new=6, n_top=2, **kw):
    gen = Generator(params, cfg, Tok())
    toks, entries = [], []
    for text, e in gen.generate_stream(
            batch, max_new_tokens=max_new, temperature=0.0, logprobs=n_top,
            **kw):
        entries.append(e)
    return entries


def test_stream_entries_match_recompute(rig):
    """Greedy stream entries must equal a direct prefill+decode_step
    recompute of the raw log-softmax at every step (chosen logprob AND the
    top-k alternatives)."""
    cfg, params = rig
    batch = text_batch(cfg, IDS)
    max_new = 6
    entries = stream_entries(cfg, params, batch, max_new=max_new, n_top=3)
    assert len(entries) >= 2

    dev = device_batch(batch, cfg.dtype)
    l = batch["token_ids"].shape[1]
    logits, cache = prefill(params, cfg, dev, l + max_new)
    for step, e in enumerate(entries):
        lp = np.asarray(jax.nn.log_softmax(
            np.asarray(logits, np.float32)[0]))
        tok = int(np.argmax(lp))  # greedy
        assert e["id"] == tok
        np.testing.assert_allclose(e["logprob"], lp[tok], rtol=1e-5)
        order = np.argsort(-lp)[:3]
        got_ids = [i for i, _ in e["top"]]
        assert got_ids[0] == order[0]  # argmax leads
        for (i, v), j in zip(e["top"], order):
            np.testing.assert_allclose(v, lp[j], rtol=1e-5)
        logits, cache = decode_step(
            params, cfg, cache, jnp.asarray([tok]), dev["lengths"],
            jnp.asarray(step, jnp.int32), l)


def test_stream_entries_raw_under_penalties(rig):
    """Entries report the RAW distribution even when penalties shape the
    sampling: the chosen token changes (penalized greedy) but its logprob
    is still the raw log-softmax value."""
    cfg, params = rig
    batch = text_batch(cfg, IDS)
    gen = Generator(params, cfg, Tok())
    out = list(gen.generate_stream(
        batch, max_new_tokens=6, temperature=0.0, logprobs=1,
        repetition_penalty=2.0))
    dev = device_batch(batch, cfg.dtype)
    logits, _ = prefill(params, cfg, dev, batch["token_ids"].shape[1] + 6)
    lp0 = np.asarray(jax.nn.log_softmax(np.asarray(logits, np.float32)[0]))
    _, e0 = out[0]
    np.testing.assert_allclose(e0["logprob"], lp0[e0["id"]], rtol=1e-5)
    # the raw argmax still leads the top list even if penalties demoted it
    assert e0["top"][0][0] == int(np.argmax(lp0))


@pytest.fixture(scope="module")
def model():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _batch(prompt_len=8, seed=0):
    ids = (np.arange(2, 2 + prompt_len, dtype=np.int64)[None] + seed) % 90 + 3
    return {
        "token_ids": ids,
        "is_image": np.zeros_like(ids, bool),
        "image_slot": np.zeros_like(ids, np.int32),
        "lengths": np.array([prompt_len]),
        "images": None,
    }


def _check_entries(req_tokens, entries, n_top):
    assert len(entries) == len(req_tokens)
    for tok, e in zip(req_tokens, entries):
        assert e["id"] == tok
        top = e["top"]
        assert len(top) == n_top
        # greedy: the chosen token IS the raw argmax, so it leads top
        assert top[0][0] == tok
        np.testing.assert_allclose(top[0][1], e["logprob"], rtol=1e-6)
        assert top[0][1] >= top[1][1]


def test_dense_batcher_logprobs(model):
    cfg, params = model
    batcher = ContinuousBatcher(params, cfg, num_slots=2, max_seq_len=64)
    batcher.start()
    try:
        f_lp = batcher.submit(_batch(seed=1), 5, temperature=0.0, logprobs=2)
        f_plain = batcher.submit(_batch(seed=2), 5, temperature=0.0)
        toks = f_lp.result(timeout=120)
        plain = f_plain.result(timeout=120)
    finally:
        batcher.stop()
    _check_entries(toks, f_lp._tp_request.lp_entries, 2)
    assert f_plain._tp_request.lp_entries == []
    # recording must not perturb decoding: same tokens as a no-logprob run
    assert plain == Generator(params, cfg).generate(
        _batch(seed=2), max_new_tokens=5, temperature=0.0).sequences[0]


def test_paged_batcher_logprobs(model):
    cfg, params = model
    batcher = PagedContinuousBatcher(
        params, cfg, num_slots=2, num_pages=64, page_size=4,
        max_pages_per_seq=16, prefix_cache=False,
    )
    batcher.start()
    try:
        f_lp = batcher.submit(_batch(seed=1), 5, temperature=0.0, logprobs=2)
        toks = f_lp.result(timeout=120)
    finally:
        batcher.stop()
    _check_entries(toks, f_lp._tp_request.lp_entries, 2)


def test_speculative_batcher_logprobs(model):
    """Logprob requests never draft (accepted bursts skip per-token
    logits): under speculative_k they still produce 1:1 entries and the
    same greedy tokens as the plain batcher."""
    cfg, params = model
    expected = Generator(params, cfg).generate(
        _batch(seed=1), max_new_tokens=5, temperature=0.0).sequences[0]
    batcher = ContinuousBatcher(params, cfg, num_slots=2, max_seq_len=64,
                                speculative_k=3)
    batcher.start()
    try:
        f_lp = batcher.submit(_batch(seed=1), 5, temperature=0.0, logprobs=2)
        toks = f_lp.result(timeout=120)
    finally:
        batcher.stop()
    assert toks == expected
    _check_entries(toks, f_lp._tp_request.lp_entries, 2)
