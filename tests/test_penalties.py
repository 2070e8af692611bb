"""Token-history logit penalties (generate.apply_penalties).

repetition_penalty must match transformers' RepetitionPenaltyLogitsProcessor
bit-for-bit (the processor the reference would get from ``model.generate``,
generation/logits_process.py), including the prompt-tokens-count rule and
greedy application; presence/frequency follow the OpenAI API fields with
vLLM's generated-tokens-only convention. End-to-end greedy decode with
repetition_penalty must be token-exact vs HF generate on shared weights,
and both batchers must reproduce the Generator result per slot.
"""

import queue
import time

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.test_llama import make_tiny
from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.generate import (
    Generator,
    apply_penalties,
    prompt_presence_mask,
)
from tokenpacker_tpu.models.splice import build_splice_plan
from tokenpacker_tpu.models.vlm import init_vlm
from tokenpacker_tpu.serve.scheduler import (
    ContinuousBatcher,
    PagedContinuousBatcher,
)

SEP, RET, PAD = 7, 8, 0
EOS = 2
V = 128


@pytest.fixture(scope="module")
def rig():
    """Tiny HF Llama + our VLM wrapping the SAME lm weights (text-only)."""
    model, lcfg, lm_params = make_tiny()
    cfg = tiny_vlm_config(lm=lcfg)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    params["lm"] = lm_params
    return model, cfg, params


def text_batch(cfg, ids_list):
    plan = build_splice_plan(
        [np.asarray(ids, np.int64) for ids in ids_list],
        [[] for _ in ids_list], cfg.tokens_per_view, "single",
        SEP, RET, PAD, pad_to=32,
    )
    return {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_slot": plan.image_slot,
        "lengths": plan.lengths,
        "images": None,
    }


# -- unit: the penalty arithmetic ---------------------------------------------


def _rows_to_state(prompt_rows, generated_rows, vocab=V):
    """(counts [N,V], prompt_presence [N,V]) from per-row id lists."""
    n = len(prompt_rows)
    counts = np.zeros((n, vocab), np.int32)
    presence = np.zeros((n, vocab), bool)
    for i, (p, g) in enumerate(zip(prompt_rows, generated_rows)):
        presence[i, p] = True
        for t in g:
            counts[i, t] += 1
    return counts, presence


def test_repetition_matches_hf_processor():
    """HF penalizes every id in input_ids (prompt + generated, uniformly);
    ours must produce identical scores from the split counts/presence
    state, for penalties above and below 1."""
    from transformers import RepetitionPenaltyLogitsProcessor

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, V)).astype(np.float32) * 3.0
    prompt_rows = [[1, 5, 9, 5], [3, 3, 7]]
    generated_rows = [[5, 11], [20, 20, 20]]
    for pen in (1.3, 2.0, 0.7):
        hf = RepetitionPenaltyLogitsProcessor(penalty=pen)
        exp = np.stack([
            hf(torch.tensor([p + g]), torch.tensor(logits[i:i + 1]))[0].numpy()
            for i, (p, g) in enumerate(zip(prompt_rows, generated_rows))
        ])
        counts, presence = _rows_to_state(prompt_rows, generated_rows)
        got = np.asarray(apply_penalties(jnp.asarray(logits), counts, presence, pen))
        np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_presence_frequency_convention():
    """OpenAI fields, vLLM convention: generated-token counts only — prompt
    tokens are untouched; per-row values apply row-wise."""
    logits = np.arange(2 * V, dtype=np.float32).reshape(2, V) / 7.0
    counts, presence = _rows_to_state([[4], [6]], [[10, 10, 12], []])
    got = np.asarray(apply_penalties(
        jnp.asarray(logits), counts, presence, 1.0,
        presence_penalty=np.array([0.5, 0.9], np.float32),
        frequency_penalty=np.array([0.25, 0.0], np.float32)))
    exp = logits.copy()
    exp[0, 10] -= 0.25 * 2 + 0.5
    exp[0, 12] -= 0.25 * 1 + 0.5
    np.testing.assert_allclose(got, exp, rtol=1e-6)  # row 1 & prompts untouched


def test_identity_values_are_noops():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((1, V)).astype(np.float32)
    counts, presence = _rows_to_state([[3, 4]], [[9]])
    got = np.asarray(apply_penalties(jnp.asarray(logits), counts, presence,
                                     1.0, 0.0, 0.0))
    np.testing.assert_array_equal(got, logits)


def test_prompt_presence_mask_excludes_images_and_pads():
    batch = {
        "token_ids": np.array([[5, 6, 99, 7, 42]]),
        "is_image": np.array([[False, False, True, False, False]]),
        "lengths": np.array([4]),  # 42 is padding
    }
    m = prompt_presence_mask(batch, V)
    assert m[0, [5, 6, 7]].all() and not m[0, 99] and not m[0, 42]


# -- end-to-end: greedy decode vs HF generate ---------------------------------


def hf_greedy(model, ids, max_new, **kw):
    out = model.generate(
        input_ids=torch.tensor([ids]), do_sample=False,
        max_new_tokens=max_new, eos_token_id=EOS, pad_token_id=PAD, **kw,
    )
    toks = out[0, len(ids):].tolist()
    if EOS in toks:
        toks = toks[: toks.index(EOS) + 1]
    return toks


PROMPTS = [
    [1, 11, 23, 42, 11, 23],
    [1, 99, 98, 97, 3, 5],
]


@pytest.mark.parametrize("pen", [1.3, 2.0])
@pytest.mark.parametrize("ids", PROMPTS)
def test_generate_matches_hf_repetition(rig, ids, pen):
    model, cfg, params = rig
    exp = hf_greedy(model, ids, 12, repetition_penalty=pen)
    got = Generator(params, cfg).generate(
        text_batch(cfg, [ids]), max_new_tokens=12, temperature=0.0,
        repetition_penalty=pen,
    ).sequences[0]
    assert got == exp, (got, exp)


def test_generate_penalty_changes_output(rig):
    """The penalized run must actually diverge from the plain one on a
    repetition-prone prompt (guards against penalties silently not
    applying)."""
    model, cfg, params = rig
    gen = Generator(params, cfg)
    batch = text_batch(cfg, [PROMPTS[0]])
    plain = gen.generate(batch, max_new_tokens=12, temperature=0.0).sequences[0]
    pen = gen.generate(batch, max_new_tokens=12, temperature=0.0,
                       repetition_penalty=2.0).sequences[0]
    assert plain == hf_greedy(model, PROMPTS[0], 12)
    assert plain != pen


def test_generate_batched_matches_per_sample(rig):
    """Penalty state is per-row: a batch must reproduce each sample's
    batch-1 result (counts/presence never leak across rows)."""
    _, cfg, params = rig
    gen = Generator(params, cfg)
    kw = dict(max_new_tokens=10, temperature=0.0, repetition_penalty=1.5,
              frequency_penalty=0.2)
    both = gen.generate(text_batch(cfg, PROMPTS), **kw).sequences
    for i, ids in enumerate(PROMPTS):
        solo = gen.generate(text_batch(cfg, [ids]), **kw).sequences[0]
        assert both[i] == solo


def test_stream_matches_generate(rig):
    _, cfg, params = rig

    class Tok:
        def decode(self, ids, **kw):
            return " ".join(str(t) for t in ids)

    gen = Generator(params, cfg, Tok())
    kw = dict(max_new_tokens=10, temperature=0.0, repetition_penalty=1.5,
              presence_penalty=0.1)
    batch = text_batch(cfg, [PROMPTS[0]])
    expected = gen.generate(batch, **kw).texts[0]
    last = ""
    for text in gen.generate_stream(batch, **kw):
        last = text
    assert last == expected


def test_beams_reject_penalties(rig):
    _, cfg, params = rig
    with pytest.raises(ValueError, match="beam search"):
        Generator(params, cfg).generate(
            text_batch(cfg, [PROMPTS[0]]), num_beams=2, temperature=0.0,
            repetition_penalty=1.2)


# -- batchers ------------------------------------------------------------------


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


PEN_KW = dict(repetition_penalty=1.4, presence_penalty=0.3,
              frequency_penalty=0.2)


def _expected(cfg, params, batch, max_new, **kw):
    return Generator(params, cfg).generate(
        batch, max_new_tokens=max_new, temperature=0.0, **kw).sequences[0]


def test_dense_batcher_penalty_parity(model):
    """A penalized and an unpenalized request co-scheduled in one batcher
    each reproduce their Generator result (identity rows stay
    bit-unchanged)."""
    cfg, params = model
    b_pen, b_plain = _batch(seed=1), _batch(seed=2)
    exp_pen = _expected(cfg, params, b_pen, 6, **PEN_KW)
    exp_plain = _expected(cfg, params, b_plain, 6)
    batcher = ContinuousBatcher(params, cfg, num_slots=2, max_seq_len=64)
    batcher.start()
    try:
        f1 = batcher.submit(b_pen, 6, temperature=0.0, **PEN_KW)
        f2 = batcher.submit(b_plain, 6, temperature=0.0)
        assert f1.result(timeout=120) == exp_pen
        assert f2.result(timeout=120) == exp_plain
        # slot reuse: the penalty rows reset at the next admission
        f3 = batcher.submit(b_pen, 6, temperature=0.0, **PEN_KW)
        assert f3.result(timeout=120) == exp_pen
    finally:
        batcher.stop()


def test_paged_batcher_penalty_parity(model):
    cfg, params = model
    b_pen, b_plain = _batch(seed=1), _batch(seed=2)
    exp_pen = _expected(cfg, params, b_pen, 6, **PEN_KW)
    exp_plain = _expected(cfg, params, b_plain, 6)
    batcher = PagedContinuousBatcher(
        params, cfg, num_slots=2, num_pages=64, page_size=4,
        max_pages_per_seq=16, prefix_cache=False,
    )
    batcher.start()
    try:
        f1 = batcher.submit(b_pen, 6, temperature=0.0, **PEN_KW)
        f2 = batcher.submit(b_plain, 6, temperature=0.0)
        assert f1.result(timeout=120) == exp_pen
        assert f2.result(timeout=120) == exp_plain
    finally:
        batcher.stop()


def test_speculative_batcher_penalized_slot(model):
    """Penalized greedy slots never draft (acceptance compares against
    UNpenalized argmax) — under speculative_k they still reproduce the
    Generator result, while an unpenalized greedy slot keeps speculating."""
    cfg, params = model
    b_pen, b_plain = _batch(seed=1), _batch(seed=2)
    exp_pen = _expected(cfg, params, b_pen, 6, **PEN_KW)
    exp_plain = _expected(cfg, params, b_plain, 6)
    batcher = ContinuousBatcher(params, cfg, num_slots=2, max_seq_len=64,
                                speculative_k=3)
    batcher.start()
    try:
        f1 = batcher.submit(b_pen, 6, temperature=0.0, **PEN_KW)
        f2 = batcher.submit(b_plain, 6, temperature=0.0)
        assert f1.result(timeout=120) == exp_pen
        assert f2.result(timeout=120) == exp_plain
    finally:
        batcher.stop()


def test_gateway_forwards_penalties():
    from tokenpacker_tpu.serve.openai_api import Gateway

    g = Gateway("http://unused")
    p = g.stream_request(
        {"model": "m", "prompt": "x", "presence_penalty": 0.5,
         "frequency_penalty": 0.25, "repetition_penalty": 1.2}, chat=False)
    assert (p["presence_penalty"], p["frequency_penalty"],
            p["repetition_penalty"]) == (0.5, 0.25, 1.2)
    d = g.stream_request({"model": "m", "prompt": "x"}, chat=False)
    assert (d["presence_penalty"], d["frequency_penalty"],
            d["repetition_penalty"]) == (0.0, 0.0, 1.0)
