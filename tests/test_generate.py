"""End-to-end generation tests on a tiny VLM.

Gold standard: greedy incremental decode (prefill + KV-cache steps) must
produce exactly the tokens selected by re-running the full teacher-forced
forward at every step (no cache). This pins prefill/cache/position math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX
from tokenpacker_tpu.generate import Generator
from tokenpacker_tpu.models.llama import make_attention_bias
from tokenpacker_tpu.models.splice import build_splice_plan
from tokenpacker_tpu.models.vlm import init_vlm, vlm_hidden
from tokenpacker_tpu.models.llama import llama_logits

SEP, RET, PAD = 7, 8, 0


def _teacher_forced_next(params, cfg, plan, images, extra_tokens):
    """Re-splice with generated tokens appended, run cacheless, return
    argmax at the last position. Single sample."""
    ids = plan["raw_ids"]
    full_ids = np.concatenate([ids, np.asarray(extra_tokens, dtype=ids.dtype)])
    p = build_splice_plan([full_ids], plan["blocks"], plan["tpv"], plan["mode"], SEP, RET, PAD)
    n, l = p.token_ids.shape
    positions = jnp.broadcast_to(jnp.arange(l), (n, l))
    batch = {
        "images": jnp.asarray(images, cfg.dtype) if images is not None else None,
        "token_ids": jnp.asarray(p.token_ids),
        "is_image": jnp.asarray(p.is_image),
        "image_slot": jnp.asarray(p.image_slot),
        "positions": positions,
        "key_valid": jnp.asarray(p.attn_mask),
    }
    hidden, _ = vlm_hidden(params, cfg, batch)
    logits = llama_logits(params["lm"], hidden[:, p.lengths[0] - 1])
    return int(np.argmax(np.asarray(logits[0])))


def test_greedy_decode_matches_teacher_forcing():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    n_img_crops = 1
    images = rng.standard_normal(
        (n_img_crops, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids = np.array([1, 17, 23, IMAGE_TOKEN_INDEX, 40, 41], dtype=np.int64)
    tpv = cfg.tokens_per_view
    plan = build_splice_plan([ids], [[(1, 1)]], tpv, "single", SEP, RET, PAD, pad_to=24)

    gen = Generator(params, cfg)
    max_new = 6
    result = gen.generate(
        {
            "token_ids": plan.token_ids,
            "is_image": plan.is_image,
            "image_slot": plan.image_slot,
            "lengths": plan.lengths,
            "images": images,
        },
        max_new_tokens=max_new,
        temperature=0.0,
    )
    got = result.sequences[0]

    # oracle: teacher-forced recompute each step
    meta = {"raw_ids": ids, "blocks": [[(1, 1)]], "tpv": tpv, "mode": "single"}
    expected = []
    for step in range(len(got)):
        expected.append(_teacher_forced_next(params, cfg, meta, images, expected))
        if expected[-1] == cfg.lm.eos_token_id:
            break
    assert got == expected, (got, expected)


def test_batched_generation_ragged_lengths():
    """Two prompts of different lengths decode independently and correctly."""
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    images = rng.standard_normal(
        (2, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    tpv = cfg.tokens_per_view
    ids0 = np.array([1, 17, IMAGE_TOKEN_INDEX, 40], dtype=np.int64)
    ids1 = np.array([1, 9, 9, 9, 9, IMAGE_TOKEN_INDEX, 10, 11, 12], dtype=np.int64)
    plan = build_splice_plan(
        [ids0, ids1], [[(1, 1)], [(1, 1)]], tpv, "single", SEP, RET, PAD, pad_to=32
    )
    gen = Generator(params, cfg)
    max_new = 5
    result = gen.generate(
        {
            "token_ids": plan.token_ids,
            "is_image": plan.is_image,
            "image_slot": plan.image_slot,
            "lengths": plan.lengths,
            "images": images,
        },
        max_new_tokens=max_new,
    )

    # oracle per sample, batch of one
    for i, ids in enumerate([ids0, ids1]):
        single_plan = build_splice_plan([ids], [[(1, 1)]], tpv, "single", SEP, RET, PAD, pad_to=32)
        single = gen.generate(
            {
                "token_ids": single_plan.token_ids,
                "is_image": single_plan.is_image,
                "image_slot": single_plan.image_slot,
                "lengths": single_plan.lengths,
                "images": images[i : i + 1],
            },
            max_new_tokens=max_new,
        )
        assert result.sequences[i] == single.sequences[0], i


def test_hd_slice_generation_runs():
    """HD 2x2 slice path end-to-end (crops + separators + global view)."""
    cfg = tiny_vlm_config(image_aspect_ratio="slice")
    params = init_vlm(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    hb, wb = 2, 2
    crops = rng.standard_normal(
        (hb * wb + 1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids = np.array([1, 3, IMAGE_TOKEN_INDEX, 5], dtype=np.int64)
    plan = build_splice_plan([ids], [[(hb, wb)]], cfg.tokens_per_view, "slice", SEP, RET, PAD)
    gen = Generator(params, cfg)
    result = gen.generate(
        {
            "token_ids": plan.token_ids,
            "is_image": plan.is_image,
            "image_slot": plan.image_slot,
            "lengths": plan.lengths,
            "images": crops,
        },
        max_new_tokens=4,
    )
    assert len(result.sequences[0]) >= 1


def test_warmup_compiles_and_runs():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(3), cfg)
    gen = Generator(params, cfg)
    gen.warmup(buckets=(16,), batch_sizes=(1,), max_new_tokens=8)


def test_mpt_decode_bucket_padding_invariant():
    """Regression (ADVICE r1 medium): MPT decode writes new K/V at cache slot
    prefill_len+step, so ALiBi must use TRUE token positions — otherwise the
    prompt->generated distance is inflated by the pad gap and logits depend
    on the padding bucket."""
    from tests.test_vlm_mpt import mpt_tiny_cfg
    from tokenpacker_tpu.generate import decode_step, prefill
    from tokenpacker_tpu.models.vlm import init_vlm

    cfg = mpt_tiny_cfg()
    params = init_vlm(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    images = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids = np.concatenate([[1, 19], [IMAGE_TOKEN_INDEX], [33, 34]]).astype(np.int64)

    def run(pad_to, n_steps=4):
        plan = build_splice_plan([ids], [[(1, 1)]], cfg.tokens_per_view, "single",
                                 7, 8, 0, pad_to=pad_to)
        batch = {
            "token_ids": jnp.asarray(plan.token_ids),
            "is_image": jnp.asarray(plan.is_image),
            "image_slot": jnp.asarray(plan.image_slot),
            "lengths": jnp.asarray(plan.lengths, jnp.int32),
            "images": jnp.asarray(images),
        }
        l = plan.token_ids.shape[1]
        logits, cache = prefill(params, cfg, batch, l + n_steps)
        out = [np.asarray(logits)]
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        for step in range(n_steps):
            logits, cache = decode_step(
                params, cfg, cache, tok, batch["lengths"], jnp.asarray(step, jnp.int32), l
            )
            out.append(np.asarray(logits))
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return out

    tight = run(pad_to=8)   # no pad gap: true length == prefill_len
    padded = run(pad_to=16)  # 8-slot pad gap between prompt and decode slots
    for a, b in zip(tight, padded):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("family", ["llama", "mpt"])
def test_decode_attention_kernel_matches_xla(family, monkeypatch):
    """Pallas decode attention (forced via TOKENPACKER_DECODE_ATTN, interpret
    on CPU) produces the same decode logits as the XLA bias path on the
    bucketed layout — both families, right-padded prompts."""
    from tokenpacker_tpu.generate import decode_step, prefill
    from tokenpacker_tpu.models.vlm import init_vlm

    if family == "mpt":
        from tests.test_vlm_mpt import mpt_tiny_cfg

        cfg = mpt_tiny_cfg()
    else:
        cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(4)
    images = rng.standard_normal(
        (2, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids0 = np.concatenate([[1, 19], [IMAGE_TOKEN_INDEX], [33, 34, 35]]).astype(np.int64)
    ids1 = np.concatenate([[1, 20], [IMAGE_TOKEN_INDEX], [36]]).astype(np.int64)
    plan = build_splice_plan(
        [ids0, ids1], [[(1, 1)], [(1, 1)]], cfg.tokens_per_view, "single", 7, 8, 0, pad_to=16
    )
    batch = {
        "token_ids": jnp.asarray(plan.token_ids),
        "is_image": jnp.asarray(plan.is_image),
        "image_slot": jnp.asarray(plan.image_slot),
        "lengths": jnp.asarray(plan.lengths, jnp.int32),
        "images": jnp.asarray(images),
    }
    l = plan.token_ids.shape[1]

    def run(impl):
        monkeypatch.setenv("TOKENPACKER_DECODE_ATTN", impl)
        # the env is read at TRACE time; decode_step is cached by shapes
        # only, so the second impl would silently reuse the first trace
        jax.clear_caches()
        logits, cache = prefill(params, cfg, batch, l + 8)
        out = []
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        for step in range(3):
            logits, cache = decode_step(
                params, cfg, cache, tok, batch["lengths"], jnp.asarray(step, jnp.int32), l
            )
            out.append(np.asarray(logits))
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return out

    ref = run("xla")
    got = run("pallas")
    for a, b in zip(ref, got):
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("family", ["llama", "mpt"])
def test_chunked_prefill_matches_full(family):
    """Incremental prefill_chunk over 4-token chunks reproduces the full
    prefill: identical next-token logits and identical cache contents."""
    from tokenpacker_tpu.generate import prefill, prefill_chunk
    from tokenpacker_tpu.models.lm_api import lm_logits
    from tokenpacker_tpu.models.llama import KVCache
    from tokenpacker_tpu.models.vlm import encode_images, init_vlm

    if family == "mpt":
        from tests.test_vlm_mpt import mpt_tiny_cfg

        cfg = mpt_tiny_cfg()
    else:
        cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(6), cfg)
    rng = np.random.default_rng(6)
    images = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids = np.concatenate([[1, 19], [IMAGE_TOKEN_INDEX], 30 + np.arange(5)]).astype(np.int64)
    plan = build_splice_plan([ids], [[(1, 1)]], cfg.tokens_per_view, "single",
                             7, 8, 0, pad_to=12)
    l = plan.token_ids.shape[1]
    s_max = l + 4
    batch = {
        "token_ids": jnp.asarray(plan.token_ids),
        "is_image": jnp.asarray(plan.is_image),
        "image_slot": jnp.asarray(plan.image_slot),
        "lengths": jnp.asarray(plan.lengths, jnp.int32),
        "images": jnp.asarray(images),
    }
    ref_logits, ref_cache = prefill(params, cfg, batch, s_max)

    visual = encode_images(params, cfg, batch["images"])
    cache = KVCache.create(cfg.lm, 1, s_max, jnp.float32)
    true_len = int(plan.lengths[0])
    chunk = 4
    hidden = None
    off = 0
    while off < true_len:
        n = min(chunk, true_len - off)
        hidden, cache = prefill_chunk(
            params, cfg, cache,
            visual,
            batch["token_ids"][:, off : off + n],
            batch["is_image"][:, off : off + n],
            batch["image_slot"][:, off : off + n],
            jnp.asarray(off, jnp.int32), n,
        )
        off += n
    got_logits = np.asarray(lm_logits(params["lm"], cfg.lm, hidden[:, -1]))
    np.testing.assert_allclose(got_logits, np.asarray(ref_logits), rtol=2e-5, atol=2e-5)
    # cache contents identical over the valid range
    np.testing.assert_allclose(
        np.asarray(cache.k[:, :, :true_len]),
        np.asarray(ref_cache.k[:, :, :true_len]), rtol=2e-5, atol=2e-5,
    )


def test_top_k_sampling_masks_to_hf_warper_support():
    """sample_tokens(top_k=k) must draw ONLY from the k highest logits and
    match HF TopKLogitsWarper's mask exactly (same `logits < kth` rule, so
    tie handling agrees): tokens outside HF's surviving set never appear."""
    import torch
    from transformers.generation import TopKLogitsWarper

    from tokenpacker_tpu.generate import sample_tokens

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 64)).astype(np.float32)
    temperature, k = 0.8, 3
    ref = TopKLogitsWarper(top_k=k)(
        None, torch.from_numpy(logits / temperature)).numpy()
    allowed = [set(np.nonzero(np.isfinite(ref[r]))[0]) for r in range(2)]
    seen = [set(), set()]
    for i in range(300):
        draw = np.asarray(sample_tokens(
            jnp.asarray(logits), temperature, None, jax.random.PRNGKey(i),
            top_k=k))
        for r in range(2):
            seen[r].add(int(draw[r]))
    for r in range(2):
        assert seen[r] <= allowed[r], (seen[r], allowed[r])
        assert len(seen[r]) == k  # every surviving token is reachable


def test_fd_jit_distinct_same_named_functions():
    """_fd_jit's jit cache must key on the function OBJECT: two distinct
    functions sharing a __name__ (e.g. bench scripts' local `plain_loop`s
    run in one process) must not dispatch to each other's compiled jit
    (r5 bench regression)."""
    from functools import partial

    from tokenpacker_tpu.generate import _fd_jit

    def make(mult):
        @partial(_fd_jit, static_argnames=("k",))
        def f(params, x, k: int):
            return x * mult + k

        return f

    a, b = make(2.0), make(3.0)
    assert float(a({}, jnp.float32(1.0), k=0)) == 2.0
    assert float(b({}, jnp.float32(1.0), k=0)) == 3.0
    assert float(a({}, jnp.float32(1.0), k=1)) == 3.0


def test_min_p_masks_to_hf_warper_support():
    """sample_tokens(min_p=p) must draw ONLY from tokens whose probability
    is >= p x max-prob and match HF MinPLogitsWarper's surviving set (the
    4.57 warper order puts min-p LAST, after top-p — same here)."""
    import torch
    from transformers.generation import MinPLogitsWarper

    from tokenpacker_tpu.generate import sample_tokens

    rng = np.random.default_rng(2)
    logits = (rng.standard_normal((2, 64)) * 2).astype(np.float32)
    temperature, p = 0.9, 0.25
    ref = MinPLogitsWarper(min_p=p)(
        None, torch.from_numpy(logits / temperature)).numpy()
    allowed = [set(np.nonzero(np.isfinite(ref[r]))[0]) for r in range(2)]
    seen = [set(), set()]
    for i in range(400):
        draw = np.asarray(sample_tokens(
            jnp.asarray(logits), temperature, None, jax.random.PRNGKey(i),
            min_p=p))
        for r in range(2):
            seen[r].add(int(draw[r]))
    for r in range(2):
        assert seen[r] <= allowed[r], (seen[r], allowed[r])
        assert len(seen[r]) == len(allowed[r])  # every survivor reachable


def test_min_p_per_row_matches_single_row():
    """sample_tokens_per_row(min_ps=...): a filtered row draws only from
    its HF-warper surviving set while a min_p=0 row stays unfiltered."""
    import torch
    from transformers.generation import MinPLogitsWarper

    from tokenpacker_tpu.generate import sample_tokens_per_row

    rng = np.random.default_rng(3)
    logits = (rng.standard_normal((2, 32)) * 2).astype(np.float32)
    temps = np.array([0.8, 0.8], np.float32)
    p = 0.3
    ref = MinPLogitsWarper(min_p=p)(
        None, torch.from_numpy(logits / temps[0])).numpy()
    allowed = [set(np.nonzero(np.isfinite(ref[r]))[0]) for r in range(2)]
    seen = [set(), set()]
    for i in range(400):
        draw = np.asarray(sample_tokens_per_row(
            jnp.asarray(logits), temps, jax.random.PRNGKey(i),
            min_ps=np.array([p, 0.0], np.float32)))
        seen[0].add(int(draw[0]))
        seen[1].add(int(draw[1]))
    assert seen[0] <= allowed[0] and len(seen[0]) == len(allowed[0])
    # row 1 carries min_p=0 (= off): it must reach tokens the warper would
    # have removed had the filter leaked across rows
    assert seen[1] - allowed[1], (seen[1], allowed[1])


def test_top_k_none_and_oversize_are_noops():
    from tokenpacker_tpu.generate import sample_tokens

    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)
    key = jax.random.PRNGKey(0)
    base = np.asarray(sample_tokens(logits, 0.7, None, key))
    wide = np.asarray(sample_tokens(logits, 0.7, None, key, top_k=16))
    assert (base == wide).all()  # k >= vocab leaves logits untouched
