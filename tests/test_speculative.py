"""Speculative decoding (speculative.py): verify-step exactness, prompt-lookup
proposal host/device agreement, and greedy parity of the full pipeline.

Greedy parity is the correctness bar: with speculation on, the emitted
sequence must be EXACTLY what plain one-token decode produces, for any
acceptance pattern (drafts are accepted only when they equal the verify
forward's own argmax)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import LMConfig, tiny_vlm_config
from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX
from tokenpacker_tpu.generate import Generator, decode_step, prefill
from tokenpacker_tpu.models.splice import build_splice_plan
from tokenpacker_tpu.models.vlm import init_vlm
from tokenpacker_tpu.speculative import (
    _propose_ngram,
    make_ctx,
    propose_ngram_host,
    speculative_chunk,
    verify_step,
)

SEP, RET, PAD = 7, 8, 0


def _mpt_tiny_cfg():
    lm = LMConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        model_family="mpt",
        alibi=True,
        tie_word_embeddings=True,
    )
    return tiny_vlm_config(lm=lm)


def _setup(family="llama", seed=0, pad_to=24):
    cfg = tiny_vlm_config() if family == "llama" else _mpt_tiny_cfg()
    params = init_vlm(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    images = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids = np.array([1, 17, 23, IMAGE_TOKEN_INDEX, 40, 41, 40, 41], dtype=np.int64)
    plan = build_splice_plan(
        [ids], [[(1, 1)]], cfg.tokens_per_view, "single", SEP, RET, PAD, pad_to=pad_to
    )
    batch = {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_slot": plan.image_slot,
        "lengths": plan.lengths,
        "images": images,
    }
    return cfg, params, batch


@pytest.mark.parametrize("family", ["llama", "mpt"])
def test_verify_step_matches_decode_steps(family):
    """verify_step logits[:, j] == the j'th decode_step's logits when fed the
    same token sequence (positions, masks, ALiBi/RoPE all line up)."""
    cfg, params, batch = _setup(family)
    t_verify = 5
    l = batch["token_ids"].shape[1]
    s_max = l + 8
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    dev_batch["lengths"] = jnp.asarray(batch["lengths"], jnp.int32)
    dev_batch["images"] = jnp.asarray(batch["images"], cfg.dtype)

    logits0, cache = prefill(params, cfg, dev_batch, s_max)
    toks = [int(np.argmax(np.asarray(logits0)[0]))]
    step_logits = []
    dcache = cache
    for s in range(t_verify):
        lg, dcache = decode_step(
            params, cfg, dcache, jnp.asarray([toks[-1]]), dev_batch["lengths"],
            jnp.asarray(s, jnp.int32), l,
        )
        step_logits.append(np.asarray(lg[0]))
        toks.append(int(np.argmax(step_logits[-1])))

    fed = jnp.asarray(np.array(toks[:t_verify], np.int32)[None])
    vlogits, vcache = verify_step(
        params, cfg, cache, fed, dev_batch["lengths"], jnp.asarray(0, jnp.int32), l
    )
    vlogits = np.asarray(vlogits[0])
    for j in range(t_verify):
        np.testing.assert_allclose(vlogits[j], step_logits[j], atol=2e-4, rtol=2e-4)
    # the caches agree on every written slot
    np.testing.assert_allclose(
        np.asarray(vcache.k[:, :, : l + t_verify]),
        np.asarray(dcache.k[:, :, : l + t_verify]),
        atol=1e-5,
    )


def test_propose_ngram_host_device_agree():
    cases = [
        ([5, 6, 7, 8, 5, 6], 3),
        ([1, 2, 3, 1, 2], 3),
        ([9, 4, 9, 4], 3),
        ([3, 3, 3, 3, 3], 4),
        ([1, 2, 3, 4, 5], 3),  # no repeat -> no draft
        ([1, 2], 2),  # shorter than ngram+1
    ]
    cap = 32
    for seq, k in cases:
        ctx = np.full(cap, -1, np.int32)
        ctx[: len(seq)] = seq
        draft, dk = _propose_ngram(jnp.asarray(ctx), jnp.asarray(len(seq)), k, 2)
        host = propose_ngram_host(list(seq), k, 2)
        assert int(dk) == len(host), (seq, k, np.asarray(draft), host)
        assert list(np.asarray(draft)[: int(dk)]) == host, (seq, k)
    # fuzz on a tiny alphabet (dense repeats)
    rng = np.random.default_rng(0)
    for _ in range(25):
        n = int(rng.integers(3, 28))
        seq = rng.integers(0, 4, size=n).tolist()
        k = int(rng.integers(1, 5))
        ctx = np.full(cap + k, -1, np.int32)
        ctx[:n] = seq
        draft, dk = _propose_ngram(jnp.asarray(ctx), jnp.asarray(n), k, 2)
        host = propose_ngram_host(seq, k, 2)
        assert int(dk) == len(host) and list(np.asarray(draft)[: int(dk)]) == host


@pytest.mark.parametrize("family", ["llama", "mpt"])
@pytest.mark.parametrize("k", [3, 5])
def test_speculative_generate_parity(family, k):
    cfg, params, batch = _setup(family, seed=3)
    gen = Generator(params, cfg)
    plain = gen.generate(batch, max_new_tokens=16, temperature=0.0)
    spec = gen.generate(batch, max_new_tokens=16, temperature=0.0, speculative=k)
    assert spec.sequences[0] == plain.sequences[0]


def _repeater_params(cfg, seed=0):
    """A rigged LM that always predicts its input token: layer outputs are
    zeroed (residual stream = embedding) and lm_head is tied to the
    embedding, so argmax(norm(e_t) @ E^T) = t. Guarantees full draft
    acceptance — exercises the accept path and the stale-slot overwrite."""
    params = init_vlm(jax.random.PRNGKey(seed), cfg)
    lm = params["lm"]
    lm["layers"]["attn"]["o"]["kernel"] = jnp.zeros_like(lm["layers"]["attn"]["o"]["kernel"])
    lm["layers"]["mlp"]["down"]["kernel"] = jnp.zeros_like(lm["layers"]["mlp"]["down"]["kernel"])
    lm["lm_head"]["kernel"] = lm["embed"].T
    return params


def test_speculative_accepts_drafts_and_matches():
    """On a repeating model the chunk must accept drafts (rounds << produced)
    and still match plain decode exactly."""
    cfg, _, batch = _setup("llama", seed=4)
    params = _repeater_params(cfg, seed=4)
    gen = Generator(params, cfg)
    k, max_new = 4, 20
    plain = gen.generate(batch, max_new_tokens=max_new, temperature=0.0)
    spec = gen.generate(batch, max_new_tokens=max_new, temperature=0.0, speculative=k)
    assert spec.sequences[0] == plain.sequences[0]
    assert len(set(plain.sequences[0])) == 1  # it really is a repeater

    # count verify rounds directly
    l = batch["token_ids"].shape[1]
    s_max = l + max_new + k + 1
    dev_batch = {kk: jnp.asarray(v) for kk, v in batch.items()}
    dev_batch["lengths"] = jnp.asarray(batch["lengths"], jnp.int32)
    dev_batch["images"] = jnp.asarray(batch["images"], cfg.dtype)
    logits, cache = prefill(params, cfg, dev_batch, s_max)
    tok = jnp.argmax(logits[0, :]).astype(jnp.int32)
    cap = l + max_new + 2 * k + 8
    ctx = jnp.asarray(make_ctx(batch["token_ids"][0], batch["is_image"][0],
                               int(batch["lengths"][0]), cap))
    ctx_len = dev_batch["lengths"][0]
    ctx = jax.lax.dynamic_update_slice(ctx, tok[None], (ctx_len,))
    out, produced, *_, rounds = speculative_chunk(
        params, cfg, cache, ctx, ctx_len + 1, dev_batch["lengths"], tok,
        jnp.asarray(0, jnp.int32), l, 16, k,
    )
    assert int(produced) >= 16
    assert int(rounds) < int(produced)  # speculation really accepted drafts
    assert list(np.asarray(out)[: int(produced)]) == plain.sequences[0][1 : 1 + int(produced)]


def test_warmup_covers_both_cache_shapes():
    """warmup(speculative=k) must compile BOTH the plain and the k-padded
    cache shapes: greedy streams use the padded one, temperature>0 streams
    the plain one (a cold compile at request time defeats warmup)."""
    cfg, params, _ = _setup("llama", seed=13)
    gen = Generator(params, cfg)
    gen.warmup(buckets=(32,), max_new_tokens=8, speculative=3)
    from tokenpacker_tpu.generate import prefill

    # both executables exist now: re-invoking must hit the jit cache
    misses0 = prefill._cache_size()
    gen.warmup(buckets=(32,), max_new_tokens=8, speculative=3)
    assert prefill._cache_size() == misses0


class _FakeTok:
    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(int(i)) for i in ids)


@pytest.mark.parametrize("rigged", [False, True])
def test_stream_speculative_parity(rigged):
    cfg, params, batch = _setup("llama", seed=5)
    if rigged:
        params = _repeater_params(cfg, seed=5)
    gen = Generator(params, cfg, tokenizer=_FakeTok())
    plain = list(gen.generate_stream(batch, max_new_tokens=12, temperature=0.0))
    spec = list(gen.generate_stream(batch, max_new_tokens=12, temperature=0.0, speculative=4))
    assert spec[-1] == plain[-1]
    # every yield is a prefix of the final text (monotone streaming)
    for t in spec:
        assert plain[-1].startswith(t)


def test_verify_step_cb_matches_decode_steps():
    """verify_step_cb over slot-contiguous caches with DIFFERENT per-slot
    lengths == a sequence of decode_step_cb calls feeding the same tokens."""
    from tokenpacker_tpu.generate import decode_step_cb, insert_into_cache
    from tokenpacker_tpu.models.llama import KVCache
    from tokenpacker_tpu.speculative import verify_step_cb

    cfg, params, batch = _setup("llama", seed=7)
    l = batch["token_ids"].shape[1]
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    dev_batch["lengths"] = jnp.asarray(batch["lengths"], jnp.int32)
    dev_batch["images"] = jnp.asarray(batch["images"], cfg.dtype)
    logits, small = prefill(params, cfg, dev_batch, l)
    tok0 = int(np.argmax(np.asarray(logits)[0]))
    true_len = int(batch["lengths"][0])

    # two slots, same request inserted at different paddings -> ragged lens
    n_slots, s_max, t_v = 2, 64, 4
    big = KVCache(
        jnp.zeros((cfg.lm.num_hidden_layers, n_slots, s_max, cfg.lm.kv_heads, cfg.lm.head_dim), cfg.dtype),
        jnp.zeros((cfg.lm.num_hidden_layers, n_slots, s_max, cfg.lm.kv_heads, cfg.lm.head_dim), cfg.dtype),
        jnp.zeros((n_slots,), jnp.int32),
    )
    big = insert_into_cache(big, small, 0, true_len)
    big = insert_into_cache(big, small, 1, true_len)
    # desync slot 1 by one decode step
    active = jnp.ones((n_slots,), bool)
    lg, big = decode_step_cb(
        params, cfg, big, jnp.asarray([tok0, tok0], jnp.int32), big.length, active
    )
    tok1 = int(np.argmax(np.asarray(lg)[1]))
    # ...but roll slot 0 back (pretend its step never happened)
    big = KVCache(big.k, big.v, big.length.at[0].set(true_len))

    # oracle: sequential decode_step_cb greedy per slot from this state
    seq_cache = big
    fed = [[tok0], [tok1]]
    step_logits = [[], []]
    for s in range(t_v):
        lg, seq_cache = decode_step_cb(
            params, cfg, seq_cache,
            jnp.asarray([fed[0][-1], fed[1][-1]], jnp.int32), seq_cache.length, active,
        )
        lg = np.asarray(lg)
        for i in range(2):
            step_logits[i].append(lg[i])
            fed[i].append(int(np.argmax(lg[i])))

    vlogits, _ = verify_step_cb(
        params, cfg, big,
        jnp.asarray([fed[0][:t_v], fed[1][:t_v]], jnp.int32), big.length, active,
    )
    vlogits = np.asarray(vlogits)
    for i in range(2):
        for j in range(t_v):
            np.testing.assert_allclose(
                vlogits[i, j], step_logits[i][j], atol=2e-4, rtol=2e-4
            )


@pytest.mark.parametrize("rigged", [False, True])
def test_batcher_speculative_greedy_parity(rigged):
    """ContinuousBatcher(speculative_k>0) serves concurrent greedy requests
    with exactly the Generator's tokens — including mid-flight admission and
    per-slot desynchronized acceptance."""
    import time

    from tokenpacker_tpu.serve.scheduler import ContinuousBatcher

    cfg, params, _ = _setup("llama", seed=8)
    if rigged:
        params = _repeater_params(cfg, seed=8)
    gen = Generator(params, cfg)
    max_new = 8

    def req(seed, extra=0):
        rng = np.random.default_rng(seed)
        images = rng.standard_normal(
            (1, cfg.vision.image_size, cfg.vision.image_size, 3)
        ).astype(np.float32)
        ids = np.concatenate(
            [[1, 17 + seed], [IMAGE_TOKEN_INDEX], 30 + np.arange(2 + extra)]
        ).astype(np.int64)
        plan = build_splice_plan([ids], [[(1, 1)]], cfg.tokens_per_view,
                                 "single", SEP, RET, PAD, pad_to=32)
        return {
            "token_ids": plan.token_ids,
            "is_image": plan.is_image,
            "image_slot": plan.image_slot,
            "lengths": plan.lengths,
            "images": images,
        }

    requests = [req(s, extra=s) for s in range(3)]
    expected = [
        gen.generate(r, max_new_tokens=max_new, temperature=0.0).sequences[0]
        for r in requests
    ]
    batcher = ContinuousBatcher(params, cfg, num_slots=2, max_seq_len=64,
                                speculative_k=3)
    batcher.start()
    try:
        futs = [batcher.submit(requests[0], max_new), batcher.submit(requests[1], max_new)]
        time.sleep(0.3)
        futs.append(batcher.submit(requests[2], max_new))
        results = [f.result(timeout=180) for f in futs]
    finally:
        batcher.stop()
    for got, exp in zip(results, expected):
        assert got == exp, (got, exp)


def test_batcher_speculative_with_chunked_prefill():
    """speculative_k composes with chunked admission (prefill_chunk_size):
    the slot ctx is initialized at admission completion and greedy parity
    holds."""
    from tokenpacker_tpu.serve.scheduler import ContinuousBatcher

    cfg, params, batch = _setup("llama", seed=11)
    gen = Generator(params, cfg)
    max_new = 6
    expected = gen.generate(batch, max_new_tokens=max_new, temperature=0.0).sequences[0]
    batcher = ContinuousBatcher(params, cfg, num_slots=2, max_seq_len=64,
                                speculative_k=3, prefill_chunk_size=8)
    batcher.start()
    try:
        got = batcher.submit(batch, max_new).result(timeout=180)
    finally:
        batcher.stop()
    assert got == expected, (got, expected)


def test_batcher_speculative_mpt_parity():
    """MPT family through the speculating batcher (exercises the multi-token
    per-slot cache writes + slot-contiguous ALiBi path)."""
    from tokenpacker_tpu.serve.scheduler import ContinuousBatcher

    cfg, params, batch = _setup("mpt", seed=10)
    gen = Generator(params, cfg)
    max_new = 6
    expected = gen.generate(batch, max_new_tokens=max_new, temperature=0.0).sequences[0]
    batcher = ContinuousBatcher(params, cfg, num_slots=2, max_seq_len=64,
                                speculative_k=3)
    batcher.start()
    try:
        got = batcher.submit(batch, max_new).result(timeout=180)
    finally:
        batcher.stop()
    assert got == expected, (got, expected)


def test_batcher_speculative_backoff_on_zero_acceptance(monkeypatch):
    """When drafts never land, the batcher's acceptance EMA trips and it
    falls back to plain decode rounds (with exponential re-try spacing) —
    and output parity still holds across the mode switch."""
    import tokenpacker_tpu.speculative as spec_mod
    from tokenpacker_tpu.serve import scheduler as sched_mod
    from tokenpacker_tpu.serve.scheduler import ContinuousBatcher

    # drafts that can never match the verify argmax (clamped embeds, but
    # argmax is never a negative id)
    monkeypatch.setattr(spec_mod, "propose_ngram_host", lambda ctx, k, ngram=2: [-5] * k)
    # trip quickly: EMA starts at 1.0 and decays 0.9x per zero round
    monkeypatch.setattr(sched_mod, "SPEC_EMA_THRESHOLD", 0.75)
    monkeypatch.setattr(sched_mod, "SPEC_BACKOFF_ROUNDS", 4)

    cfg, params, batch = _setup("llama", seed=12)
    gen = Generator(params, cfg)
    max_new = 12
    expected = gen.generate(batch, max_new_tokens=max_new, temperature=0.0).sequences[0]
    batcher = ContinuousBatcher(params, cfg, num_slots=1, max_seq_len=64,
                                speculative_k=3)
    batcher.start()
    try:
        got = batcher.submit(batch, max_new).result(timeout=180)
    finally:
        batcher.stop()
    assert got == expected, (got, expected)
    assert batcher._spec_fail_streak >= 1  # backoff really engaged


def test_paged_verify_step_matches_decode_steps():
    """paged_verify_step == a sequence of paged_decode_step calls, with the
    fed span crossing page boundaries (small page size)."""
    from tokenpacker_tpu.generate import prefill
    from tokenpacker_tpu.ops.paged_kv import (
        PagedKV,
        PageAllocator,
        insert_prefill,
        map_page,
        paged_decode_step,
        paged_verify_step,
    )

    cfg, params, batch = _setup("llama", seed=14)
    l = batch["token_ids"].shape[1]
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    dev_batch["lengths"] = jnp.asarray(batch["lengths"], jnp.int32)
    dev_batch["images"] = jnp.asarray(batch["images"], cfg.dtype)
    logits, small = prefill(params, cfg, dev_batch, l)
    tok0 = int(np.argmax(np.asarray(logits)[0]))
    true_len = int(batch["lengths"][0])

    ps, mp, t_v = 8, 8, 6  # span from true_len=11 crosses the page-1/2 boundary
    paged = PagedKV.create(cfg.lm, 32, ps, 1, mp, jnp.float32)
    alloc = PageAllocator(32)
    pages = alloc.alloc(l // ps if l % ps == 0 else l // ps + 1)
    # insert_prefill needs l_pad multiple of ps; l (pad_to=24) is
    l_pages = l // ps
    paged = insert_prefill(paged, small, 0, pages[:l_pages], true_len)
    # map lookahead pages covering true_len + t_v
    for block in range(l_pages, (true_len + t_v) // ps + 1):
        paged = map_page(paged, 0, block, pages[block] if block < len(pages)
                         else alloc.alloc(1)[0])

    active = jnp.ones((1,), bool)
    seq = paged
    fed = [tok0]
    step_logits = []
    for _ in range(t_v):
        lg, seq = paged_decode_step(params, cfg, seq, jnp.asarray([fed[-1]], jnp.int32), active)
        step_logits.append(np.asarray(lg)[0])
        fed.append(int(np.argmax(step_logits[-1])))

    vlogits, _ = paged_verify_step(
        params, cfg, paged, jnp.asarray([fed[:t_v]], jnp.int32), active
    )
    vlogits = np.asarray(vlogits[0])
    for j in range(t_v):
        np.testing.assert_allclose(vlogits[j], step_logits[j], atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("rigged", [False, True])
def test_paged_batcher_speculative_greedy_parity(rigged):
    """PagedContinuousBatcher(speculative_k>0): greedy parity with bursts
    crossing page boundaries (page_size 8) and lookahead page growth."""
    import time

    from tokenpacker_tpu.serve.scheduler import PagedContinuousBatcher

    cfg, params, batch = _setup("llama", seed=15)
    if rigged:
        params = _repeater_params(cfg, seed=15)
    gen = Generator(params, cfg)
    max_new = 8
    expected = gen.generate(batch, max_new_tokens=max_new, temperature=0.0).sequences[0]
    batcher = PagedContinuousBatcher(
        params, cfg, num_slots=2, num_pages=32, page_size=8, max_pages_per_seq=8,
        speculative_k=3,
    )
    batcher.start()
    try:
        futs = [batcher.submit(batch, max_new)]
        time.sleep(0.3)
        futs.append(batcher.submit(batch, max_new))  # mid-flight admission
        results = [f.result(timeout=180) for f in futs]
    finally:
        batcher.stop()
    for got in results:
        assert got == expected, (got, expected)


def test_batcher_speculative_mixed_temperature():
    """A temperature>0 request co-scheduled with greedy ones still completes
    (advancing one sampled token per round) and greedy parity holds."""
    import time

    from tokenpacker_tpu.serve.scheduler import ContinuousBatcher

    cfg, params, batch = _setup("llama", seed=9)
    gen = Generator(params, cfg)
    max_new = 6
    expected = gen.generate(batch, max_new_tokens=max_new, temperature=0.0).sequences[0]
    batcher = ContinuousBatcher(params, cfg, num_slots=2, max_seq_len=64,
                                speculative_k=3)
    batcher.start()
    try:
        f_greedy = batcher.submit(batch, max_new, temperature=0.0)
        f_sampled = batcher.submit(batch, max_new, temperature=0.9)
        got = f_greedy.result(timeout=180)
        sampled = f_sampled.result(timeout=180)
    finally:
        batcher.stop()
    assert got == expected
    assert 1 <= len(sampled) <= max_new


def test_speculative_eos_stop():
    """EOS inside an accepted burst truncates exactly like plain decode."""
    cfg, _, batch = _setup("llama", seed=6)
    params = _repeater_params(cfg, seed=6)
    # make the repeated token the EOS so generation must stop at token 1
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    dev_batch["lengths"] = jnp.asarray(batch["lengths"], jnp.int32)
    dev_batch["images"] = jnp.asarray(batch["images"], cfg.dtype)
    logits, _ = prefill(params, cfg, dev_batch, batch["token_ids"].shape[1] + 4)
    rep = int(np.argmax(np.asarray(logits)[0]))
    lm2 = dataclasses.replace(cfg.lm, eos_token_id=rep)
    cfg2 = dataclasses.replace(cfg, lm=lm2)
    gen = Generator(params, cfg2)
    plain = gen.generate(batch, max_new_tokens=10, temperature=0.0)
    spec = gen.generate(batch, max_new_tokens=10, temperature=0.0, speculative=4)
    assert spec.sequences[0] == plain.sequences[0] == [rep]
