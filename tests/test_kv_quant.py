"""int8 KV-cache quantization (ops/kv_quant + models/llama int8 cache path).

Beyond-reference serving feature: the reference's HF decode keeps fp16
caches (llava/model/language_model/llava_llama.py:120-140); we store K/V
as int8 with per-(position, kv-head) absmax scales, halving cache HBM
footprint and per-step read traffic. These tests pin:

- the quant/dequant roundtrip error bound (and exact zeros),
- that TOKENPACKER_KV_CACHE=int8 threads scales through prefill, decode,
  speculative verify, and the continuous batcher without changing greedy
  behavior beyond quantization noise,
- that MPT keeps float caches (its attention path has no int8 support).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX
from tokenpacker_tpu.models.llama import KVCache, kv_cache_dtype
from tokenpacker_tpu.models.splice import build_splice_plan
from tokenpacker_tpu.models.vlm import init_vlm
from tokenpacker_tpu.ops.kv_quant import dequantize_kv, quantize_kv

SEP, RET, PAD = 7, 8, 0


def test_quantize_kv_roundtrip_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 3, 16)).astype(np.float32)) * 4.0
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.dtype == jnp.float32
    assert q.shape == x.shape and s.shape == x.shape[:-1]
    back = dequantize_kv(q, s, jnp.float32)
    # absmax int8: error <= scale/2 = amax/254 per element
    amax = np.max(np.abs(np.asarray(x)), axis=-1, keepdims=True)
    assert np.all(np.abs(np.asarray(back) - np.asarray(x)) <= amax / 254.0 + 1e-7)


def test_quantize_kv_zero_rows_exact():
    x = jnp.zeros((3, 4, 2, 8), jnp.float32)
    q, s = quantize_kv(x)
    assert np.all(np.asarray(q) == 0)
    assert np.all(np.asarray(dequantize_kv(q, s)) == 0)


def test_kv_cache_dtype_gating(monkeypatch):
    monkeypatch.delenv("TOKENPACKER_KV_CACHE", raising=False)
    assert kv_cache_dtype(jnp.bfloat16) == jnp.bfloat16
    monkeypatch.setenv("TOKENPACKER_KV_CACHE", "int8")
    assert kv_cache_dtype(jnp.bfloat16) == jnp.int8
    # MPT's attention keeps float caches
    assert kv_cache_dtype(jnp.bfloat16, family="mpt") == jnp.bfloat16


def test_kv_cache_create_int8_carries_scales():
    cfg = tiny_vlm_config()
    c = KVCache.create(cfg.lm, 2, 8, dtype=jnp.int8)
    assert c.k.dtype == jnp.int8
    assert c.k_scale is not None and c.k_scale.shape == c.k.shape[:-1]
    f = KVCache.create(cfg.lm, 2, 8)
    assert f.k_scale is None and f.v_scale is None


def _tiny_batch(cfg, seed=3):
    rng = np.random.default_rng(seed)
    images = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids = np.array([1, 17, IMAGE_TOKEN_INDEX, 40, 41, 42], dtype=np.int64)
    plan = build_splice_plan([ids], [[(1, 1)]], cfg.tokens_per_view, "single",
                             SEP, RET, PAD, pad_to=16)
    batch = {
        "token_ids": jnp.asarray(plan.token_ids),
        "is_image": jnp.asarray(plan.is_image),
        "image_slot": jnp.asarray(plan.image_slot),
        "lengths": jnp.asarray(plan.lengths, jnp.int32),
        "images": jnp.asarray(images),
    }
    return batch, plan


def test_int8_cache_decode_close_to_float(monkeypatch):
    """Teacher-forced decode: run the float-cache chain, then replay the
    SAME token sequence through the int8-cache chain; per-step logits must
    track within quantization noise (per-head absmax int8 ~ 0.4% rel)."""
    from tokenpacker_tpu.generate import decode_step, prefill

    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(2), cfg)
    batch, plan = _tiny_batch(cfg)
    l = batch["token_ids"].shape[1]
    steps = 4

    def run(dtype_env):
        if dtype_env:
            monkeypatch.setenv("TOKENPACKER_KV_CACHE", dtype_env)
        else:
            monkeypatch.delenv("TOKENPACKER_KV_CACHE", raising=False)
        logits, cache = prefill(params, cfg, batch, l + steps)
        out = [np.asarray(logits)]
        toks = [int(np.argmax(out[0][0]))]
        for s in range(steps - 1):
            logits, cache = decode_step(
                params, cfg, cache, jnp.asarray([toks[-1]]), batch["lengths"],
                jnp.asarray(s, jnp.int32), l,
            )
            out.append(np.asarray(logits))
            toks.append(int(np.argmax(out[-1][0])))
        return out, toks, cache

    ref_out, ref_toks, _ = run(None)
    # replay the float trajectory's tokens through the int8 chain
    monkeypatch.setenv("TOKENPACKER_KV_CACHE", "int8")
    logits, cache = prefill(params, cfg, batch, l + steps)
    assert cache.k.dtype == jnp.int8 and cache.k_scale is not None
    got = [np.asarray(logits)]
    for s in range(steps - 1):
        logits, cache = decode_step(
            params, cfg, cache, jnp.asarray([ref_toks[s]]), batch["lengths"],
            jnp.asarray(s, jnp.int32), l,
        )
        got.append(np.asarray(logits))
    for a, b in zip(ref_out, got):
        scale = max(1.0, float(np.max(np.abs(a))))
        assert np.max(np.abs(a - b)) / scale < 0.05


def test_int8_cache_speculative_verify(monkeypatch):
    """verify_step_cb (T>1 per-slot scatter writes) threads int8 scales."""
    from tokenpacker_tpu.speculative import verify_step_cb

    monkeypatch.setenv("TOKENPACKER_KV_CACHE", "int8")
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(4), cfg)
    n, t, s_max = 2, 3, 12
    cache = KVCache.create(cfg.lm, n, s_max, jnp.int8)._replace(
        length=jnp.zeros((n,), jnp.int32)
    )
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(1, 50, size=(n, t)), jnp.int32)
    cur = jnp.asarray([2, 4], jnp.int32)
    active = jnp.ones((n,), jnp.bool_)
    logits, new_cache = verify_step_cb(params, cfg, cache, toks, cur, active)
    assert logits.shape == (n, t, cfg.lm.vocab_size)
    assert new_cache.k.dtype == jnp.int8 and new_cache.k_scale is not None
    # the scatter wrote scales at the written rows
    ks = np.asarray(new_cache.k_scale)
    assert np.all(ks[:, 0, 2:5, :] > 0) and np.all(ks[:, 1, 4:7, :] > 0)


def test_continuous_batcher_int8_smoke(monkeypatch):
    """ContinuousBatcher with TOKENPACKER_KV_CACHE=int8: text-only request
    completes, emits max_new_tokens ints, and the big cache is int8."""
    from tokenpacker_tpu.serve.scheduler import ContinuousBatcher

    monkeypatch.setenv("TOKENPACKER_KV_CACHE", "int8")
    monkeypatch.setenv("TOKENPACKER_FUSED_DECODE", "0")
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(5), cfg)
    b = ContinuousBatcher(params, cfg, num_slots=2, max_seq_len=32)
    assert b.cache.k.dtype == jnp.int8 and b.cache.k_scale is not None
    ids = np.array([[1, 9, 11, 13]], np.int64)
    batch = {
        "token_ids": ids,
        "is_image": np.zeros_like(ids, bool),
        "image_slot": np.zeros_like(ids, np.int32),
        "lengths": np.asarray([ids.shape[1]], np.int32),
        "images": None,
    }
    b.start()
    try:
        fut = b.submit(batch, max_new_tokens=5, temperature=0.0)
        result = fut.result(timeout=120)
    finally:
        b.stop()
    assert len(result) == 5


def test_chunked_prefill_ignores_flash_gate(monkeypatch):
    """Regression: prefill_chunk must NOT take the flash prefill path — the
    flash kernel attends only within the current span, which is wrong for
    chunks after the first (earlier cache positions must be attendable).
    Force the auto-gate ON; chunked must still match full prefill."""
    import tokenpacker_tpu.models.llama as llama_mod
    from tokenpacker_tpu.generate import prefill
    from tokenpacker_tpu.models.vlm import encode_images

    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(6), cfg)
    batch, plan = _tiny_batch(cfg, seed=6)
    l = batch["token_ids"].shape[1]
    s_max = l + 4
    ref_logits, _ = prefill(params, cfg, batch, s_max)

    monkeypatch.setattr(llama_mod, "_use_flash_prefill", lambda t: True)
    from tokenpacker_tpu.generate import prefill_chunk
    from tokenpacker_tpu.models.lm_api import lm_logits

    visual = encode_images(params, cfg, batch["images"])
    cache = KVCache.create(cfg.lm, 1, s_max, jnp.float32)
    true_len = int(plan.lengths[0])
    hidden, off = None, 0
    while off < true_len:
        n = min(4, true_len - off)
        hidden, cache = prefill_chunk(
            params, cfg, cache, visual,
            batch["token_ids"][:, off:off + n],
            batch["is_image"][:, off:off + n],
            batch["image_slot"][:, off:off + n],
            jnp.asarray(off, jnp.int32), n,
        )
        off += n
    got = np.asarray(lm_logits(params["lm"], cfg.lm, hidden[:, -1]))
    np.testing.assert_allclose(got, np.asarray(ref_logits), rtol=2e-5, atol=2e-5)


def test_paged_batcher_int8_smoke(monkeypatch):
    """PagedContinuousBatcher with an int8 pool: admission (insert_prefill
    scale copy), paged decode (gather + dequant path), completion, and page
    release all work; the pool is int8 with scales."""
    from tokenpacker_tpu.serve.scheduler import PagedContinuousBatcher

    monkeypatch.setenv("TOKENPACKER_KV_CACHE", "int8")
    monkeypatch.setenv("TOKENPACKER_FUSED_DECODE", "0")
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(5), cfg)
    b = PagedContinuousBatcher(
        params, cfg, num_slots=2, num_pages=32, page_size=8, max_pages_per_seq=8
    )
    assert b.paged.k_pages.dtype == jnp.int8 and b.paged.k_scales is not None
    ids = np.array([[1, 9, 11, 13]], np.int64)
    batch = {
        "token_ids": ids,
        "is_image": np.zeros_like(ids, bool),
        "image_slot": np.zeros_like(ids, np.int32),
        "lengths": np.asarray([ids.shape[1]], np.int32),
        "images": None,
    }
    b.start()
    try:
        fut = b.submit(batch, max_new_tokens=5, temperature=0.0)
        result = fut.result(timeout=120)
    finally:
        b.stop()
    assert len(result) == 5
    assert b.allocator.available() == 31
