"""Multi-LoRA serving (serve/multi_lora.py): overlay math vs merged-weight
oracles, batcher integration with per-request adapters, prefix-cache
isolation, and the fused-kernel gate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_trainer import Tok
from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.models.vlm import init_vlm
from tokenpacker_tpu.serve.multi_lora import (
    Adapter,
    SlotLora,
    has_slot_lora,
    target_dims,
)

R = 4


def _mk_adapter(key, cfg, r=R, scale=0.02, targets=None):
    """Random unmerged adapter over all (or some) LM targets."""
    dims = target_dims(cfg.lm)
    n_layers = cfg.lm.num_hidden_layers
    lora = {}
    for i, (tgt, (din, dout)) in enumerate(sorted(dims.items())):
        if targets is not None and tgt not in targets:
            continue
        k1, k2, key = jax.random.split(jax.random.fold_in(key, i), 3)
        a = scale * jax.random.normal(k1, (n_layers, din, r), jnp.float32)
        b = scale * jax.random.normal(k2, (n_layers, r, dout), jnp.float32)
        lora[tgt] = (np.asarray(a), np.asarray(b))
    return Adapter(lora, r)


def _merge(params, adapter: Adapter):
    """Oracle: fold an adapter's deltas into dense kernels."""
    import copy

    out = copy.deepcopy(jax.tree.map(lambda x: x, params))
    layers = out["lm"]["layers"]
    for (grp, leaf), (a, b) in adapter.lora.items():
        d = dict(layers[grp][leaf])
        delta = jnp.einsum("lir,lro->lio", jnp.asarray(a), jnp.asarray(b))
        d["kernel"] = d["kernel"] + delta.astype(d["kernel"].dtype)
        layers[grp] = {**layers[grp], leaf: d}
    return out


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    # scale chosen so greedy streams actually diverge from the base on the
    # tiny model (a weak adapter can agree with the base argmax everywhere)
    ad_a = _mk_adapter(jax.random.PRNGKey(1), cfg, scale=0.3)
    ad_b = _mk_adapter(jax.random.PRNGKey(2), cfg, r=2)  # mixed ranks
    return cfg, params, {"ad_a": ad_a, "ad_b": ad_b}


def _decode_tokens(params, cfg, prompt_ids, n_steps=6):
    """Greedy tokens via the plain Generator path (single request)."""
    from tokenpacker_tpu.generate import Generator

    tok = Tok()
    gen = Generator(params, cfg, tok)
    ids = np.asarray(prompt_ids, np.int64)[None]
    batch = {
        "token_ids": ids,
        "is_image": np.zeros_like(ids, bool),
        "image_slot": np.zeros_like(ids, np.int32),
        "lengths": np.array([ids.shape[1]]),
        "images": None,
    }
    return gen.generate(batch, max_new_tokens=n_steps, temperature=0.0).sequences[0]


def test_overlay_matches_merged_weights(setup):
    """decode_step_cb with a slot overlay == decoding with merged kernels,
    per slot: slot 0 uses ad_a, slot 1 the base (all-zero selector row)."""
    from tokenpacker_tpu.generate import decode_step_cb, insert_into_cache, prefill
    from tokenpacker_tpu.models.llama import KVCache

    cfg, params, adapters = setup
    sl = SlotLora(params, cfg, adapters, num_slots=2)
    sl.set_slot(0, "ad_a")
    sl.set_slot(1, None)
    overlay = sl.overlay(params)
    assert has_slot_lora(overlay["lm"]) and not has_slot_lora(params["lm"])

    ids = np.arange(2, 9, dtype=np.int64)[None]
    batch = {
        "token_ids": jnp.asarray(ids),
        "is_image": jnp.zeros_like(jnp.asarray(ids), bool),
        "image_slot": jnp.zeros(ids.shape, jnp.int32),
        "lengths": jnp.asarray([ids.shape[1]]),
        "images": None,
    }
    merged = _merge(params, adapters["ad_a"])

    def slot_cache(pp):
        """Prefill the same prompt into both slots under params pp."""
        logits, small = prefill(pp, cfg, batch, 16)
        cache = KVCache.create(cfg.lm, 2, 32, dtype=small.k.dtype)._replace(
            length=jnp.zeros((2,), jnp.int32)
        )
        for slot in range(2):
            cache = insert_into_cache(cache, small, slot, ids.shape[1])
        return logits, cache

    # oracle caches: slot-0 stream under merged params, slot-1 under base
    logits_m, _ = slot_cache(merged)
    logits_b, cache = slot_cache(params)
    # prefill under the per-request overlay (selector row = ad_a)
    logits_ov, _ = slot_cache(sl.prefill_params(params, "ad_a"))
    np.testing.assert_allclose(
        np.asarray(logits_ov[0], np.float32), np.asarray(logits_m[0], np.float32),
        rtol=2e-2, atol=2e-2,
    )

    # rebuild the two-slot cache: slot 0 prefilled with adapter KV
    _, small_a = prefill(sl.prefill_params(params, "ad_a"), cfg, batch, 16)
    _, small_b = prefill(params, cfg, batch, 16)
    cache = KVCache.create(cfg.lm, 2, 32, dtype=small_a.k.dtype)._replace(
        length=jnp.zeros((2,), jnp.int32)
    )
    cache = insert_into_cache(cache, small_a, 0, ids.shape[1])
    cache = insert_into_cache(cache, small_b, 1, ids.shape[1])

    # oracle single-slot caches under merged/base params
    _, cache_m = slot_cache(merged)
    _, cache_bb = slot_cache(params)

    toks = jnp.asarray([3, 3], jnp.int32)
    active = jnp.ones((2,), bool)
    got, _ = decode_step_cb(overlay, cfg, cache, toks, cache.length, active)
    want_m, _ = decode_step_cb(merged, cfg, cache_m, toks, cache_m.length, active)
    want_b, _ = decode_step_cb(params, cfg, cache_bb, toks, cache_bb.length, active)
    np.testing.assert_allclose(
        np.asarray(got[0], np.float32), np.asarray(want_m[0], np.float32),
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(got[1], np.float32), np.asarray(want_b[1], np.float32),
        rtol=1e-5, atol=1e-5,
    )


def test_zero_selector_is_exact_base(setup):
    """An all-zero selector row reproduces base logits EXACTLY (the term
    contributes a true zero, not a rounding-level perturbation)."""
    from tokenpacker_tpu.generate import prefill

    cfg, params, adapters = setup
    sl = SlotLora(params, cfg, adapters, num_slots=2)
    ids = np.arange(2, 8, dtype=np.int64)[None]
    batch = {
        "token_ids": jnp.asarray(ids),
        "is_image": jnp.zeros_like(jnp.asarray(ids), bool),
        "image_slot": jnp.zeros(ids.shape, jnp.int32),
        "lengths": jnp.asarray([ids.shape[1]]),
        "images": None,
    }
    logits_base, _ = prefill(params, cfg, batch, 16)
    logits_none, _ = prefill(sl.prefill_params(params, None), cfg, batch, 16)
    np.testing.assert_array_equal(np.asarray(logits_base), np.asarray(logits_none))


def test_batcher_end_to_end_adapter_selection(setup):
    """ContinuousBatcher with adapters: concurrent requests on different
    adapters reproduce their single-request oracles exactly."""
    from tokenpacker_tpu.serve.scheduler import ContinuousBatcher

    cfg, params, adapters = setup
    merged_a = _merge(params, adapters["ad_a"])

    prompt = list(range(2, 10))
    want_a = _decode_tokens(merged_a, cfg, prompt)
    want_base = _decode_tokens(params, cfg, prompt)

    batcher = ContinuousBatcher(
        params, cfg, Tok(), num_slots=2, max_seq_len=32, adapters=adapters
    )
    batcher.start()
    try:
        ids = np.asarray(prompt, np.int64)[None]
        batch = {
            "token_ids": ids,
            "is_image": np.zeros_like(ids, bool),
            "image_slot": np.zeros_like(ids, np.int32),
            "lengths": np.array([ids.shape[1]]),
            "images": None,
        }
        fut_a = batcher.submit(dict(batch), max_new_tokens=6, temperature=0.0,
                               adapter="ad_a")
        fut_b = batcher.submit(dict(batch), max_new_tokens=6, temperature=0.0)
        got_a, got_b = fut_a.result(timeout=300), fut_b.result(timeout=300)
    finally:
        batcher.stop()
    assert got_a == list(want_a)
    assert got_b == list(want_base)
    assert got_a != got_b  # the adapter actually changed the stream


def test_submit_rejects_unknown_adapter(setup):
    from tokenpacker_tpu.serve.scheduler import ContinuousBatcher

    cfg, params, adapters = setup
    batcher = ContinuousBatcher(params, cfg, Tok(), num_slots=2,
                                max_seq_len=32, adapters=adapters)
    fut = batcher.submit({"token_ids": np.zeros((1, 4), np.int64)},
                         adapter="nope")
    with pytest.raises(KeyError):
        fut.result(timeout=5)
    # and without any adapters loaded
    plain = ContinuousBatcher(params, cfg, Tok(), num_slots=2, max_seq_len=32)
    fut = plain.submit({"token_ids": np.zeros((1, 4), np.int64)}, adapter="ad_a")
    with pytest.raises(KeyError):
        fut.result(timeout=5)


def test_paged_batcher_with_adapters_and_prefix_isolation(setup):
    """Paged batcher: same prompt under two adapters produces each oracle's
    tokens AND the prefix cache never shares pages across adapters."""
    from tokenpacker_tpu.serve.scheduler import PagedContinuousBatcher

    cfg, params, adapters = setup
    merged_a = _merge(params, adapters["ad_a"])
    prompt = list(range(2, 14))
    want_a = list(_decode_tokens(merged_a, cfg, prompt))
    want_base = list(_decode_tokens(params, cfg, prompt))

    batcher = PagedContinuousBatcher(
        params, cfg, Tok(), num_slots=2, num_pages=64, page_size=4,
        max_pages_per_seq=16, adapters=adapters, prefix_cache=True,
    )
    batcher.start()
    try:
        ids = np.asarray(prompt, np.int64)[None]
        batch = {
            "token_ids": ids,
            "is_image": np.zeros_like(ids, bool),
            "image_slot": np.zeros_like(ids, np.int32),
            "lengths": np.array([ids.shape[1]]),
            "images": None,
        }
        got_a = batcher.submit(dict(batch), max_new_tokens=6, temperature=0.0,
                               adapter="ad_a").result(timeout=300)
        got_base = batcher.submit(dict(batch), max_new_tokens=6,
                                  temperature=0.0).result(timeout=300)
        # warm repeats stay correct (prefix hit must be adapter-local)
        got_a2 = batcher.submit(dict(batch), max_new_tokens=6, temperature=0.0,
                                adapter="ad_a").result(timeout=300)
        got_base2 = batcher.submit(dict(batch), max_new_tokens=6,
                                   temperature=0.0).result(timeout=300)
    finally:
        batcher.stop()
    assert got_a == want_a and got_a2 == want_a
    assert got_base == want_base and got_base2 == want_base


# -- fused-decode kernel composition (round 5, VERDICT r4 #1) ----------------


def _fused_rig():
    """Fused-eligible tiny geometry (head_dim 128, int8 fused layout) —
    the serving shape family the fused whole-stack kernel dispatches on."""
    from types import SimpleNamespace

    from tests.test_fused_decode import build_params, tiny_cfg

    lm_cfg = tiny_cfg(layers=2)
    cfg = SimpleNamespace(lm=lm_cfg, dtype=jnp.bfloat16)
    params = {"lm": build_params(lm_cfg, seed=3)}
    ads = {
        "ad_a": _mk_adapter(jax.random.PRNGKey(5), cfg, scale=0.3),
        "ad_b": _mk_adapter(jax.random.PRNGKey(6), cfg, r=2, scale=0.3,
                            targets=[("attn", "q"), ("mlp", "down")]),
    }
    return cfg, params, ads


def _fd_decode(lm_params, lm_cfg, cache, emb, lengths, pre, slot_lora=None):
    from tokenpacker_tpu.ops.fused_decode import fused_decode_hidden

    wpos = jnp.full(lengths.shape, pre, jnp.int32)
    return fused_decode_hidden(
        lm_params, lm_cfg, emb, cache.k, cache.v,
        lengths, wpos, wpos, wpos, positions=lengths, interpret=True,
        slot_lora=slot_lora,
    )


def test_fd_gate_dispatches_with_bundle(setup, monkeypatch):
    """Dispatch rules: slot-LoRA params WITH the fd bundle run the kernel;
    without the bundle — or under TOKENPACKER_FD_LORA=0 — they fall back."""
    from tokenpacker_tpu.generate import _fused_decode_mode
    from tokenpacker_tpu.models.llama import KVCache

    cfg, params, ads = _fused_rig()
    monkeypatch.setenv("TOKENPACKER_FUSED_DECODE", "interpret")
    cache = KVCache.create(cfg.lm, 1, 64, dtype=jnp.bfloat16)
    assert _fused_decode_mode(params, cfg, cache) == "interpret"
    sl = SlotLora(params, cfg, ads, num_slots=1)
    overlay = sl.overlay(params)
    assert overlay["lm"].get("fd_slot_lora") is not None
    assert _fused_decode_mode(overlay, cfg, cache) == "interpret"
    monkeypatch.setenv("TOKENPACKER_FD_LORA", "0")
    assert _fused_decode_mode(overlay, cfg, cache) is None
    monkeypatch.delenv("TOKENPACKER_FD_LORA")
    # slot-LoRA leaves WITHOUT the kernel bundle (e.g. an unfused base
    # layout) must keep the round-4 gate-off behavior
    stripped = {**overlay, "lm": {
        k: v for k, v in overlay["lm"].items() if k != "fd_slot_lora"
    }}
    assert _fused_decode_mode(stripped, cfg, cache) is None


def test_fd_lora_zero_selection_exact(monkeypatch):
    """All-zero selection through the kernel == the plain fused kernel,
    EXACTLY (masked adapter columns contribute true f32 zeros)."""
    from tests.test_fused_decode import prefill as fd_prefill

    cfg, params, ads = _fused_rig()
    sl = SlotLora(params, cfg, ads, num_slots=2)
    overlay = sl.overlay(params)  # both slots base
    b, s, pre = 2, 64, 16
    lengths = jnp.asarray([10, 16], jnp.int32)
    cache = fd_prefill(params["lm"], cfg.lm, b, s, pre, lengths)
    emb = (0.1 * jax.random.normal(
        jax.random.PRNGKey(9), (b, cfg.lm.hidden_size))).astype(jnp.bfloat16)

    h0, k0, v0 = _fd_decode(params["lm"], cfg.lm, cache, emb, lengths, pre)
    h1, k1, v1 = _fd_decode(
        overlay["lm"], cfg.lm, cache, emb, lengths, pre,
        slot_lora=overlay["lm"]["fd_slot_lora"],
    )
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))


def test_fd_lora_matches_xla_slot_lora(monkeypatch):
    """Mixed-slot decode (slot 0 = ad_a full-target, slot 1 = ad_b partial)
    through the fused kernel matches the XLA slot-LoRA path within the
    kernel's usual accumulation tolerance, and differs from the base."""
    from tests.test_fused_decode import prefill as fd_prefill, xla_decode

    cfg, params, ads = _fused_rig()
    sl = SlotLora(params, cfg, ads, num_slots=2)
    sl.set_slot(0, "ad_a")
    sl.set_slot(1, "ad_b")
    overlay = sl.overlay(params)
    b, s, pre = 2, 64, 16
    lengths = jnp.asarray([10, 16], jnp.int32)
    cache = fd_prefill(params["lm"], cfg.lm, b, s, pre, lengths)
    emb = (0.1 * jax.random.normal(
        jax.random.PRNGKey(11), (b, 1, cfg.lm.hidden_size))).astype(jnp.bfloat16)

    from tokenpacker_tpu.ops.layers import rms_norm

    hx, _ = xla_decode(overlay["lm"], cfg.lm, cache, emb, lengths, 0, pre, s)
    hf_pre, _, _ = _fd_decode(
        overlay["lm"], cfg.lm, cache, emb[:, 0], lengths, pre,
        slot_lora=overlay["lm"]["fd_slot_lora"],
    )
    hf = rms_norm(params["lm"]["norm"], hf_pre)  # llama_apply output is normed
    ax, af = np.asarray(hx, np.float32), np.asarray(hf, np.float32)
    assert np.max(np.abs(ax - af)) / (np.max(np.abs(ax)) + 1e-9) < 0.02
    hb, _, _ = _fd_decode(params["lm"], cfg.lm, cache, emb[:, 0], lengths, pre)
    assert np.max(np.abs(np.asarray(hf_pre, np.float32)
                         - np.asarray(hb, np.float32))) > 1e-3


def test_fd_lora_batcher_greedy_parity(monkeypatch):
    """ContinuousBatcher end-to-end: adapter-routed greedy streams are
    token-identical through the fused kernel (interpret dispatch) and the
    XLA slot-LoRA path — the serving-level guarantee that lifting the
    round-4 gate must preserve."""
    from tokenpacker_tpu.config import TokenPackerVLMConfig
    from tokenpacker_tpu.serve.scheduler import ContinuousBatcher

    rig_cfg, params, ads = _fused_rig()
    cfg = TokenPackerVLMConfig(lm=rig_cfg.lm, dtype=jnp.bfloat16)
    prompt = list(range(2, 10))
    ids = np.asarray(prompt, np.int64)[None]
    batch = {
        "token_ids": ids,
        "is_image": np.zeros_like(ids, bool),
        "image_slot": np.zeros_like(ids, np.int32),
        "lengths": np.array([ids.shape[1]]),
        "images": None,
    }

    def run(env):
        monkeypatch.setenv("TOKENPACKER_FUSED_DECODE", env)
        b = ContinuousBatcher(
            params, cfg, Tok(), num_slots=2, max_seq_len=32, adapters=ads
        )
        b.start()
        try:
            fa = b.submit(dict(batch), max_new_tokens=5, temperature=0.0,
                          adapter="ad_a")
            fb = b.submit(dict(batch), max_new_tokens=5, temperature=0.0)
            return fa.result(timeout=600), fb.result(timeout=600)
        finally:
            b.stop()
            monkeypatch.delenv("TOKENPACKER_FUSED_DECODE")

    got_fused = run("interpret")
    got_xla = run("0")
    assert got_fused == got_xla


def test_fd_lora_verify_path(monkeypatch):
    """fused_verify_hidden (T>1 speculative verify) composes with the
    bundle: live adapters match the XLA slot-LoRA verify oracle."""
    from tests.test_fused_decode import NEG as FD_NEG
    from tests.test_fused_decode import prefill as fd_prefill
    from tokenpacker_tpu.models.llama import llama_apply
    from tokenpacker_tpu.ops.fused_decode import fused_verify_hidden

    cfg, params, ads = _fused_rig()
    sl = SlotLora(params, cfg, ads, num_slots=2)
    sl.set_slot(0, "ad_a")
    overlay = sl.overlay(params)
    b, t, s, pre = 2, 3, 64, 16
    lengths = jnp.asarray([10, 16], jnp.int32)
    cache = fd_prefill(params["lm"], cfg.lm, b, s, pre, lengths)
    emb = (0.1 * jax.random.normal(
        jax.random.PRNGKey(13), (b, t, cfg.lm.hidden_size))).astype(jnp.bfloat16)
    offs = jnp.arange(t, dtype=jnp.int32)
    positions = lengths[:, None] + offs[None, :]
    wpos0 = jnp.full((b,), pre, jnp.int32)

    from tokenpacker_tpu.ops.layers import rms_norm

    hf_pre, _, _ = fused_verify_hidden(
        overlay["lm"], cfg.lm, emb, cache.k, cache.v,
        lengths, wpos0, wpos0, wpos0, positions, interpret=True,
        slot_lora=overlay["lm"]["fd_slot_lora"],
    )
    hf = rms_norm(params["lm"]["norm"], hf_pre)  # llama_apply output is normed
    # XLA oracle: speculative._verify attention semantics at step 0
    key_idx = jnp.arange(s)[None, None, :]
    prompt_ok = key_idx < lengths[:, None, None]
    dec_ok = (key_idx >= pre) & (key_idx <= pre + offs[None, :, None])
    bias = jnp.where((prompt_ok | dec_ok)[:, None], 0.0, FD_NEG).astype(jnp.float32)
    cache_at = cache._replace(length=pre)
    hx, _ = llama_apply(overlay["lm"], cfg.lm, emb, positions, bias, cache_at)
    ax, af = np.asarray(hx, np.float32), np.asarray(hf, np.float32)
    # 3% like test_fused_verify's dispatch check: the 0.3-scale adapter's
    # bf16 reorder compounds along the in-chunk causal token chain
    assert np.max(np.abs(ax - af)) / (np.max(np.abs(ax)) + 1e-9) < 0.03


def test_load_adapter_peft_checkpoint(tmp_path, setup):
    """load_adapter reads a PEFT-format dir: scaling folded into b, torch
    [r,in]/[out,r] transposed to [in,r]/[r,out], projector from
    non_lora_trainables."""
    torch = pytest.importorskip("torch")
    import json

    from tokenpacker_tpu.serve.multi_lora import load_adapter

    cfg, params, _ = setup
    d = cfg.lm.hidden_size
    r, alpha = 2, 8
    sd = {}
    a0 = torch.randn(r, d)
    b0 = torch.randn(cfg.lm.num_attention_heads * cfg.lm.head_dim, r)
    sd["base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight"] = a0
    sd["base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight"] = b0
    torch.save(sd, tmp_path / "adapter_model.bin")
    (tmp_path / "adapter_config.json").write_text(
        json.dumps({"r": r, "lora_alpha": alpha})
    )
    ad = load_adapter(str(tmp_path), cfg)
    assert ad.r == r and ("attn", "q") in ad.lora
    a, b = ad.lora[("attn", "q")]
    np.testing.assert_allclose(a[0], a0.numpy().T, rtol=1e-6)
    np.testing.assert_allclose(b[0], b0.numpy().T * (alpha / r), rtol=1e-6)
    # untouched layers are zero → no delta
    assert not a[1:].any() and not b[1:].any()
    assert ad.projector is None


def test_roundtrip_from_training_export(tmp_path, setup):
    """A LoRA trained and saved by OUR trainer (reference PEFT layout,
    train/lora.export_lora_state_dict) loads straight into multi-LoRA
    serving with the alpha/r scaling folded correctly."""
    torch = pytest.importorskip("torch")
    import json

    from tokenpacker_tpu.serve.multi_lora import load_adapter
    from tokenpacker_tpu.train.lora import (
        LoraConfig,
        export_lora_state_dict,
        init_lora,
    )

    cfg, params, _ = setup
    lcfg = LoraConfig(r=2, alpha=6)
    lora = init_lora(jax.random.PRNGKey(7), params, lcfg)
    # init_lora zeroes b — randomize so the round-trip is non-trivial
    lora = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(int(x.size) % 97),
                                    x.shape, x.dtype) * 0.1,
        lora,
    )
    sd = export_lora_state_dict(jax.device_get(lora), lcfg)
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
               tmp_path / "adapter_model.bin")
    (tmp_path / "adapter_config.json").write_text(
        json.dumps({"r": lcfg.r, "lora_alpha": lcfg.alpha, "peft_type": "LORA"})
    )
    ad = load_adapter(str(tmp_path), cfg)
    assert set(ad.lora) == set(target_dims(cfg.lm))
    src = lora["lm"]["layers"]["attn"]["q"]["kernel"]
    a, b = ad.lora[("attn", "q")]
    np.testing.assert_allclose(a, np.asarray(src["a"], np.float32),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        b, np.asarray(src["b"], np.float32) * (lcfg.alpha / lcfg.r),
        rtol=1e-5, atol=1e-6,
    )
