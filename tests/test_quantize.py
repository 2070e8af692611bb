"""int8 weight-only quantization tests."""

import numpy as np

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.models.vlm import init_vlm, vlm_loss
from tokenpacker_tpu.ops.quantize import (
    dequantize_int8,
    dequantize_tree,
    quantize_int8,
    quantize_tree,
    tree_bytes,
)
from tests.test_train_step import _tiny_batch


def test_quant_roundtrip_error():
    w = jnp.asarray(np.random.default_rng(0).standard_normal((256, 128)), jnp.float32)
    q, s = quantize_int8(w)
    back = dequantize_int8(q, s, jnp.float32)
    # per-channel int8: max error bounded by scale/2
    max_err = float(jnp.max(jnp.abs(back - w)))
    max_scale = float(jnp.max(s))
    assert max_err <= max_scale * 0.51


def test_quantized_model_close_loss():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    qparams = quantize_tree(params, min_size=1)  # quantize everything 2D
    deq = dequantize_tree(qparams, jnp.float32)
    batch = _tiny_batch(cfg)
    l0, _ = vlm_loss(params, cfg, batch)
    l1, _ = vlm_loss(deq, cfg, batch)
    assert abs(float(l0) - float(l1)) < 0.2, (float(l0), float(l1))
    assert tree_bytes(qparams) < tree_bytes(params)


def test_int8_linear_path_in_llama():
    """linear() consumes quantized kernels: generation works with an int8 LM."""
    from tokenpacker_tpu.generate import Generator
    from tokenpacker_tpu.models.splice import build_splice_plan
    from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX

    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    params_q = dict(params)
    params_q["lm"] = quantize_tree(params["lm"], min_size=1)

    rng = np.random.default_rng(0)
    images = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids = np.array([1, 17, IMAGE_TOKEN_INDEX, 40], dtype=np.int64)
    plan = build_splice_plan([ids], [[(1, 1)]], cfg.tokens_per_view, "single", 7, 8, 0, pad_to=16)
    batch = {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_slot": plan.image_slot,
        "lengths": plan.lengths,
        "images": images,
    }
    out_q = Generator(params_q, cfg).generate(batch, max_new_tokens=3)
    out_f = Generator(params, cfg).generate(batch, max_new_tokens=3)
    assert len(out_q.sequences[0]) >= 1  # runs end-to-end on int8 weights


# ---------------------------------------------------------------------------
# 4-bit (nf4/int4) — VERDICT r1 item 6
# ---------------------------------------------------------------------------


def test_quantize_4bit_roundtrip_error():
    import jax.numpy as jnp

    from tokenpacker_tpu.ops.quantize import dequantize_4bit, quantize_4bit

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 128)) * 0.02, jnp.float32)
    for qt in ("nf4", "int4"):
        q = quantize_4bit(w, block=64, quant_type=qt)
        key = next(k for k in q if k.startswith("q4:"))
        assert q[key].shape == (128, 128) and q[key].dtype == np.uint8
        back = np.asarray(dequantize_4bit(q, jnp.float32))
        # error bounded by half the largest codebook gap times the block absmax
        blocks = np.asarray(w, np.float32).reshape(4, 64, 128)
        absmax = np.abs(blocks).max(axis=1)
        bound = np.repeat(absmax, 64, axis=0) * 0.20 + 1e-8
        assert (np.abs(back - np.asarray(w)) <= bound).all(), qt


def test_quantize_tree_4bit_and_linear():
    import jax
    import jax.numpy as jnp

    from tokenpacker_tpu.ops.layers import linear
    from tokenpacker_tpu.ops.quantize import (
        dequantize_4bit,
        dequantize_tree_4bit,
        quantize_tree_4bit,
        tree_bytes,
    )

    rng = np.random.default_rng(1)
    params = {
        "a": {"kernel": jnp.asarray(rng.standard_normal((512, 512)), jnp.float32),
              "bias": jnp.zeros((512,), jnp.float32)},
        "stacked": {"kernel": jnp.asarray(rng.standard_normal((2, 512, 512)), jnp.float32)},
        "small": {"kernel": jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)},
    }
    qt = quantize_tree_4bit(params, quant_type="nf4")
    # small stays dense; big ones quantized to < 0.6 bytes/weight
    assert isinstance(qt["small"]["kernel"], jnp.ndarray)
    assert tree_bytes(qt["a"]) < 512 * 512 * 0.8
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
    dense = dequantize_4bit(qt["a"]["kernel"], jnp.float32)
    got = linear(qt["a"], x)  # CPU: dense-dequant branch
    np.testing.assert_allclose(np.asarray(got), np.asarray(x @ dense), rtol=1e-5, atol=1e-5)

    # stacked layers dequantize with leading dim intact and scan-compatible
    dq = dequantize_tree_4bit(qt, jnp.float32)
    assert dq["stacked"]["kernel"].shape == (2, 512, 512)

    def scan_fn(carry, layer):
        return carry, linear(layer, x)

    _, ys = jax.lax.scan(scan_fn, None, qt["stacked"])
    assert ys.shape == (2, 4, 512)


def test_q4_matmul_kernel_matches_dequant():
    import jax.numpy as jnp

    from tokenpacker_tpu.ops.q4_matmul import q4_matmul
    from tokenpacker_tpu.ops.quantize import dequantize_4bit, quantize_4bit

    rng = np.random.default_rng(2)
    for qt in ("nf4", "int4"):
        w = jnp.asarray(rng.standard_normal((256, 384)) * 0.02, jnp.float32)
        q = quantize_4bit(w, block=64, quant_type=qt)
        x = jnp.asarray(rng.standard_normal((3, 256)), jnp.float32)
        ref = x @ dequantize_4bit(q, jnp.float32)
        got = q4_matmul(x, q, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_load_4bit_generates(tmp_path, monkeypatch):
    """load_4bit through the public API on a tiny checkpoint: quantized
    leaves in the LM tree and a working greedy decode."""
    import json

    import jax
    import jax.numpy as jnp
    import torch

    import tokenpacker_tpu.api as api
    from tests.test_trainer import Tok
    from tokenpacker_tpu.config import tiny_vlm_config
    from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX
    from tokenpacker_tpu.io.hf_export import export_vlm_state_dict
    from tokenpacker_tpu.models.splice import build_splice_plan
    from tokenpacker_tpu.models.vlm import init_vlm

    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    sd = export_vlm_state_dict(params, cfg)
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        tmp_path / "pytorch_model.bin",
    )
    (tmp_path / "config.json").write_text(json.dumps(cfg.to_hf_dict()))
    monkeypatch.setattr(api, "_load_tokenizer", lambda p: Tok())
    monkeypatch.setattr(api.TokenPackerVLMConfig, "from_json", classmethod(lambda c, p: cfg))
    # tiny kernels are below the production min_size threshold; lower it
    import functools

    import tokenpacker_tpu.ops.quantize as qmod

    monkeypatch.setattr(
        qmod, "quantize_tree_4bit",
        functools.partial(qmod.quantize_tree_4bit.__wrapped__, min_size=1024)
        if hasattr(qmod.quantize_tree_4bit, "__wrapped__")
        else functools.partial(qmod.quantize_tree_4bit, min_size=1024),
    )
    _, model, _, _ = api.load_pretrained_model(str(tmp_path), load_4bit=True, dtype=jnp.float32)

    leaves = jax.tree.leaves_with_path(model.params["lm"])
    assert any("q4:" in str(p) for p, _ in leaves), "no 4-bit leaves in LM"

    rng = np.random.default_rng(0)
    ids = np.array([1, 17, IMAGE_TOKEN_INDEX, 40], dtype=np.int64)
    plan = build_splice_plan([ids], [[(1, 1)]], cfg.tokens_per_view, "single", 7, 8, 0, pad_to=16)
    out = model.generator.generate(
        {
            "token_ids": plan.token_ids,
            "is_image": plan.is_image,
            "image_slot": plan.image_slot,
            "lengths": plan.lengths,
            "images": rng.standard_normal((1, 56, 56, 3)).astype(np.float32),
        },
        max_new_tokens=3,
        temperature=0.0,
    )
    assert len(out.sequences[0]) >= 1


def test_fused_llama_layers_equivalent():
    """fuse_llama_layers (qkv/gateup) must be output-identical to the
    unfused layout through the full decoder."""
    import jax
    import jax.numpy as jnp

    from tokenpacker_tpu.config import tiny_vlm_config
    from tokenpacker_tpu.models.llama import (
        embed_tokens,
        init_llama,
        llama_apply,
        make_attention_bias,
    )
    from tokenpacker_tpu.ops.quantize import fuse_llama_layers

    cfg = tiny_vlm_config().lm
    params = init_llama(jax.random.PRNGKey(0), cfg)
    fused = fuse_llama_layers(params)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 200, (2, 9)))
    emb = embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(9), (2, 9))
    bias = make_attention_bias(pos, jnp.ones((2, 9), bool), 0, 9)
    ref, _ = llama_apply(params, cfg, emb, pos, bias)
    got, _ = llama_apply(fused, cfg, emb, pos, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_quantized_mpt_forward_and_decode():
    """Regression (review r2): MPT consumed kernels with raw matmuls, so
    int8/4-bit quantized MPT trees crashed at trace time. Now routed through
    ops.layers.linear: quantized MPT runs prefill + decode and stays close
    to the dense forward."""
    import jax
    import jax.numpy as jnp

    from tokenpacker_tpu.models.llama import KVCache, make_attention_bias
    from tokenpacker_tpu.models.mpt import init_mpt, mpt_apply, mpt_config, mpt_embed
    from tokenpacker_tpu.ops.quantize import quantize_tree, quantize_tree_4bit

    cfg = mpt_config(d_model=64, n_heads=4, n_layers=2, vocab_size=128, expansion_ratio=2)
    params = init_mpt(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 6)))
    emb = mpt_embed(params, ids)
    pos = jnp.broadcast_to(jnp.arange(6), (2, 6))
    bias = make_attention_bias(pos, jnp.ones((2, 6), bool), 0, 6)
    ref, _ = mpt_apply(params, cfg, emb, bias, use_flash=False)

    for quant in (lambda p: quantize_tree(p, min_size=1024),
                  lambda p: quantize_tree_4bit(p, min_size=1024)):
        qp = quant(params)
        got, _ = mpt_apply(qp, cfg, mpt_embed(qp, ids), bias, use_flash=False)
        # quantization error is bounded, not exact
        err = float(jnp.mean(jnp.abs(got - ref)) / (jnp.mean(jnp.abs(ref)) + 1e-9))
        assert err < 0.2, err
        # decode with cache works too
        cache = KVCache.create(cfg, 2, 8, jnp.float32)
        bias1 = make_attention_bias(pos[:, :1] * 0 + 6, jnp.ones((2, 8), bool), 0, 8)
        h, _ = mpt_apply(qp, cfg, mpt_embed(qp, ids[:, :1]), bias1, cache)
        assert np.isfinite(np.asarray(h)).all()


def test_s8_matmul_exact():
    """The w8a8 Pallas kernel's s32 accumulation is bit-exact vs integer
    matmul (interpret mode on CPU), across the production K/N shapes."""
    from tokenpacker_tpu.ops.q8_matmul import s8_matmul

    rng = np.random.default_rng(0)
    for m, k, n in [(8, 256, 128), (8, 512, 384), (16, 1024, 256)]:
        xq = rng.integers(-127, 128, (m, k)).astype(np.int8)
        wq = rng.integers(-127, 128, (k, n)).astype(np.int8)
        got = np.asarray(s8_matmul(jnp.asarray(xq), jnp.asarray(wq), interpret=True))
        ref = xq.astype(np.int64) @ wq.astype(np.int64)
        np.testing.assert_array_equal(got, ref.astype(np.int32))


def test_w8a8_matmul_matches_reference_and_bounds_error():
    from tokenpacker_tpu.ops.q8_matmul import quantize_activations, w8a8_matmul

    rng = np.random.default_rng(1)
    k, n = 512, 384
    x = jnp.asarray(rng.standard_normal((3, k)), jnp.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    q, scale = quantize_int8(jnp.asarray(w))
    qleaf = {"q": q, "scale": scale}
    got = np.asarray(w8a8_matmul(x, qleaf, interpret=True))

    # exact reference of the same scheme
    xq, ax = quantize_activations(x)
    acc = np.asarray(xq, np.int64)[:3] @ np.asarray(qleaf["q"], np.int64)
    ref = acc.astype(np.float32) * np.asarray(ax)[:3] * np.asarray(
        jnp.squeeze(qleaf["scale"], -2)
    )[None]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # the scheme's error vs the float product is small (activation quant
    # adds ~0.5% on top of weight quant)
    full = np.asarray(x) @ w
    err = np.abs(got - full).mean() / (np.abs(full).mean() + 1e-9)
    assert err < 0.05, err
