"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.models.vlm import init_vlm
from tokenpacker_tpu.parallel.mesh import make_mesh
from tokenpacker_tpu.parallel.sharding import shard_params, vlm_param_shardings


def test_mesh_shapes():
    mesh = make_mesh(tp=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(tp=1)
    assert dict(mesh.shape) == {"data": 8, "model": 1}


def test_param_sharding_rules():
    mesh = make_mesh(tp=2)
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    shardings = vlm_param_shardings(params, mesh)

    # column-parallel q: [L, D, D] → (None, data, model)
    assert shardings["lm"]["layers"]["attn"]["q"]["kernel"].spec == P(None, "data", "model")
    # row-parallel o: (None, model, data)
    assert shardings["lm"]["layers"]["attn"]["o"]["kernel"].spec == P(None, "model", "data")
    # mlp down row-parallel
    assert shardings["lm"]["layers"]["mlp"]["down"]["kernel"].spec == P(None, "model", "data")
    # embed: vocab over data, features over model
    assert shardings["lm"]["embed"].spec == P("data", "model")
    # norms replicated
    assert shardings["lm"]["norm"]["scale"].spec == P()


def test_sharded_forward_matches_single_device():
    """Same logits with and without the mesh."""
    from tokenpacker_tpu.models.llama import make_attention_bias, llama_apply, llama_logits, embed_tokens

    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 200, (4, 12)))

    def forward(p, ids):
        n, t = ids.shape
        emb = embed_tokens(p["lm"], ids)
        pos = jnp.broadcast_to(jnp.arange(t), (n, t))
        bias = make_attention_bias(pos, jnp.ones((n, t), bool), 0, t)
        h, _ = llama_apply(p["lm"], cfg.lm, emb, pos, bias)
        return llama_logits(p["lm"], h)

    ref = np.asarray(jax.jit(forward)(params, ids))

    mesh = make_mesh(tp=2)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        got = np.asarray(jax.jit(forward)(sharded, ids))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_per_crop_vision_dp():
    """HD per-crop ViT data parallelism (SURVEY §2.7 'first-class'): crops
    sharded over the data axis produce identical projector outputs."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tokenpacker_tpu.models.vlm import encode_images

    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    crops = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (8, cfg.vision.image_size, cfg.vision.image_size, 3)
        ),
        jnp.float32,
    )
    ref = np.asarray(jax.jit(lambda p, x: encode_images(p, cfg, x))(params, crops))

    mesh = make_mesh(tp=1)  # 8-way data parallel
    with jax.set_mesh(mesh):
        sharded_params = shard_params(params, mesh)
        sharded_crops = jax.device_put(crops, NamedSharding(mesh, P("data")))
        got = np.asarray(
            jax.jit(lambda p, x: encode_images(p, cfg, x))(sharded_params, sharded_crops)
        )
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    g.dryrun_multichip(4)


def test_13b_geometry_tp4_matches_single_device():
    """13B-shaped TP: hidden-5120-class ratios (non-power-of-two per-shard
    head counts: 20 heads / tp4 = 5) produce identical logits on a
    ('data','model')=(2,4) mesh vs single device (VERDICT r1 item 9)."""
    from tokenpacker_tpu.config import LMConfig, tiny_vlm_config
    from tokenpacker_tpu.models.llama import embed_tokens, llama_apply, llama_logits, make_attention_bias

    lm = LMConfig(
        vocab_size=256, hidden_size=160, intermediate_size=432,
        num_hidden_layers=2, num_attention_heads=20, num_key_value_heads=20,
    )
    cfg = tiny_vlm_config(lm=lm)
    params = init_vlm(jax.random.PRNGKey(2), cfg)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, (4, 10)))

    def forward(p, ids):
        n, t = ids.shape
        emb = embed_tokens(p["lm"], ids)
        pos = jnp.broadcast_to(jnp.arange(t), (n, t))
        bias = make_attention_bias(pos, jnp.ones((n, t), bool), 0, t)
        h, _ = llama_apply(p["lm"], cfg.lm, emb, pos, bias)
        return llama_logits(p["lm"], h)

    ref = np.asarray(jax.jit(forward)(params, ids))
    for tp in (2, 4):
        mesh = make_mesh(tp=tp)
        with jax.set_mesh(mesh):
            sharded = shard_params(params, mesh)
            got = np.asarray(jax.jit(forward)(sharded, ids))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_parallel_presets():
    from tokenpacker_tpu.parallel.sharding import PARALLEL_PRESETS, recommended_mesh

    mesh = recommended_mesh("13b-bf16", n_devices=8)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = recommended_mesh("13b-int4", n_devices=8)
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    assert "13b-hd-bf16" in PARALLEL_PRESETS


def test_mpt_params_are_sharded_and_forward_matches():
    """MPT family: FSDP/TP NamedShardings actually apply (wte/wqkv/ffn names
    were falling through to full replication) and the sharded forward equals
    single-device."""
    from tests.test_vlm_mpt import mpt_tiny_cfg
    from tokenpacker_tpu.models.mpt import mpt_apply, mpt_embed, mpt_logits
    from tokenpacker_tpu.models.llama import make_attention_bias

    cfg = mpt_tiny_cfg()
    params = init_vlm(jax.random.PRNGKey(3), cfg)
    mesh = make_mesh(tp=2)
    sh = vlm_param_shardings(params, mesh)
    assert sh["lm"]["wte"].spec == P("data", "model")
    assert sh["lm"]["layers"]["attn"]["wqkv"]["kernel"].spec == P(None, "data", "model")
    assert sh["lm"]["layers"]["ffn"]["down"]["kernel"].spec == P(None, "model", "data")

    ids = jnp.asarray(np.random.default_rng(3).integers(0, 200, (4, 10)))

    def fwd(p, ids):
        n, t = ids.shape
        emb = mpt_embed(p["lm"], ids)
        pos = jnp.broadcast_to(jnp.arange(t), (n, t))
        bias = make_attention_bias(pos, jnp.ones((n, t), bool), 0, t)
        h, _ = mpt_apply(p["lm"], cfg.lm, emb, bias, use_flash=False)
        return mpt_logits(p["lm"], h)

    ref = np.asarray(jax.jit(fwd)(params, ids))
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        got = np.asarray(jax.jit(fwd)(sharded, ids))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_int8_quantized_params_get_tp_shardings():
    """Quantized kernels nest {'q','scale'} below 'kernel'; the int8 payload
    must shard like the dense kernel (13b-int8 preset is tp=2 — without this
    the big tensors silently replicate) while scales replicate."""
    from tokenpacker_tpu.config import tiny_vlm_config
    from tokenpacker_tpu.models.vlm import init_vlm
    from tokenpacker_tpu.ops.quantize import fuse_llama_layers, quantize_tree
    from tokenpacker_tpu.parallel.mesh import make_mesh
    from tokenpacker_tpu.parallel.sharding import vlm_param_shardings

    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    params = dict(params)
    params["lm"] = quantize_tree(fuse_llama_layers(params["lm"]), min_size=1)
    mesh = make_mesh(dp=4, tp=2)
    sh = vlm_param_shardings(params, mesh)
    layers = sh["lm"]["layers"]
    assert layers["attn"]["qkv"]["kernel"]["q"].spec == P(None, "data", "model")
    assert layers["attn"]["qkv"]["kernel"]["scale"].spec == P()
    assert layers["attn"]["o"]["kernel"]["q"].spec == P(None, "model", "data")
    assert layers["mlp"]["gateup"]["kernel"]["q"].spec == P(None, "data", "model")
    assert layers["mlp"]["down"]["kernel"]["q"].spec == P(None, "model", "data")
    assert layers["mlp"]["down"]["kernel"]["scale"].spec == P()
