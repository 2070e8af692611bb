"""Export→import round trip for the full VLM state dict (interchange with
the reference's HF checkpoint layout)."""

import numpy as np

import jax

from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.io.hf_export import export_vlm_state_dict
from tokenpacker_tpu.io.hf_import import import_vlm
from tokenpacker_tpu.models.vlm import init_vlm


def test_roundtrip():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    sd = export_vlm_state_dict(params, cfg)
    # key layout sanity
    assert "model.layers.0.self_attn.q_proj.weight" in sd
    assert "model.vision_tower.vision_tower.vision_model.embeddings.class_embedding" in sd
    assert "model.mm_projector.clip_attn.in_proj_weight" in sd
    back = import_vlm(sd, cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(back)}
    for path, leaf in flat_a:
        key = jax.tree_util.keystr(path)
        assert key in flat_b, key
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[key]), rtol=1e-6, atol=1e-6, err_msg=key
        )
