"""Splice-plan tests: layout parity with the reference interleave
(llava_arch.py:115-154) and device-side assembly correctness."""

import numpy as np

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from tokenpacker_tpu.image.hd_tiler import num_visual_tokens
from tokenpacker_tpu.models.llama import embed_tokens
from tokenpacker_tpu.models.splice import assemble_embeds, build_splice_plan
from tokenpacker_tpu.models.vlm import init_vlm

SEP, RET, PAD = 7, 8, 0
TPV = 4  # tokens per view


def test_single_mode_layout():
    ids = np.array([1, 5, 6, IMAGE_TOKEN_INDEX, 9, 10])
    labels = np.array([IGNORE_INDEX, IGNORE_INDEX, 6, IGNORE_INDEX, 9, 10])
    plan = build_splice_plan(
        [ids], [[(1, 1)]], TPV, "single", SEP, RET, PAD, labels=[labels]
    )
    assert plan.lengths[0] == 5 + TPV
    # layout: 1 5 6 [v v v v] 9 10
    assert plan.is_image[0].tolist() == [False] * 3 + [True] * TPV + [False] * 2
    assert plan.image_slot[0, 3:7].tolist() == [0, 1, 2, 3]
    assert plan.token_ids[0, :3].tolist() == [1, 5, 6]
    assert plan.token_ids[0, 7:9].tolist() == [9, 10]
    assert plan.labels[0, 3:7].tolist() == [IGNORE_INDEX] * 4
    assert plan.labels[0, 7:9].tolist() == [9, 10]


def test_slice_mode_layout_2x2():
    """2x2 grid: crops row-major with ',' between cols, '\\n' per row, then
    global view + '\\n' (reference llava_arch.py:140-154)."""
    ids = np.array([1, IMAGE_TOKEN_INDEX, 42])
    plan = build_splice_plan([ids], [[(2, 2)]], TPV, "slice", SEP, RET, PAD)
    expected_visual = num_visual_tokens(2, 2, TPV)
    assert plan.lengths[0] == 2 + expected_visual
    row = plan.token_ids[0]
    img = plan.is_image[0]
    # positions: [1] then visual block then [42]
    assert row[0] == 1
    # first view tokens
    p = 1
    for j in range(2):  # row 0: view, sep/ret
        assert img[p : p + TPV].all()
        assert plan.image_slot[0, p] == j * TPV  # crop j
        p += TPV
        if j < 1:
            assert row[p] == SEP and not img[p]
            p += 1
    assert row[p] == RET and not img[p]
    p += 1
    for j in range(2):  # row 1: crops 2,3
        assert img[p : p + TPV].all()
        assert plan.image_slot[0, p] == (2 + j) * TPV
        p += TPV
        if j < 1:
            assert row[p] == SEP
            p += 1
    assert row[p] == RET
    p += 1
    # global view (crop 4) + RET
    assert img[p : p + TPV].all()
    assert plan.image_slot[0, p] == 4 * TPV
    p += TPV
    assert row[p] == RET
    p += 1
    assert row[p] == 42 and not img[p]


def test_multi_sample_crop_base_accounting():
    """Second sample's slots start after the first sample's crops."""
    ids = np.array([1, IMAGE_TOKEN_INDEX, 2])
    plan = build_splice_plan(
        [ids, ids], [[(1, 2)], [(1, 1)]], TPV, "slice", SEP, RET, PAD
    )
    # sample 0 uses crops 0,1 + global 2 => 3 crops; sample 1 starts at crop 3
    s1_first_img = np.where(plan.is_image[1])[0][0]
    assert plan.image_slot[1, s1_first_img] == 3 * TPV


def test_assemble_embeds_gather():
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    ids = np.array([1, 5, IMAGE_TOKEN_INDEX, 9])
    tpv = cfg.tokens_per_view
    plan = build_splice_plan([ids], [[(1, 1)]], tpv, "single", SEP, RET, PAD)
    visual = jnp.arange(1 * tpv * cfg.lm.hidden_size, dtype=jnp.float32).reshape(
        1, tpv, cfg.lm.hidden_size
    )
    emb = assemble_embeds(
        params["lm"],
        visual,
        jnp.asarray(plan.token_ids),
        jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot),
    )
    text_emb = embed_tokens(params["lm"], jnp.asarray(plan.token_ids))
    np.testing.assert_allclose(np.asarray(emb[0, :2]), np.asarray(text_emb[0, :2]))
    np.testing.assert_allclose(np.asarray(emb[0, 2 : 2 + tpv]), np.asarray(visual[0]))
    np.testing.assert_allclose(np.asarray(emb[0, 2 + tpv]), np.asarray(text_emb[0, 2 + tpv]))


def test_multi_image_single_prompt():
    """Two <image> holes in one prompt: slots assigned in reading order."""
    ids = np.array([1, 5, IMAGE_TOKEN_INDEX, 9, IMAGE_TOKEN_INDEX, 11])
    plan = build_splice_plan([ids], [[(1, 1), (1, 1)]], TPV, "single", SEP, RET, PAD)
    assert plan.lengths[0] == 4 + 2 * TPV
    img_positions = np.where(plan.is_image[0])[0]
    assert len(img_positions) == 2 * TPV
    # first image occupies slots [0, TPV), second [TPV, 2*TPV)
    assert plan.image_slot[0, img_positions[0]] == 0
    assert plan.image_slot[0, img_positions[TPV]] == TPV
    # text around both images preserved
    row = plan.token_ids[0]
    assert row[0] == 1 and row[1] == 5
    assert row[2 + TPV] == 9
    assert row[3 + 2 * TPV] == 11
