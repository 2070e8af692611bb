"""Image pipeline tests: HD grid selection vs the reference formula (torch
oracle built from patch_divide.py spec), slice geometry, and preprocessing."""

import numpy as np
import pytest
import torch
from PIL import Image

from tokenpacker_tpu.image.hd_tiler import (
    BLOCK_SIZE,
    choose_grid,
    grid_candidates,
    num_visual_tokens,
    slice_image,
)
from tokenpacker_tpu.image.processing import (
    clip_preprocess,
    expand2square,
    process_image,
    to_tensor_normalize,
)


def torch_choose_grid(h, w, patch_num):
    """Oracle: the patch_divide.Image_Patch.calculate math in torch."""
    plist = grid_candidates(patch_num)
    boxes = torch.tensor([[0, 0, a * BLOCK_SIZE, b * BLOCK_SIZE] for a, b in plist]).float()
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    input_box = torch.tensor([[0.0, 0.0, h, w]])
    ratio = (boxes[:, 2:] / input_box[:, 2:]).min(dim=-1)[0]
    score = torch.round(h * ratio) * torch.round(w * ratio) / areas
    # IoU vs 1.4x box
    big = input_box * 1.4
    lt = torch.max(boxes[:, None, :2], big[:, :2])
    rb = torch.min(boxes[:, None, 2:], big[:, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[:, :, 0] * wh[:, :, 1]
    big_area = (big[:, 2] - big[:, 0]) * (big[:, 3] - big[:, 1])
    union = areas[:, None] + big_area - inter
    iou = (inter / (union + 1e-5))[:, 0]
    idx = int(torch.argmax(score + 0.1 * iou))
    return plist[idx]


@pytest.mark.parametrize("patch_num", [9, 16, 25])
def test_choose_grid_matches_reference_formula(patch_num):
    rng = np.random.default_rng(0)
    sizes = [(336, 336), (1088, 1088), (480, 640), (1344, 448), (100, 900), (2000, 500)]
    sizes += [tuple(rng.integers(50, 2500, 2)) for _ in range(40)]
    for h, w in sizes:
        assert choose_grid(int(h), int(w), patch_num) == torch_choose_grid(int(h), int(w), patch_num), (
            h,
            w,
            patch_num,
        )


def test_slice_image_geometry():
    img = np.random.default_rng(1).standard_normal((3, 500, 800)).astype(np.float32)
    crops, hb, wb = slice_image(img, patch_num=9)
    assert crops.shape[1:] == (3, 336, 336)
    assert crops.shape[0] == hb * wb + (1 if hb * wb > 1 else 0)
    assert (hb, wb) == choose_grid(500, 800, 9)


def test_slice_matches_torch_pipeline():
    """Canvas + crops vs the reference train.py:695-731 flow in torch."""
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    arr = rng.standard_normal((3, 400, 700)).astype(np.float32)
    crops, hb, wb = slice_image(arr, patch_num=9)

    image = torch.from_numpy(arr).unsqueeze(0)
    h, w = 400, 700
    block = 336
    h_ratio, w_ratio = block * hb / h, block * wb / w
    if h_ratio <= w_ratio:
        w_, h_ = min(block * wb, round(w * h_ratio)), block * hb
    else:
        w_, h_ = block * wb, min(block * hb, round(h * w_ratio))
    inter = F.interpolate(image, size=(h_, w_), mode="bilinear")
    canvas = torch.zeros((1, 3, block * hb, block * wb))
    canvas[:, :, :h_, :w_] = inter
    ref_crops = []
    for i in range(hb):
        for j in range(wb):
            ref_crops.append(canvas[:, :, block * i : block * (i + 1), block * j : block * (j + 1)])
    if len(ref_crops) > 1:
        h_ratio, w_ratio = block / h, block / w
        if h_ratio <= w_ratio:
            w_, h_ = min(block, round(w * h_ratio)), block
        else:
            w_, h_ = block, min(block, round(h * w_ratio))
        gi = F.interpolate(canvas, size=(h_, w_), mode="bilinear")
        gs = torch.zeros((1, 3, block, block))
        gs[:, :, :h_, :w_] = gi
        ref_crops.append(gs)
    ref = torch.cat(ref_crops, 0).numpy()
    # dense-matmul resize vs torch's 2-tap gather: same math, different fp32
    # accumulation order → ~3e-4 worst-case on N(0,1) inputs
    np.testing.assert_allclose(crops, ref, rtol=1e-3, atol=1e-3)


def test_num_visual_tokens_hd7b_headline():
    """README.md:133: TokenPacker-HD 1088x1088, patch_num 9, scale 2 → ~954
    avg tokens. For the full 3x3 grid: 9*144 + per-row separators + global."""
    n = num_visual_tokens(3, 3, 144)
    assert n == 3 * (3 * 144 + 2 + 1) + 144 + 1  # 1450 for max grid
    assert num_visual_tokens(1, 1, 144) == 144 + 1  # single crop: one '\n'


def test_expand2square_and_preprocess():
    img = Image.new("RGB", (100, 60), (200, 10, 10))
    sq = expand2square(img, (5, 5, 5))
    assert sq.size == (100, 100)
    out = clip_preprocess(img)
    assert out.shape == (3, 336, 336)
    crops, hb, wb = process_image(img, "pad")
    assert crops.shape == (1, 3, 336, 336) and (hb, wb) == (1, 1)
    t = to_tensor_normalize(img)
    assert t.shape == (3, 60, 100)
