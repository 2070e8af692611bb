"""TokenPacker-HD image tiler.

Reimplements the reference's HD pipeline (grid selection:
llava/patch_divide.py:71-105; slicing: llava/train/train.py:695-731, also
duplicated in 6 eval/CLI call sites) in pure numpy:

1. `choose_grid(h, w, patch_num)`: pick (h_block, w_block) from the explicit
   candidate list maximizing resolution-coverage score + 0.1 * IoU against the
   1.4x-scaled image box.
2. `slice_image(img)`: aspect-preserving bilinear resize into a zero-padded
   (336*h_block, 336*w_block) canvas, cut row-major into 336x336 crops, and
   (if >1 crop) append a downscaled 336x336 global view.

Bilinear resize uses the same dense-matrix formulation as the projector's
query downsample (ops/layers.bilinear_resize_matrix), which reproduces torch
`F.interpolate(mode='bilinear', align_corners=False)` exactly.
"""

from __future__ import annotations

import numpy as np

from tokenpacker_tpu.ops.layers import bilinear_resize_matrix

BLOCK_SIZE = 336

# Candidate (h_block, w_block) grids per patch budget (patch_divide.py:4-54).
GRIDS_9 = [
    (1, 1),
    (1, 2), (2, 1),
    (1, 3), (3, 1),
    (2, 2), (1, 4), (4, 1),
    (1, 5), (5, 1),
    (1, 6), (6, 1), (2, 3), (3, 2),
    (1, 7), (7, 1),
    (4, 2), (2, 4), (1, 8), (8, 1),
    (3, 3), (1, 9), (9, 1),
]

GRIDS_16 = GRIDS_9 + [
    (2, 5), (5, 2),
    (2, 6), (6, 2), (3, 4), (4, 3),
    (2, 7), (7, 2),
    (3, 5), (5, 3),
    (2, 8), (8, 2), (4, 4),
]

GRIDS_25 = GRIDS_16 + [
    (3, 6), (6, 3), (2, 9), (9, 2),
    (4, 5), (5, 4), (2, 10), (10, 2),
    (3, 7), (7, 3),
    (11, 2), (2, 11),
    (4, 6), (6, 4), (12, 2), (2, 12), (3, 8), (8, 3), (4, 6), (6, 4),
    (5, 5),
]

_GRIDS = {9: GRIDS_9, 16: GRIDS_16, 25: GRIDS_25}


def grid_candidates(patch_num: int) -> list[tuple[int, int]]:
    try:
        return _GRIDS[patch_num]
    except KeyError:
        raise NotImplementedError(f"patch_num must be in {{9,16,25}}, got {patch_num}")


def choose_grid(h: int, w: int, patch_num: int = 9, block: int = BLOCK_SIZE) -> tuple[int, int]:
    """Select (h_block, w_block) for an h x w image (patch_divide.py:96-105).

    score = round(h*r)*round(w*r)/area + 0.1*IoU(grid_box, 1.4*image_box)
    where r = min(block*hb/h, block*wb/w) and boxes share origin (0,0).
    """
    grids = np.array(grid_candidates(patch_num), dtype=np.float64)  # [M, 2]
    gh, gw = grids[:, 0] * block, grids[:, 1] * block
    areas = gh * gw

    ratio = np.minimum(gh / h, gw / w)
    score = np.round(h * ratio) * np.round(w * ratio) / areas

    # IoU of [0,0,gh,gw] vs [0,0,1.4h,1.4w]: same-origin boxes
    ih, iw = np.minimum(gh, 1.4 * h), np.minimum(gw, 1.4 * w)
    inter = ih * iw
    union = areas + (1.4 * h) * (1.4 * w) - inter
    iou = inter / (union + 1e-5)

    idx = int(np.argmax(score + iou * 0.1))
    hb, wb = grid_candidates(patch_num)[idx]
    return int(hb), int(wb)


def _resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """img: [C, H, W] float → [C, out_h, out_w], torch-interpolate semantics."""
    wh = bilinear_resize_matrix(img.shape[1], out_h)
    ww = bilinear_resize_matrix(img.shape[2], out_w)
    return np.einsum("oh,pw,chw->cop", wh, ww, img, optimize=True)


def _fit_into(h: int, w: int, canvas_h: int, canvas_w: int) -> tuple[int, int]:
    """Aspect-preserving target size filling the canvas (train.py:701-708)."""
    h_ratio = canvas_h / h
    w_ratio = canvas_w / w
    if h_ratio <= w_ratio:
        return canvas_h, min(canvas_w, round(w * h_ratio))
    return min(canvas_h, round(h * w_ratio)), canvas_w


def slice_image(
    img: np.ndarray, patch_num: int = 9, block: int = BLOCK_SIZE, use_native: bool = True
) -> tuple[np.ndarray, int, int]:
    """img: [C, H, W] float (already CLIP-normalized).

    Returns (crops [n_crops(+1), C, block, block], h_block, w_block) exactly
    as the reference slice branch (train.py:695-731): row-major crops from a
    zero-padded canvas, plus a global 336x336 view when more than one crop.

    Uses the native C++ library (native/preprocess.cpp) when built; numpy
    otherwise — both paths are tested for equality.
    """
    c, h, w = img.shape
    hb, wb = choose_grid(h, w, patch_num, block)

    if use_native:
        from tokenpacker_tpu.image import native

        if native.available():
            th, tw = _fit_into(h, w, block * hb, block * wb)
            gh, gw = _fit_into(h, w, block, block)
            crops = native.hd_slice(
                np.ascontiguousarray(img, np.float32), hb, wb, block, th, tw, gh, gw
            )
            return crops, hb, wb

    th, tw = _fit_into(h, w, block * hb, block * wb)
    canvas = np.zeros((c, block * hb, block * wb), dtype=img.dtype)
    canvas[:, :th, :tw] = _resize_bilinear(img, th, tw)

    crops = [
        canvas[:, block * i : block * (i + 1), block * j : block * (j + 1)]
        for i in range(hb)
        for j in range(wb)
    ]
    if len(crops) > 1:
        gh, gw = _fit_into(h, w, block, block)
        # reference resizes the *canvas*, not the original image (train.py:727)
        g = np.zeros((c, block, block), dtype=img.dtype)
        g[:, :gh, :gw] = _resize_bilinear(canvas, gh, gw)
        crops.append(g)
    return np.stack(crops), hb, wb


def num_visual_tokens(hb: int, wb: int, tokens_per_view: int) -> int:
    """Sequence length contributed by one HD image after slice splicing
    (llava_arch.py:140-154): per row, wb views + (wb-1) ',' + 1 '\\n'; plus
    global view + '\\n' when more than one crop."""
    n = hb * (wb * tokens_per_view + (wb - 1) + 1)
    if hb * wb > 1:
        n += tokens_per_view + 1
    return n
