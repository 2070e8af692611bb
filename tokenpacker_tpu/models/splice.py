"""Multimodal token splicing — TPU-native replacement for the reference's
per-sample Python loop (`llava/model/llava_arch.py:100-233`).

Strategy: sequence assembly is data-dependent (ragged crops, separators), so
the *plan* — where each text token and each visual token lands — is computed
host-side in numpy once per batch. The device then does a single masked
gather: `where(is_image, visual_flat[image_slot], embed(token_ids))`, which
is fully static-shaped and jit-friendly.

Slice-mode layout (llava_arch.py:140-154): crops row-major; ',' between
columns, '\\n' after each row; if >1 crop, the global view + '\\n' at the end.
Separators are real vocabulary tokens (',' and '\\n' ids) and are labeled
IGNORE_INDEX like the visual tokens.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from tokenpacker_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from tokenpacker_tpu.models.llama import embed_tokens


@dataclass
class SplicePlan:
    """Per-batch device-ready arrays, all [N, L] (right-padded)."""

    token_ids: np.ndarray  # int32; pad_id at visual positions & padding
    is_image: np.ndarray  # bool; True where a visual token goes
    image_slot: np.ndarray  # int32 index into [total_crops*tpv] flat visual tokens
    attn_mask: np.ndarray  # bool validity
    labels: np.ndarray | None  # int32 with IGNORE_INDEX at non-target positions
    lengths: np.ndarray  # [N] true sequence lengths


def _expand_sample(
    ids: np.ndarray,
    labels: np.ndarray | None,
    blocks: list[tuple[int, int]],
    crop_base: list[int],
    tokens_per_view: int,
    mode: str,
    sep_id: int,
    newline_id: int,
    pad_id: int,
):
    """Expand one sample's ids, returning (tok, img, slot, lab) lists."""
    tok, img, slot, lab = [], [], [], []
    img_positions = np.where(ids == IMAGE_TOKEN_INDEX)[0]
    cursor = 0
    for n_img, pos in enumerate(img_positions):
        # text before the image token
        tok.extend(ids[cursor:pos].tolist())
        img.extend([False] * (pos - cursor))
        slot.extend([0] * (pos - cursor))
        if labels is not None:
            lab.extend(labels[cursor:pos].tolist())
        # the visual block
        hb, wb = blocks[n_img]
        base = crop_base[n_img]
        crop = 0

        def add_view():
            nonlocal crop
            start = (base + crop) * tokens_per_view
            tok.extend([pad_id] * tokens_per_view)
            img.extend([True] * tokens_per_view)
            slot.extend(range(start, start + tokens_per_view))
            if labels is not None:
                lab.extend([IGNORE_INDEX] * tokens_per_view)
            crop += 1

        def add_sep(t):
            tok.append(t)
            img.append(False)
            slot.append(0)
            if labels is not None:
                lab.append(IGNORE_INDEX)

        if mode == "slice":
            for i in range(hb):
                for j in range(wb):
                    add_view()
                    if j < wb - 1:
                        add_sep(sep_id)
                add_sep(newline_id)
            if hb * wb > 1:
                add_view()  # global view
                add_sep(newline_id)
        else:
            add_view()
        cursor = pos + 1
    # trailing text
    tok.extend(ids[cursor:].tolist())
    img.extend([False] * (len(ids) - cursor))
    slot.extend([0] * (len(ids) - cursor))
    if labels is not None:
        lab.extend(labels[cursor:].tolist())
    return tok, img, slot, (lab if labels is not None else None)


def build_splice_plan(
    input_ids: list[np.ndarray],
    blocks: list[list[tuple[int, int]]],
    tokens_per_view: int,
    mode: str = "single",
    sep_id: int = 0,
    newline_id: int = 0,
    pad_id: int = 0,
    labels: list[np.ndarray] | None = None,
    pad_to: int | None = None,
) -> SplicePlan:
    """input_ids: per-sample int arrays containing IMAGE_TOKEN_INDEX holes.

    blocks: per-sample list of (h_block, w_block) per image — crops are
    assumed concatenated across the batch in sample order (the reference
    collator's `torch.cat(images, dim=0)`, train.py:800).
    """
    n = len(input_ids)
    # global crop numbering across the batch, in sample/image order
    crop_base_per_sample: list[list[int]] = []
    next_base = 0
    for bs in blocks:
        bases = []
        for hb, wb in bs:
            bases.append(next_base)
            next_base += hb * wb + (1 if hb * wb > 1 and mode == "slice" else 0)
        crop_base_per_sample.append(bases)

    rows = [
        _expand_sample(
            np.asarray(input_ids[i]),
            None if labels is None else np.asarray(labels[i]),
            blocks[i],
            crop_base_per_sample[i],
            tokens_per_view,
            mode,
            sep_id,
            newline_id,
            pad_id,
        )
        for i in range(n)
    ]
    lengths = np.array([len(r[0]) for r in rows], dtype=np.int32)
    max_len = pad_to if pad_to is not None else int(lengths.max())
    if max_len < lengths.max():
        raise ValueError(f"pad_to={pad_to} < longest spliced sequence {lengths.max()}")

    token_ids = np.full((n, max_len), pad_id, dtype=np.int32)
    is_image = np.zeros((n, max_len), dtype=bool)
    image_slot = np.zeros((n, max_len), dtype=np.int32)
    attn_mask = np.zeros((n, max_len), dtype=bool)
    out_labels = np.full((n, max_len), IGNORE_INDEX, dtype=np.int32) if labels is not None else None
    for i, (tok, img, slot, lab) in enumerate(rows):
        l = len(tok)
        token_ids[i, :l] = tok
        is_image[i, :l] = img
        image_slot[i, :l] = slot
        attn_mask[i, :l] = True
        if out_labels is not None:
            out_labels[i, :l] = lab
    return SplicePlan(token_ids, is_image, image_slot, attn_mask, out_labels, lengths)


def assemble_embeds(lm_params, visual_tokens, token_ids, is_image, image_slot, lm_cfg=None):
    """Device-side: one gather + one select.

    visual_tokens: [total_crops, tokens_per_view, D] projector output.
    Returns [N, L, D] input embeddings. lm_cfg selects the embedding table
    layout per model family (None → LLaMA).
    """
    flat = visual_tokens.reshape(-1, visual_tokens.shape[-1])
    if lm_cfg is not None and lm_cfg.model_family == "mpt":
        from tokenpacker_tpu.models.mpt import mpt_embed

        text = mpt_embed(lm_params, token_ids)
    else:
        text = embed_tokens(lm_params, token_ids)
    vis = flat[jnp.clip(image_slot, 0, flat.shape[0] - 1)]
    return jnp.where(is_image[..., None], vis.astype(text.dtype), text)
