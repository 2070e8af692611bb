"""Preprocessor label-masking tests with a real-ish fake tokenizer.

Oracle strategy: the v1 masking algorithm depends only on tokenizer lengths;
we use a deterministic word-level fake tokenizer and verify that exactly the
assistant responses (+ trailing sep) stay unmasked.
"""

import numpy as np

from tokenpacker_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from tokenpacker_tpu.data.preprocess import (
    preprocess,
    preprocess_multimodal,
    preprocess_plain,
    preprocess_v1,
)


import re


class WordTok:
    """Word-level tokenizer: BOS + one id per token. '</s>' and ':' split as
    separate tokens (like sentencepiece) so the v1 round-length arithmetic
    holds."""

    bos_token_id = 1
    pad_token_id = 0
    model_max_length = 2048
    _pat = re.compile(r"</s>|:|<|[^\s:<]+")

    def __init__(self):
        self.vocab = {}

    def _id(self, w):
        if w not in self.vocab:
            self.vocab[w] = 10 + len(self.vocab)
        return self.vocab[w]

    def __call__(self, text):
        class R:
            pass

        r = R()
        r.input_ids = [self.bos_token_id] + [self._id(w) for w in self._pat.findall(text)]
        return r


def test_preprocess_plain():
    tok = WordTok()
    sources = [
        [
            {"from": "human", "value": "<image>\nDescribe."},
            {"from": "gpt", "value": "a red cat"},
        ]
    ]
    out = preprocess_plain(sources, tok)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert IMAGE_TOKEN_INDEX in ids
    # masked: BOS + image token; unmasked: caption + sep
    n_masked = int((labels == IGNORE_INDEX).sum())
    assert n_masked == 2  # [bos, -200]
    assert (labels[n_masked:] != IGNORE_INDEX).all()


def test_preprocess_v1_masks_instruction():
    tok = WordTok()
    sources = [
        [
            {"from": "human", "value": "<image>\nwhat is this"},
            {"from": "gpt", "value": "a cat"},
            {"from": "human", "value": "what color"},
            {"from": "gpt", "value": "red"},
        ]
    ]
    sources = preprocess_multimodal(sources, version="v1")
    out = preprocess_v1(sources, tok, has_image=True)
    ids, labels = out["input_ids"][0], out["labels"][0]
    # the assistant answers ("a cat", "red") and closing </s> words unmasked
    unmasked = [int(i) for i, l in zip(ids, labels) if l != IGNORE_INDEX]
    a_cat = [tok._id("a"), tok._id("cat")]
    red = [tok._id("red")]
    for t in a_cat + red:
        assert t in unmasked
    # instruction words masked
    masked = [int(i) for i, l in zip(ids, labels) if l == IGNORE_INDEX]
    assert tok._id("what") in masked


def test_preprocess_dispatch():
    tok = WordTok()
    src = [
        [
            {"from": "human", "value": "<image>\nhi"},
            {"from": "gpt", "value": "hello there"},
        ]
    ]
    for version in ("plain", "v1"):
        out = preprocess([([dict(d) for d in src[0]])], tok, has_image=True, version=version)
        assert len(out["input_ids"]) == 1
        assert (np.asarray(out["labels"][0]) != IGNORE_INDEX).any()


def test_mismatch_masks_everything(caplog):
    """If round-length arithmetic disagrees with the real length, the whole
    target is IGNOREd (reference train.py:399-405)."""

    class BadTok(WordTok):
        def __call__(self, text):
            r = super().__call__(text)
            if "ASSISTANT" in text and ":" not in text.split()[-1]:
                r.input_ids = r.input_ids + [99]  # inconsistent length
            return r

    tok = WordTok()
    sources = [
        [
            {"from": "human", "value": "q"},
            {"from": "gpt", "value": "a"},
        ]
    ]
    out = preprocess_v1(sources, tok, has_image=False)
    # with the consistent tokenizer, not everything is masked
    assert (np.asarray(out["labels"][0]) != IGNORE_INDEX).any()
