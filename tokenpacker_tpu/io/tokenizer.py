"""Tokenizer utilities.

- `load_tokenizer`: SentencePiece/HF tokenizer with the reference's loading
  conventions (use_fast=False for LLaMA, right padding, model_max_length).
- `adapt_tokenizer_for_denoising`: adds UL2 sentinel tokens <extra_id_0..99>
  and sets a sentinel-joining helper (reference
  llava/model/language_model/mpt/adapt_tokenizer.py:6-40).
"""

from __future__ import annotations

NUM_SENTINELS = 100


def load_tokenizer(path: str, model_max_length: int = 2048, use_fast: bool = False):
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(
        path,
        model_max_length=model_max_length,
        padding_side="right",
        use_fast=use_fast,
    )
    if tok.pad_token is None and tok.unk_token is not None:
        tok.pad_token = tok.unk_token
    return tok


def adapt_tokenizer_for_denoising(tokenizer):
    """Add <extra_id_0..99> sentinels and a `sentinel_token_ids` attribute,
    mirroring the UL2 adapter the vendored MPT ships."""
    sentinels = [f"<extra_id_{i}>" for i in range(NUM_SENTINELS)]
    tokenizer.add_tokens(sentinels)
    if tokenizer.pad_token is None:
        tokenizer.add_tokens("<pad>")
        tokenizer.pad_token = "<pad>"
        assert tokenizer.pad_token_id is not None
    joined = "".join(sentinels)
    ids = tokenizer(joined, add_special_tokens=False).input_ids
    tokenizer.sentinel_token_ids = ids
    return tokenizer
