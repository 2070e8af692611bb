"""Byte-for-byte prompt parity: our templates vs the reference's
conversation module (imported directly from /root/reference as the oracle).
"""

import importlib.util

import pytest

# load the reference module directly from its file to avoid importing the
# llava package (whose __init__ registers into transformers Auto classes)
_spec = importlib.util.spec_from_file_location(
    "ref_conversation", "/root/reference/llava/conversation.py"
)
ref_conv = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ref_conv)

from tokenpacker_tpu.data import conversation as our_conv  # noqa: E402

TEMPLATES = sorted(ref_conv.conv_templates.keys())


@pytest.mark.parametrize("name", TEMPLATES)
def test_template_registry_parity(name):
    assert name in our_conv.conv_templates


@pytest.mark.parametrize("name", TEMPLATES)
def test_rendered_prompt_parity(name):
    ref = ref_conv.conv_templates[name].copy()
    ours = our_conv.conv_templates[name].copy()
    assert ref.system == ours.system
    assert tuple(ref.roles) == tuple(ours.roles)
    assert ref.offset == ours.offset
    assert ref.sep == ours.sep and ref.sep2 == ours.sep2

    # empty / seeded prompt
    assert ref.get_prompt() == ours.get_prompt()

    # rounds with an image marker in the first user turn. PLAIN templates
    # (sep2=None) are single-round only — the reference renderer would crash
    # concatenating None on the second round (conversation.py:98).
    ref2, ours2 = ref_conv.conv_templates[name].copy(), our_conv.conv_templates[name].copy()
    single_round = ref2.sep_style == ref_conv.SeparatorStyle.PLAIN
    for conv in (ref2, ours2):
        conv.append_message(conv.roles[0], "<image>\nWhat is in this picture?")
        if single_round:
            conv.append_message(conv.roles[1], None)
        else:
            conv.append_message(conv.roles[1], "A cat.")
            conv.append_message(conv.roles[0], "What color?")
            conv.append_message(conv.roles[1], None)
    assert ref2.get_prompt() == ours2.get_prompt(), name


@pytest.mark.parametrize("name", ["v1", "mpt", "plain", "llama_2"])
def test_tuple_image_message_normalization(name):
    """First message as (text, image, mode) tuple goes through the
    '<image>\\n' + stripped-text normalization path."""
    ref = ref_conv.conv_templates[name].copy()
    ours = our_conv.conv_templates[name].copy()
    for conv in (ref, ours):
        conv.append_message(conv.roles[0], ("Describe <image> please", None, "Default"))
        conv.append_message(conv.roles[1], None)
    assert ref.get_prompt() == ours.get_prompt()


def test_default_is_vicuna_v1():
    assert our_conv.default_conversation is our_conv.conv_templates["v1"]


def test_tokenizer_image_token():
    from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX
    from tokenpacker_tpu.data.mm_tokenize import tokenizer_image_token

    class FakeTok:
        bos_token_id = 1

        def __call__(self, text):
            # 1 token per word + BOS
            class R:
                pass

            r = R()
            r.input_ids = [1] + [100 + len(w) for w in text.split()]
            return r

    tok = FakeTok()
    ids = tokenizer_image_token("hello world\n<image>\nbye", tok)
    # BOS kept once; -200 replaces <image>
    assert ids[0] == 1
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    assert ids.count(1) == 1

    ids2 = tokenizer_image_token("<image>\nhi", tok)
    assert ids2.count(IMAGE_TOKEN_INDEX) == 1
