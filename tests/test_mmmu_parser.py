"""MMMU answer-parser fidelity: oracle test vs the reference module.

VERDICT r2 item 2: `eval/mmmu.py`'s open-response parsing was a simplified
port; the reference pipeline (normalize_str with decimal rounding,
check_is_number, extract_numbers' three regexes, get_key_subresponses'
indicator-phrase extraction) produces different open-question scores on real
outputs. These tests load the actual reference module
(/root/reference/llava/eval/mmmu/eval/utils/eval_utils.py) standalone and
require byte-equal parses and identical accept/reject decisions on a corpus
of synthetic responses covering every branch.
"""

import importlib.util
import os
import random

import pytest

from tokenpacker_tpu.eval import mmmu

REF_EVAL_UTILS = "/root/reference/llava/eval/mmmu/eval/utils/eval_utils.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_EVAL_UTILS), reason="reference repo not available"
)


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("ref_mmmu_eval_utils", REF_EVAL_UTILS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# -- corpora ------------------------------------------------------------------

MC_CHOICES = ["A", "B", "C", "D"]
MC_INDEX2ANS = {
    "A": "Paris",
    "B": "the mitochondria",
    "C": "7.5",
    "D": "none of the above",
}

MC_RESPONSES = [
    "A",
    "B.",
    " C ",
    "(D)",
    "The answer is (B).",
    "The answer is B.",
    "I think the correct option is (A) but (C) is tempting.",
    "Either A or C — hard to say.",
    "It must be the mitochondria, clearly.",
    "paris is the capital of france, so that is my answer here",
    "The value works out to 7.5 after rounding everything carefully.",
    "none of the above",
    "E",  # not a choice → fallback branch
    "no letters at all here",  # short → random fallback
    "this response has more than five words but matches nothing relevant",
    "(A) (B) (C) (D)",  # all bracketed → rfind ordering
    "A B C D",  # all bare → rfind ordering
    "A or D? I will go with D",
    "The answer: b",  # lowercase letter — reference misses it (case-sensitive)
    "the correct answer is the mitochondria, i.e. Paris",  # two content hits
    "'A'",
    "?C?",
    "  (B)  ",
    "Answer with the option's letter: (C).",
    "",
]

OPEN_RESPONSES = [
    "42",
    "The answer is 42.",
    "The answer is 42",
    "So the result is 3.14159, approximately.",
    "x = 1,234,567",
    "It could be 5 or so 6",
    "The total comes to -17.5 dollars.",
    "2e-3",
    "The value is 2e-3 exactly",
    "Therefore the final answer is Paris.",
    "paris",
    "p",
    "Thus, y = mx + b",
    "First line\nSecond line has the answer 7\nThird line",
    "The ratio is 0.50. Thus it is one half.",
    "answer = .75",
    "No indicators here at all",
    "is ",
    "could be could be is",
    "A velocity of 3 m/s means 3 meters per second.",
    "100,000",
    "1,23",  # malformed comma group
    "The answer is 1,000 and also 1000",
    "So   ",
    "final answer: 8%",
    "= 9",
    "It is 7. It is 8.",
    "THE ANSWER IS YES",
    "yes.",
    "Thus the answer could be A, so the result is B",
    "",
    "   ",
    "...",
]

GOLDS_OPEN = [
    "42",
    ["42", "forty-two"],
    "3.14",
    "1234567",
    "5",
    "-17.5",
    "0.002",
    "paris",
    ["p"],
    "7",
    "0.5",
    ".75",
    "yes",
    "8",
    "1,000",
    "one half",
]


def test_multi_choice_parse_matches_reference(ref):
    # identical RNG sequence for the no-candidate fallback: the reference
    # seeds the global `random` at import (seed 42); reseed both sides
    random.seed(42)
    mmmu._fallback_rng.seed(42)
    for resp in MC_RESPONSES:
        got = mmmu.parse_multi_choice_response(resp, MC_CHOICES, MC_INDEX2ANS)
        exp = ref.parse_multi_choice_response(resp, MC_CHOICES, MC_INDEX2ANS)
        assert got == exp, (resp, got, exp)


def test_multi_choice_two_option_sets(ref):
    random.seed(42)
    mmmu._fallback_rng.seed(42)
    choices = ["A", "B"]
    index2ans = {"A": "true", "B": "false"}
    for resp in ["true", "B", "(A) no (B)", "neither honestly speaking my friend"]:
        got = mmmu.parse_multi_choice_response(resp, choices, index2ans)
        exp = ref.parse_multi_choice_response(resp, choices, index2ans)
        assert got == exp, (resp, got, exp)


def test_open_parse_matches_reference(ref):
    for resp in OPEN_RESPONSES:
        got = mmmu.parse_open_response(resp)
        exp = ref.parse_open_response(resp)
        assert sorted(got, key=repr) == sorted(exp, key=repr), (resp, got, exp)


def test_normalize_and_helpers_match_reference(ref):
    cases = ["42", " 42 ", "1,000", "3.14159", "abc", "A", "", "  x  ",
             "-5", "nan-ish", "1e3", "1,23", "0.126", "0.125"]
    for s in cases:
        assert mmmu.check_is_number(s) == ref.check_is_number(s), s
        assert mmmu.normalize_str(s) == ref.normalize_str(s), s
    for s in OPEN_RESPONSES:
        assert mmmu.extract_numbers(s) == ref.extract_numbers(s), s


def test_eval_open_matches_reference(ref):
    for resp in OPEN_RESPONSES:
        pred = ref.parse_open_response(resp)
        for gold in GOLDS_OPEN:
            got = mmmu.eval_open(gold, pred)
            exp = ref.eval_open(gold, pred)
            assert got == exp, (resp, gold, got, exp)


def test_eval_multi_choice_matches_reference(ref):
    for gold in ["A", "B", ["A", "C"], ["D"]]:
        for pred in MC_CHOICES + ["E"]:
            assert mmmu.eval_multi_choice(gold, pred) == ref.eval_multi_choice(gold, pred)


def test_evaluate_scores_match_reference(ref):
    """End-to-end: identical per-sample judgments and accuracy over a mixed
    corpus scored through the reference `evaluate` vs our eval_answer."""
    samples = []
    for i, resp in enumerate(OPEN_RESPONSES):
        samples.append({
            "id": f"val_Math_{i}",
            "question_type": "open",
            "answer": GOLDS_OPEN[i % len(GOLDS_OPEN)],
            "parsed_pred": ref.parse_open_response(resp),
        })
    random.seed(42)
    for i, resp in enumerate(MC_RESPONSES):
        samples.append({
            "id": f"val_Art_{i}",
            "question_type": "multiple-choice",
            "answer": MC_CHOICES[i % 4],
            "parsed_pred": ref.parse_multi_choice_response(resp, MC_CHOICES, MC_INDEX2ANS),
        })
    judge, overall = ref.evaluate(samples)
    for s in samples:
        ours = mmmu.eval_answer(
            s["question_type"] if s["question_type"] == "multiple-choice" else "open",
            s["answer"],
            s["parsed_pred"] if s["question_type"] == "multiple-choice" else s["parsed_pred"],
        ) if s["question_type"] == "multiple-choice" else mmmu.eval_open(
            s["answer"], s["parsed_pred"]
        )
        assert ours == (judge[s["id"]] == "Correct"), s["id"]


def test_convert_to_test(tmp_path):
    """The val→test submission reformatter: {id: parsed_pred}, list preds
    collapse to str(first) (reference convert_to_test.py:18-25)."""
    import json

    from tokenpacker_tpu.eval import mmmu

    rf = tmp_path / "val.jsonl"
    rows = [
        {"id": "validation_Art_1", "parsed_pred": "B"},
        {"id": "validation_Math_2", "parsed_pred": ["3.14", "pi"]},
        {"id": "validation_Bio_3", "parsed_pred": [7]},
    ]
    rf.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = tmp_path / "sub.json"
    mmmu.main(["convert-to-test", "--result-file", str(rf),
               "--output-path", str(out)])
    got = json.loads(out.read_text())
    assert got == {
        "validation_Art_1": "B",
        "validation_Math_2": "3.14",
        "validation_Bio_3": "7",
    }
