"""Converter + MMMU parsing tests."""

import json

from tokenpacker_tpu.eval.convert import convert_gqa, convert_mmvet, convert_vqav2
from tokenpacker_tpu.eval.mmmu import (
    eval_answer,
    parse_multi_choice_response,
    parse_open_response,
    score_answers,
)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_convert_gqa(tmp_path):
    src, dst = tmp_path / "a.jsonl", tmp_path / "b.json"
    _write_jsonl(src, [{"question_id": "q1", "text": "The Cat."}])
    convert_gqa(str(src), str(dst))
    out = json.load(open(dst))
    assert out == [{"questionId": "q1", "prediction": "the cat"}]


def test_convert_vqav2_fills_missing(tmp_path):
    src, split, dst = tmp_path / "a.jsonl", tmp_path / "s.jsonl", tmp_path / "b.json"
    _write_jsonl(src, [{"question_id": 1, "text": "Two"}])
    _write_jsonl(split, [{"question_id": 1}, {"question_id": 2}])
    convert_vqav2(str(src), str(split), str(dst))
    out = json.load(open(dst))
    assert out[0] == {"question_id": 1, "answer": "2"}
    assert out[1]["answer"] == ""


def test_convert_mmvet(tmp_path):
    src, dst = tmp_path / "a.jsonl", tmp_path / "b.json"
    _write_jsonl(src, [{"question_id": 3, "text": "hi"}])
    convert_mmvet(str(src), str(dst))
    assert json.load(open(dst)) == {"v1_3": "hi"}


def test_mmmu_mc_parsing():
    assert parse_multi_choice_response("The answer is (B)", ["A", "B", "C"], {}) == "B"
    assert parse_multi_choice_response("B", ["A", "B", "C"], {}) == "B"
    # content matching requires > 5 words (reference eval_utils.py:33)
    assert (
        parse_multi_choice_response(
            "i am quite sure it is a triangle", ["A", "B"],
            {"A": "circle", "B": "triangle"},
        )
        == "B"
    )


def test_mmmu_open_parsing_and_scoring():
    # numbers normalize to rounded floats (reference normalize_str)
    assert 42.0 in parse_open_response("The result is 42.")
    assert eval_answer("open", ["42"], "The result is 42.")
    assert eval_answer("multiple-choice", "A", "A")
    answers = {"val_Math_1": "A", "val_Math_2": "B"}
    ad = {
        "val_Math_1": {"ground_truth": "A", "question_type": "multiple-choice"},
        "val_Math_2": {"ground_truth": "C", "question_type": "multiple-choice"},
    }
    s = score_answers(answers, ad)
    assert s["Math"]["num"] == 2 and abs(s["Math"]["acc"] - 0.5) < 1e-9
    assert s["Overall"]["acc"] == 0.5
