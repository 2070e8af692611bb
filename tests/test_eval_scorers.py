"""Scorer unit tests (POPE, VQA soft-acc, ANLS, OCRBench, MME, GQA)."""

from tokenpacker_tpu.eval.scorers import (
    anls,
    evalai_process_answer,
    gqa_accuracy,
    mme_scores,
    ocrbench_aggregate,
    ocrbench_score,
    pope_normalize,
    pope_scores,
    vqa_accuracy,
)


def test_evalai_normalization():
    assert evalai_process_answer("The Cat.") == "cat"
    assert evalai_process_answer("two") == "2"
    assert evalai_process_answer("isnt") == "isn't"
    assert evalai_process_answer("A dog!") == "dog"


def test_vqa_soft_accuracy():
    gts = ["cat"] * 10
    assert vqa_accuracy("cat", gts) == 1.0
    assert vqa_accuracy("dog", gts) == 0.0
    # 3 of 10 say dog → leave-one-out soft score
    gts = ["dog"] * 3 + ["cat"] * 7
    acc = vqa_accuracy("dog", gts)
    assert 0.0 < acc < 1.0


def test_anls():
    assert anls("hello", ["hello"]) == 1.0
    assert anls("helo", ["hello"]) > 0.5
    assert anls("xyz", ["hello"]) == 0.0
    assert anls("", [""]) == 1.0


def test_pope():
    assert pope_normalize("Yes, it is.") == "yes"
    assert pope_normalize("No.") == "no"
    assert pope_normalize("It is not present") == "no"
    answers = [
        {"question_id": 1, "text": "Yes"},
        {"question_id": 2, "text": "No"},
        {"question_id": 3, "text": "yes there is"},
        {"question_id": 4, "text": "no"},
    ]
    labels = [
        {"question_id": 1, "label": "yes"},
        {"question_id": 2, "label": "no"},
        {"question_id": 3, "label": "no"},
        {"question_id": 4, "label": "yes"},
    ]
    s = pope_scores(answers, labels)
    assert s["accuracy"] == 0.5
    assert s["yes_ratio"] == 0.5
    assert 0 <= s["f1"] <= 1


def test_ocrbench():
    assert ocrbench_score("the answer is PARIS", ["paris"]) == 1
    assert ocrbench_score("london", ["paris"]) == 0
    agg = ocrbench_aggregate(
        [{"type": "ocr", "score": 1}, {"type": "ocr", "score": 0}, {"type": "kie", "score": 1}]
    )
    assert agg["ocr"] == 1 and agg["kie"] == 1 and agg["total"] == 2


def test_mme():
    records = [
        {"category": "color", "image_id": "a", "gt": "yes", "pred_text": "Yes"},
        {"category": "color", "image_id": "a", "gt": "no", "pred_text": "No"},
        {"category": "color", "image_id": "b", "gt": "yes", "pred_text": "No"},
        {"category": "color", "image_id": "b", "gt": "no", "pred_text": "No"},
    ]
    s = mme_scores(records)
    # acc = 3/4, acc+ = 1/2 → 75 + 50 = 125
    assert abs(s["color"] - 125.0) < 1e-6


def test_gqa():
    answers = [{"question_id": "q1", "text": "Cat"}, {"question_id": "q2", "text": "blue"}]
    labels = {"q1": "cat", "q2": "red"}
    assert gqa_accuracy(answers, labels) == 0.5
