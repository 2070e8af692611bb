"""TextCaps BLEU-4 scorer (m4c_evaluator.py:301-334 parity).

The reference delegates to pycocoevalcap (Java PTBTokenizer + BleuScorer);
neither is installable here, so scorers.bleu4 reimplements the BleuScorer
corpus math. These tests (a) cross-check the condensed implementation
against a literal transcription of pycocoevalcap's cook_refs/cook_test/
compute_score on random corpora, and (b) pin hand-computable values.
"""

import math
import random

import pytest

from tokenpacker_tpu.eval.scorers import _ptb_tokenize, bleu4


def _ref_bleu4(pred_list):
    """Literal transcription of pycocoevalcap bleu_scorer.py (option
    'closest', corpus score), over the same tokenizer."""
    n = 4
    small = 1e-9
    tiny = 1e-15

    def precook(s):
        counts = {}
        for k in range(1, n + 1):
            for i in range(len(s) - k + 1):
                ngram = tuple(s[i : i + k])
                counts[ngram] = counts.get(ngram, 0) + 1
        return len(s), counts

    def cook_refs(refs):
        reflen = []
        maxcounts = {}
        for ref in refs:
            rl, counts = precook(ref)
            reflen.append(rl)
            for ngram, count in counts.items():
                maxcounts[ngram] = max(maxcounts.get(ngram, 0), count)
        return reflen, maxcounts

    def cook_test(test, reflen, refmaxcounts):
        testlen, counts = precook(test)
        result = {}
        result["testlen"] = testlen
        result["reflen"] = min((abs(l - testlen), l) for l in reflen)[1]
        result["guess"] = [max(0, testlen - k + 1) for k in range(1, n + 1)]
        result["correct"] = [0] * n
        for ngram, count in counts.items():
            result["correct"][len(ngram) - 1] += min(refmaxcounts.get(ngram, 0), count)
        return result

    totalcomps = {"testlen": 0, "reflen": 0, "guess": [0] * n, "correct": [0] * n}
    for entry in pred_list:
        test = _ptb_tokenize(entry["pred_answer"])
        refs = [_ptb_tokenize(r) for r in entry["gt_answers"]]
        reflen, maxcounts = cook_refs(refs)
        comps = cook_test(test, reflen, maxcounts)
        totalcomps["testlen"] += comps["testlen"]
        totalcomps["reflen"] += comps["reflen"]
        for k in range(n):
            totalcomps["guess"][k] += comps["guess"][k]
            totalcomps["correct"][k] += comps["correct"][k]
    bleu = 1.0
    bleu_list = []
    for k in range(n):
        bleu *= float(totalcomps["correct"][k] + tiny) / (totalcomps["guess"][k] + small)
        bleu_list.append(bleu ** (1.0 / (k + 1)))
    ratio = (totalcomps["testlen"] + tiny) / (totalcomps["reflen"] + small)
    if ratio < 1:
        bleu_list = [b * math.exp(1 - 1 / ratio) for b in bleu_list]
    return bleu_list[3]


def test_perfect_match_is_one():
    preds = [
        {"pred_answer": "a man rides a red bicycle down the street",
         "gt_answers": ["a man rides a red bicycle down the street", "someone cycling"]},
        {"pred_answer": "two dogs play in the park",
         "gt_answers": ["two dogs play in the park"]},
    ]
    assert bleu4(preds) == pytest.approx(1.0, abs=1e-6)


def test_disjoint_is_zero():
    preds = [{"pred_answer": "alpha beta gamma delta epsilon",
              "gt_answers": ["one two three four five"]}]
    assert bleu4(preds) == pytest.approx(0.0, abs=1e-3)


def test_brevity_penalty_applies():
    # hypothesis is a strict prefix: precisions are 1, penalty = e^(1-r/c)
    preds = [{"pred_answer": "a man rides a bicycle",
              "gt_answers": ["a man rides a bicycle down the long street"]}]
    got = bleu4(preds)
    assert got == pytest.approx(math.exp(1 - 9 / 5), rel=1e-6)


def test_ptb_tokenizer_drops_punctuation_and_lowercases():
    assert _ptb_tokenize("A man, riding; a Bike.") == ["a", "man", "riding", "a", "bike"]
    assert _ptb_tokenize("It's 3.5%!") == ["it's", "3", "5", "%"]


def test_matches_pycocoevalcap_transcription_on_random_corpora():
    rng = random.Random(7)
    vocab = ["a", "man", "dog", "rides", "red", "park", "the", "street",
             "plays", "in", "with", "ball", "bicycle", "down", "two"]
    for trial in range(20):
        preds = []
        for _ in range(rng.randint(1, 6)):
            hyp = " ".join(rng.choices(vocab, k=rng.randint(1, 12)))
            refs = [" ".join(rng.choices(vocab, k=rng.randint(1, 12)))
                    for _ in range(rng.randint(1, 5))]
            preds.append({"pred_answer": hyp, "gt_answers": refs})
        assert bleu4(preds) == pytest.approx(_ref_bleu4(preds), rel=1e-9), preds
