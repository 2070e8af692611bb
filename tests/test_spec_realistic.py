"""Host-side speculative-economics simulation (scripts/bench_spec_realistic):
the acceptance replay must mirror the deployed streaming policy
(propose_ngram_host drafts, accepted+bonus emission, zero-streak backoff)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from bench_spec_realistic import load_workloads, simulate, tokenize_words


def test_quote_stream_accepts_long_runs():
    """A continuation that copies a span of the prompt must be consumed in
    k-sized accepted bursts (prompt-lookup's motivating case)."""
    prompt = list(range(100, 160))
    stream = prompt + prompt[10:40]  # answer quotes a 30-token span
    r = simulate(stream, len(prompt), k=4)
    assert r["produced"] == 30
    # after the 2-gram locks on, rounds accept 4 drafts + 1 bonus each
    assert r["accept_per_verify"] > 2.5
    assert r["n_verify"] + r["n_plain"] < 30 / 2


def test_novel_stream_backs_off():
    """All-novel tokens: no 2-gram recurrence → every step is plain (no
    verify round ever fires), so the policy costs nothing."""
    stream = list(range(1000, 1300))
    r = simulate(stream, 60, k=4)
    assert r["produced"] == 240
    assert r["n_verify"] == 0
    assert r["n_plain"] == 240


def test_repetitive_but_wrong_drafts_trigger_backoff():
    """A prompt full of one repeated bigram proposes drafts constantly; a
    continuation that never matches must trip the 4-miss backoff into
    plain decoding instead of paying a verify round every token."""
    prompt = [5, 6] * 30
    stream = prompt + list(range(2000, 2100))
    r = simulate(stream, len(prompt), k=4)
    assert r["produced"] == 100
    assert r["accepted_drafts"] == 0
    # without backoff this would be ~100 verify rounds; the 16-round plain
    # budget caps it far below
    assert r["n_verify"] <= 12


def test_workloads_shapes():
    w = load_workloads()
    assert set(w) == {"prose", "code", "doc_quote", "short_answer"}
    for name, samples in w.items():
        for stream, plen in samples:
            assert 0 < plen < len(stream)


def test_tokenizer_stability():
    t1 = tokenize_words("the cat sat. the cat sat.")
    assert t1[: len(t1) // 2] == t1[len(t1) // 2 :]
