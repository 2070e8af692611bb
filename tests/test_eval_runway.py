"""Fixture dry-run of the one-command accuracy runway (scripts/eval_runway.py,
VERDICT r2 item 7): tiny checkpoint + 3-question GQA/MMBench subsets through
the real subprocess pipeline — import, greedy smoke (+ recorded-token diff),
benchmark subsets, score comparison vs an expected-scores file."""

import base64
import io
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from tests.test_eval_launchers import REPO, _images, _jsonl, ckpt_dir  # noqa: F401


def _run_runway(args, timeout=540):
    env = dict(os.environ)
    env.update({"TOKENPACKER_PLATFORM": "cpu", "JAX_PLATFORMS": "cpu"})
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "eval_runway.py"), *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )
    return r


def test_runway_full_dry_run(ckpt_dir, tmp_path):  # noqa: F811
    import pandas as pd

    out = tmp_path / "out"

    # gqa fixture (launcher layout) + labels for local scoring
    gqa = tmp_path / "gqa"
    _images(str(gqa / "images"), ["a.png", "b.png", "c.png"])
    _jsonl(
        str(gqa / "llava_gqa_testdev_balanced.jsonl"),
        [{"question_id": f"q{i}", "image": f"{c}.png", "text": f"what {i}"}
         for i, c in enumerate("abc")],
    )
    (gqa / "testdev_balanced_questions.json").write_text(
        json.dumps({f"q{i}": {"answer": "yes"} for i in range(3)})
    )

    # mmbench fixture tsv
    mmb = tmp_path / "mmbench"
    mmb.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(buf, "PNG")
        rows.append({
            "index": i, "question": f"pick one {i}", "hint": "",
            "A": "cat", "B": "dog", "C": "fox", "D": "owl", "answer": "A",
            "image": base64.b64encode(buf.getvalue()).decode(),
        })
    tsv = mmb / "mmbench_dev_20230712.tsv"
    pd.DataFrame(rows).to_csv(tsv, sep="\t", index=False)

    expected = tmp_path / "expected.json"
    expected.write_text(json.dumps({"gqa": 0.0, "mmbench": 0.0}))

    r = _run_runway([
        "--ckpt", ckpt_dir, "--out", str(out),
        "--gqa-dir", str(gqa), "--mmbench-tsv", str(tsv),
        "--expected", str(expected), "--tolerance", "100",
        "--limit", "3", "--extra-args", "--max-new-tokens 4",
    ])
    assert r.returncode == 0, f"STDOUT:{r.stdout[-3000:]}\nSTDERR:{r.stderr[-3000:]}"
    assert "import OK" in r.stdout
    assert "smoke OK" in r.stdout
    assert "compare gqa" in r.stdout and "compare mmbench" in r.stdout
    assert "runway complete" in r.stdout
    scores = json.load(open(out / "scores.json"))
    assert set(scores) == {"gqa", "mmbench"}
    smoke = json.load(open(out / "smoke_tokens.json"))
    assert len(smoke) == 3 and all(isinstance(t, list) for t in smoke)


def test_runway_smoke_diff_fails(ckpt_dir, tmp_path):  # noqa: F811
    """A wrong recorded-token file must make the runway exit non-zero."""
    out = tmp_path / "out"
    wrong = tmp_path / "wrong.json"
    wrong.write_text(json.dumps([[1], [2], [3]]))
    r = _run_runway([
        "--ckpt", ckpt_dir, "--out", str(out), "--smoke-expect", str(wrong),
    ])
    assert r.returncode == 1, r.stdout[-2000:]
    assert "smoke DIFF" in r.stdout

    # and the recorded run itself round-trips clean
    good = out / "smoke_tokens.json"
    r2 = _run_runway([
        "--ckpt", ckpt_dir, "--out", str(out), "--smoke-expect", str(good),
    ])
    assert r2.returncode == 0, r2.stdout[-2000:]
    assert "token-identical" in r2.stdout
