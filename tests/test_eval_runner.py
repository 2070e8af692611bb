"""EvalRunner harness end-to-end on a tiny model with real image files."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax

from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.eval.benchmarks import iter_vqa_jsonl
from tokenpacker_tpu.eval.runner import EvalRunner, _crop_bucket, get_chunk, write_answers
from tokenpacker_tpu.generate import Generator
from tokenpacker_tpu.models.vlm import init_vlm
from tests.test_trainer import Tok


class TinyLoaded:
    def __init__(self):
        self.config = tiny_vlm_config()
        params = init_vlm(jax.random.PRNGKey(0), self.config)
        self.tok = Tok()
        self.generator = Generator(params, self.config, self.tok)


@pytest.fixture
def questions(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        name = f"q{i}.png"
        Image.fromarray(rng.integers(0, 255, (50, 60, 3), dtype=np.uint8)).save(img_dir / name)
        rows.append({"question_id": i, "image": name, "text": f"what is this {i}"})
    qfile = tmp_path / "questions.jsonl"
    with open(qfile, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(qfile), str(img_dir)


def test_runner_answers_jsonl(questions, tmp_path):
    qfile, img_dir = questions
    loaded = TinyLoaded()

    # EvalRunner preprocesses at the model's own tower geometry (56px here),
    # so no monkeypatching is needed
    runner = EvalRunner(loaded, loaded.tok, conv_mode="vicuna_v1", batch_size=2, max_new_tokens=3)
    samples = iter_vqa_jsonl(qfile, img_dir)
    answers = list(runner.run(samples))
    assert [a["question_id"] for a in answers] == [0, 1, 2]
    assert all(isinstance(a["text"], str) for a in answers)

    out = tmp_path / "answers.jsonl"
    write_answers(str(out), answers)
    back = [json.loads(l) for l in open(out)]
    assert len(back) == 3 and back[0]["model_id"] == "tokenpacker-tpu"


def test_get_chunk_matches_reference_semantics():
    lst = list(range(10))
    chunks = [get_chunk(lst, 3, i) for i in range(3)]
    assert sum(chunks, []) == lst
    assert len(chunks[0]) == 4  # ceil sizing


def test_crop_bucket():
    assert _crop_bucket(1) == 1
    assert _crop_bucket(3) == 4
    assert _crop_bucket(17) == 32
    assert _crop_bucket(200) == 256


def test_device_prefetcher_order_and_errors():
    from tokenpacker_tpu.data.prefetch import DevicePrefetcher

    out = list(DevicePrefetcher(range(10), transform=lambda x: x * 2, depth=3))
    assert out == [x * 2 for x in range(10)]

    def bad(x):
        if x == 3:
            raise ValueError("boom")
        return x

    pf = DevicePrefetcher(range(10), transform=bad, depth=2)
    got = []
    try:
        for v in pf:
            got.append(v)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    assert got == [0, 1, 2]
