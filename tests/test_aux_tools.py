"""Coverage for the auxiliary tool surfaces: checkpoint-surgery CLI,
GPT-review parsing/summarize, the serve smoke client, run_demo, and the
logging utilities."""

import json
import threading
import time
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.io.hf_export import export_vlm_state_dict
from tokenpacker_tpu.models.vlm import init_vlm


@pytest.fixture(scope="module")
def tiny_ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("surgery_ckpt")
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    sd = export_vlm_state_dict(params, cfg)
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        d / "pytorch_model.bin",
    )
    (d / "config.json").write_text(json.dumps(cfg.to_hf_dict()))
    return d, cfg, params


def test_surgery_extract_mm_projector(tiny_ckpt_dir, tmp_path):
    """scripts/extract_mm_projector.py parity: pull the projector keys out of
    a full checkpoint into a stage-1-compatible mm_projector.bin."""
    from tokenpacker_tpu.io.surgery import main as surgery_main

    d, cfg, params = tiny_ckpt_dir
    out = tmp_path / "mm_projector.bin"
    surgery_main(["extract-mm-projector", "--model-path", str(d), "--output", str(out)])
    sd = torch.load(out, weights_only=True)
    assert all(k.startswith("model.mm_projector.") for k in sd)
    assert "model.mm_projector.q_proj_1.weight" in sd
    # loadable by the importer
    from tokenpacker_tpu.io.hf_import import import_tokenpacker, strip_prefix

    proj = import_tokenpacker(strip_prefix(sd, "model.mm_projector."), cfg.projector)
    np.testing.assert_allclose(
        np.asarray(proj["q_proj"]["kernel"], np.float32),
        np.asarray(params["projector"]["q_proj"]["kernel"], np.float32),
        rtol=1e-6,
    )


def test_gpt_review_parse_and_summarize(tmp_path, capsys):
    from tokenpacker_tpu.eval.gpt_review import parse_score, summarize

    assert parse_score("8 7\nGood answers.") == [8.0, 7.0]
    assert parse_score("8.5,9\nsomething") == [8.5, 9.0]  # comma form (reference replace)
    assert parse_score("garbage") == [-1.0, -1.0]

    f = tmp_path / "reviews.jsonl"
    rows = [
        {"category": "conv", "tuple": [8.0, 6.0]},
        {"category": "conv", "tuple": [7.0, 7.0]},
        {"category": "detail", "tuple": [9.0, 3.0]},
    ]
    f.write_text("\n".join(json.dumps(r) for r in rows))
    summarize([str(f)])
    out = capsys.readouterr().out
    assert "conv" in out and "detail" in out and "all" in out
    # conv means: judge1 7.5, judge2 6.5 -> printed x10 (reference scale)
    assert "judge1 75.0" in out and "judge2 65.0" in out


def test_serve_smoke_client(capsys):
    """serve/test_message.py (the reference's manual smoke client) against a
    live controller+worker."""
    from tests.test_serve import _free_port
    from tokenpacker_tpu.serve import test_message
    from tokenpacker_tpu.serve.controller import Controller, make_handler as ch

    # minimal controller with no workers: client lists models and reports
    port = _free_port()
    c = Controller("shortest_queue")
    srv = ThreadingHTTPServer(("localhost", port), ch(c))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    time.sleep(0.2)
    try:
        test_message.main([
            "--controller-address", f"http://localhost:{port}",
            "--message", "hi",
        ])
        out = capsys.readouterr().out
        assert "No models available" in out  # clean no-worker path, no crash
    finally:
        srv.shutdown()
        c.stop()


def test_logging_utils(tmp_path, monkeypatch):
    import importlib

    import tokenpacker_tpu.utils.logging_utils as lu

    monkeypatch.setenv("TOKENPACKER_LOG_DIR", str(tmp_path))
    importlib.reload(lu)
    logger = lu.build_logger("testlog", "testlog.log")
    logger.info("hello world")
    assert logger.name == "testlog"


def test_surgery_merge_lora(tiny_ckpt_dir, tmp_path):
    """merge-lora CLI: base + adapter dir -> merged full checkpoint that the
    public loader opens (reference scripts/merge_lora_weights.py)."""
    from tokenpacker_tpu.io.surgery import main as surgery_main
    from tokenpacker_tpu.train.lora import LoraConfig, export_lora_state_dict, init_lora

    d, cfg, params = tiny_ckpt_dir
    lcfg = LoraConfig(r=4, alpha=8)
    lora = init_lora(jax.random.PRNGKey(1), params, lcfg)
    # make B nonzero so the merge visibly changes weights
    lora = jax.tree.map(lambda x: x + 0.03 if x is not None else None, lora)
    adapter_dir = tmp_path / "adapter"
    adapter_dir.mkdir()
    sd = export_lora_state_dict(lora, lcfg)
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
               adapter_dir / "adapter_model.bin")
    (adapter_dir / "adapter_config.json").write_text(
        json.dumps({"r": lcfg.r, "lora_alpha": lcfg.alpha})
    )
    (adapter_dir / "config.json").write_text(json.dumps(cfg.to_hf_dict()))

    out_dir = tmp_path / "merged"
    surgery_main([
        "merge-lora", "--model-path", str(adapter_dir),
        "--model-base", str(d), "--save-model-path", str(out_dir),
    ])
    merged = torch.load(next(out_dir.glob("pytorch_model*.bin")), weights_only=True)
    base = torch.load(d / "pytorch_model.bin", weights_only=True)
    key = "model.layers.0.self_attn.q_proj.weight"
    assert not torch.allclose(merged[key].float(), base[key].float())
