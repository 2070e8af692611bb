"""Serving-plane integration tests: controller registry/dispatch over real
local HTTP, worker streaming wire format, end-to-end via a tiny model."""

import json
import socket
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

import jax

from tokenpacker_tpu.config import tiny_vlm_config
from tokenpacker_tpu.generate import Generator
from tokenpacker_tpu.models.vlm import init_vlm
from tokenpacker_tpu.serve.controller import Controller, make_handler as controller_handler
from tokenpacker_tpu.serve.model_worker import ModelWorker, make_handler as worker_handler
from tests.test_trainer import Tok


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _post(url, payload, timeout=10):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read() or b"{}")


@pytest.fixture(scope="module")
def tiny_worker():
    """A ModelWorker wired to an in-memory tiny VLM (no checkpoint load)."""
    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    tok = Tok()
    # warm vocab with words the prompts will use
    tok("A chat between a curious user and an artificial intelligence assistant")

    class FakeLoaded:
        config = cfg
        generator = Generator(params, cfg, tok)

    w = ModelWorker.__new__(ModelWorker)
    w.worker_id = "test"
    w.controller_addr = None
    w.worker_addr = None
    w.model_name = "tiny-tokenpacker"
    w.tokenizer = tok
    w.model = FakeLoaded()
    w.image_processor = None
    w.context_len = 512
    w.cfg = cfg
    w.semaphore = threading.Semaphore(2)
    w.queue_length = 0
    w._ql_lock = threading.Lock()
    w.call_ct = 0
    w.batcher = None
    w.draining = False
    return w


@pytest.fixture(scope="module")
def servers(tiny_worker):
    cport, wport = _free_port(), _free_port()
    controller = Controller("shortest_queue")
    cs = ThreadingHTTPServer(("localhost", cport), controller_handler(controller))
    ws = ThreadingHTTPServer(("localhost", wport), worker_handler(tiny_worker))
    threading.Thread(target=cs.serve_forever, daemon=True).start()
    threading.Thread(target=ws.serve_forever, daemon=True).start()
    time.sleep(0.2)
    yield {
        "controller": f"http://localhost:{cport}",
        "worker": f"http://localhost:{wport}",
        "obj": controller,
    }
    cs.shutdown()
    ws.shutdown()
    controller.stop()


def test_register_and_dispatch(servers):
    ok = _post(
        servers["controller"] + "/register_worker",
        {
            "worker_name": servers["worker"],
            "check_heart_beat": False,
            "worker_status": {"model_names": ["tiny-tokenpacker"], "speed": 1, "queue_length": 0},
        },
    )
    models = _post(servers["controller"] + "/list_models", {})["models"]
    assert models == ["tiny-tokenpacker"]
    addr = _post(servers["controller"] + "/get_worker_address", {"model": "tiny-tokenpacker"})
    assert addr["address"] == servers["worker"]
    missing = _post(servers["controller"] + "/get_worker_address", {"model": "nope"})
    assert missing["address"] == ""


def test_heartbeat_updates(servers):
    r = _post(
        servers["controller"] + "/receive_heart_beat",
        {"worker_name": servers["worker"], "queue_length": 3},
    )
    assert r["exist"] is True
    r = _post(
        servers["controller"] + "/receive_heart_beat",
        {"worker_name": "http://unknown:1", "queue_length": 1},
    )
    assert r["exist"] is False


def test_worker_stream_wire_format(servers):
    """\\0-delimited JSON chunks with accumulated text (worker protocol)."""
    payload = {
        "prompt": "USER : hello ASSISTANT :",
        "temperature": 0.0,
        "max_new_tokens": 4,
        "stop": "</s>",
    }
    req = urllib.request.Request(
        servers["worker"] + "/worker_generate_stream",
        json.dumps(payload).encode(),
        {"Content-Type": "application/json"},
    )
    chunks = []
    with urllib.request.urlopen(req, timeout=60) as resp:
        buf = b""
        while True:
            b_ = resp.read(1)
            if not b_:
                break
            if b_ == b"\0":
                chunks.append(json.loads(buf))
                buf = b""
            else:
                buf += b_
    assert chunks, "no streamed chunks"
    assert all(c["error_code"] == 0 for c in chunks)
    assert chunks[-1]["text"].startswith(payload["prompt"])


def _stream_text(worker_addr, payload):
    req = urllib.request.Request(
        worker_addr + "/worker_generate_stream",
        json.dumps(payload).encode(), {"Content-Type": "application/json"},
    )
    last = None
    with urllib.request.urlopen(req, timeout=60) as resp:
        for frame in resp.read().split(b"\0"):
            if frame:
                last = json.loads(frame)
    assert last is not None and last["error_code"] == 0
    return last["text"]


def test_worker_sampling_seed(servers):
    """Non-batcher sampled requests draw a fresh random seed per request
    (identical prompts are NOT forced to one completion — the pre-r5 path
    pinned PRNGKey(0)); pinning `seed` makes them reproducible."""
    payload = {
        "prompt": "USER : hello ASSISTANT :",
        "temperature": 1.5,
        "max_new_tokens": 12,
    }
    a, b = (_stream_text(servers["worker"], payload) for _ in range(2))
    assert a != b
    seeded = dict(payload, seed=7)
    s1, s2 = (_stream_text(servers["worker"], seeded) for _ in range(2))
    assert s1 == s2
    assert _stream_text(servers["worker"], dict(payload, seed=8)) != s1


def test_worker_status(servers):
    st = _post(servers["worker"] + "/worker_get_status", {})
    assert st["model_names"] == ["tiny-tokenpacker"]


def test_stale_worker_expiry():
    c = Controller("lottery")
    c.worker_info["http://dead:1"] = type(
        "WI",
        (),
        {
            "model_names": ["m"],
            "speed": 1,
            "queue_length": 0,
            "check_heart_beat": True,
            "last_heart_beat": time.time() - 1000,
        },
    )()
    c.remove_stale_workers_by_expiration()
    assert "http://dead:1" not in c.worker_info
    c.stop()


def test_worker_stream_via_continuous_batcher(tiny_worker):
    """The worker's --scheduler continuous path: two concurrent HTTP streams
    share batched decode steps and produce the same text as the plain
    Generator path."""
    from tokenpacker_tpu.serve.scheduler import ContinuousBatcher

    cfg = tiny_worker.cfg
    params = tiny_worker.model.generator.params
    batcher = ContinuousBatcher(params, cfg, tiny_worker.tokenizer, num_slots=2, max_seq_len=128)
    batcher.start()
    tiny_worker.batcher = batcher
    wport = _free_port()
    ws = ThreadingHTTPServer(("localhost", wport), worker_handler(tiny_worker))
    threading.Thread(target=ws.serve_forever, daemon=True).start()
    time.sleep(0.2)
    try:
        def stream_one(prompt):
            req = urllib.request.Request(
                f"http://localhost:{wport}/worker_generate_stream",
                json.dumps({"prompt": prompt, "temperature": 0.0, "max_new_tokens": 5}).encode(),
                {"Content-Type": "application/json"},
            )
            chunks = []
            with urllib.request.urlopen(req, timeout=120) as resp:
                buf = b""
                while True:
                    b = resp.read(1)
                    if not b:
                        break
                    if b == b"\0":
                        chunks.append(json.loads(buf))
                        buf = b""
                    else:
                        buf += b
            return chunks

        results = [None, None]
        def run(i, p):
            results[i] = stream_one(p)
        t1 = threading.Thread(target=run, args=(0, "a curious user"))
        t2 = threading.Thread(target=run, args=(1, "an artificial intelligence"))
        t1.start(); t2.start(); t1.join(120); t2.join(120)
        for r in results:
            assert r and r[-1]["error_code"] == 0
            assert len(r) >= 1
        # parity with the non-batcher path for the same prompt
        tiny_worker.batcher = None
        ref = stream_one("a curious user")
        tiny_worker.batcher = batcher
        assert results[0][-1]["text"] == ref[-1]["text"]
    finally:
        tiny_worker.batcher = None
        ws.shutdown()
        batcher.stop()


def test_worker_paged_prefix_cache_across_turns(tiny_worker):
    """Multi-turn chat through the worker HTTP surface with --scheduler
    paged: turn 2 resends turn 1's transcript as its prompt prefix and hits
    the prefix cache; the reuse counters surface in /worker_get_status."""
    from tokenpacker_tpu.serve.scheduler import PagedContinuousBatcher

    cfg = tiny_worker.cfg
    params = tiny_worker.model.generator.params
    batcher = PagedContinuousBatcher(
        params, cfg, tiny_worker.tokenizer, num_slots=2, num_pages=64,
        page_size=4, max_pages_per_seq=32, prefix_cache=True,
    )
    batcher.start()
    tiny_worker.batcher = batcher
    wport = _free_port()
    ws = ThreadingHTTPServer(("localhost", wport), worker_handler(tiny_worker))
    threading.Thread(target=ws.serve_forever, daemon=True).start()
    time.sleep(0.2)
    try:
        def stream_one(prompt):
            req = urllib.request.Request(
                f"http://localhost:{wport}/worker_generate_stream",
                json.dumps({"prompt": prompt, "temperature": 0.0,
                            "max_new_tokens": 4}).encode(),
                {"Content-Type": "application/json"},
            )
            chunks = []
            with urllib.request.urlopen(req, timeout=120) as resp:
                buf = b""
                while True:
                    b = resp.read(1)
                    if not b:
                        break
                    if b == b"\0":
                        chunks.append(json.loads(buf))
                        buf = b""
                    else:
                        buf += b
            return chunks

        turn1 = ("A chat between a curious user and an artificial "
                 "intelligence assistant")
        r1 = stream_one(turn1)
        assert r1[-1]["error_code"] == 0
        # turn 2's prompt = turn 1's full transcript + a follow-up
        turn2 = r1[-1]["text"] + " a curious user assistant"
        r2 = stream_one(turn2)
        assert r2[-1]["error_code"] == 0
        status = _post(f"http://localhost:{wport}/worker_get_status", {})
        assert status["prefix_cache_hits"] >= 1
        assert status["prefix_tokens_reused"] > 0
    finally:
        tiny_worker.batcher = None
        ws.shutdown()
        batcher.stop()


def test_worker_stream_speculative_parity(servers, tiny_worker):
    """--speculative-k over the live worker HTTP surface: the final streamed
    text matches the plain (non-speculative) stream for the same greedy
    request."""
    payload = {
        "prompt": "USER : a curious user ASSISTANT :",
        "temperature": 0.0,
        "max_new_tokens": 6,
    }

    def stream():
        req = urllib.request.Request(
            servers["worker"] + "/worker_generate_stream",
            json.dumps(payload).encode(),
            {"Content-Type": "application/json"},
        )
        chunks = []
        with urllib.request.urlopen(req, timeout=120) as resp:
            buf = b""
            while True:
                b_ = resp.read(1)
                if not b_:
                    break
                if b_ == b"\0":
                    chunks.append(json.loads(buf))
                    buf = b""
                else:
                    buf += b_
        assert chunks and all(c["error_code"] == 0 for c in chunks)
        return chunks[-1]["text"]

    plain = stream()
    tiny_worker.speculative_k = 3
    try:
        spec = stream()
    finally:
        tiny_worker.speculative_k = 0
    assert spec == plain


def test_web_server_chat_end_to_end(servers, tiny_worker):
    """Full three-tier chain over real HTTP: web UI /chat → controller
    /get_worker_address → worker /worker_generate_stream, with prompt
    rendering, streaming frames, and prompt-echo stripping."""
    from tokenpacker_tpu.serve.web_server import make_handler as web_handler

    # ensure the worker is registered with the controller
    _post(
        servers["controller"] + "/register_worker",
        {
            "worker_name": servers["worker"],
            "check_heart_beat": False,
            "worker_status": {
                "model_names": ["tiny-tokenpacker"], "speed": 1, "queue_length": 0,
            },
        },
    )
    gport = _free_port()
    gs = ThreadingHTTPServer(("localhost", gport), web_handler(servers["controller"]))
    threading.Thread(target=gs.serve_forever, daemon=True).start()
    time.sleep(0.2)
    try:
        # the landing page and model list
        with urllib.request.urlopen(f"http://localhost:{gport}/", timeout=10) as r:
            assert b"<html" in r.read(200).lower()
        with urllib.request.urlopen(f"http://localhost:{gport}/list_models", timeout=10) as r:
            assert "tiny-tokenpacker" in json.loads(r.read())["models"]

        req = urllib.request.Request(
            f"http://localhost:{gport}/chat",
            json.dumps({
                "model": "tiny-tokenpacker",
                "history": [["user", "a curious user"]],
                "temperature": 0.0,
                "max_new_tokens": 4,
            }).encode(),
            {"Content-Type": "application/json"},
        )
        frames = []
        with urllib.request.urlopen(req, timeout=120) as resp:
            buf = b""
            while True:
                b = resp.read(1)
                if not b:
                    break
                if b == b"\0":
                    frames.append(json.loads(buf))
                    buf = b""
                else:
                    buf += b
        assert frames, "no stream frames from /chat"
        assert all("text" in f for f in frames)
        # the UI frames must not echo the rendered conversation prompt
        assert "USER:" not in frames[-1]["text"]
    finally:
        gs.shutdown()


def test_web_server_moderation_hook(servers, monkeypatch):
    """MODERATION_URL gates user turns (reference gradio_web_server.py:135 /
    utils.py violates_moderation): a flagged message is answered with the
    moderation notice and never reaches a worker; unflagged flows through."""
    import http.server

    flagged_calls = []

    class FakeMod(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n))
            flagged_calls.append(body["input"])
            flagged = "banned" in body["input"]
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(json.dumps({"results": [{"flagged": flagged}]}).encode())

    mport = _free_port()
    ms = ThreadingHTTPServer(("localhost", mport), FakeMod)
    threading.Thread(target=ms.serve_forever, daemon=True).start()

    from tokenpacker_tpu.serve.web_server import make_handler as web_handler

    gport = _free_port()
    gs = ThreadingHTTPServer(("localhost", gport), web_handler(servers["controller"]))
    threading.Thread(target=gs.serve_forever, daemon=True).start()
    time.sleep(0.2)
    monkeypatch.setenv("MODERATION_URL", f"http://localhost:{mport}/moderations")

    def chat(text):
        req = urllib.request.Request(
            f"http://localhost:{gport}/chat",
            json.dumps({
                "model": "tiny-tokenpacker",
                "history": [["user", text]],
                "temperature": 0.0,
                "max_new_tokens": 3,
            }).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            frames = [json.loads(c) for c in r.read().split(b"\0") if c]
        return frames

    try:
        frames = chat("a banned request")
        assert frames[-1]["error_code"] == 3
        assert "MODERATION" in frames[-1]["text"]
        assert flagged_calls == ["a banned request"]

        frames = chat("a curious user")
        assert frames and all("text" in f for f in frames)
        assert "MODERATION" not in frames[-1]["text"]
        assert len(flagged_calls) == 2
    finally:
        gs.shutdown()
        ms.shutdown()


def test_deregister_worker_endpoint(servers):
    _post(
        servers["controller"] + "/register_worker",
        {
            "worker_name": "http://localhost:9999",
            "check_heart_beat": False,
            "worker_status": {"model_names": ["drain-me"], "speed": 1, "queue_length": 0},
        },
    )
    assert "drain-me" in _post(servers["controller"] + "/list_models", {})["models"]
    ret = _post(
        servers["controller"] + "/deregister_worker",
        {"worker_name": "http://localhost:9999"},
    )
    assert ret["existed"] is True
    assert "drain-me" not in _post(servers["controller"] + "/list_models", {})["models"]
    # idempotent
    ret = _post(
        servers["controller"] + "/deregister_worker",
        {"worker_name": "http://localhost:9999"},
    )
    assert ret["existed"] is False


def test_worker_drain(servers, tiny_worker):
    """drain(): deregisters, refuses new requests, returns when idle."""
    tiny_worker.controller_addr = servers["controller"]
    tiny_worker.worker_addr = servers["worker"]
    try:
        _post(
            servers["controller"] + "/register_worker",
            {
                "worker_name": servers["worker"],
                "check_heart_beat": False,
                "worker_status": {
                    "model_names": ["tiny-tokenpacker"], "speed": 1, "queue_length": 0,
                },
            },
        )
        tiny_worker.drain(timeout=5.0)
        models = _post(servers["controller"] + "/list_models", {})["models"]
        assert "tiny-tokenpacker" not in models
        chunks = list(tiny_worker.generate_stream_gate({"prompt": "hi"}))
        msg = json.loads(chunks[-1].rstrip(b"\0"))
        assert msg["error_code"] == 1 and "shutting down" in msg["text"]
    finally:
        tiny_worker.draining = False
        tiny_worker.controller_addr = None
        tiny_worker.worker_addr = None


def test_web_server_image_process_modes():
    """_apply_process_mode reproduces the reference gradio server's
    pre-worker image preprocessing (Pad squares with the CLIP-mean-ish
    fill, Resize forces 336x336, bad modes error) on base64 payloads."""
    import base64
    import io

    from PIL import Image as PILImage

    from tokenpacker_tpu.data.conversation import conv_templates
    from tokenpacker_tpu.serve.web_server import _apply_process_mode

    conv = conv_templates["vicuna_v1"].copy()
    img = PILImage.new("RGB", (200, 100), (10, 20, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    def decode(s):
        return PILImage.open(io.BytesIO(base64.b64decode(s)))

    assert decode(_apply_process_mode(conv, b64, "Pad")).size[0] == decode(
        _apply_process_mode(conv, b64, "Pad")
    ).size[1]  # square
    assert decode(_apply_process_mode(conv, b64, "Resize")).size == (336, 336)
    # Default/Crop clamp only (here a no-op at 200x100)
    assert decode(_apply_process_mode(conv, b64, "Default")).size == (200, 100)
    import pytest

    with pytest.raises(Exception):
        _apply_process_mode(conv, b64, "Bogus")


def test_web_server_forwards_sampling_and_processed_image(servers):
    """/chat forwards the request's top_p and the PREPROCESSED image to the
    worker (reference: gradio sliders + Conversation.get_images)."""
    import base64
    import http.server
    import io

    from PIL import Image as PILImage

    from tokenpacker_tpu.serve.web_server import make_handler as web_handler

    seen = {}

    class FakeWorker(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            seen.update(json.loads(self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()
            self.wfile.write(json.dumps({"text": seen["prompt"] + "ok", "error_code": 0}).encode() + b"\0")

    wport = _free_port()
    ws = ThreadingHTTPServer(("localhost", wport), FakeWorker)
    threading.Thread(target=ws.serve_forever, daemon=True).start()
    _post(
        servers["controller"] + "/register_worker",
        {
            "worker_name": f"http://localhost:{wport}",
            "check_heart_beat": False,
            "worker_status": {"model_names": ["fake-llava"], "speed": 1, "queue_length": 0},
        },
    )
    gport = _free_port()
    gs = ThreadingHTTPServer(("localhost", gport), web_handler(servers["controller"]))
    threading.Thread(target=gs.serve_forever, daemon=True).start()
    time.sleep(0.2)

    img = PILImage.new("RGB", (200, 100), (1, 2, 3))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    try:
        req = urllib.request.Request(
            f"http://localhost:{gport}/chat",
            json.dumps({
                "model": "fake-llava",
                "history": [["user", "what is this"]],
                "image": base64.b64encode(buf.getvalue()).decode(),
                "image_process_mode": "Pad",
                "temperature": 0.9,
                "top_p": 0.42,
                "max_new_tokens": 7,
            }).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            r.read()
        assert seen["top_p"] == 0.42
        assert seen["temperature"] == 0.9
        assert seen["max_new_tokens"] == 7
        fwd = PILImage.open(io.BytesIO(base64.b64decode(seen["images"][0])))
        assert fwd.size[0] == fwd.size[1]  # Pad mode squared it before the worker
    finally:
        gs.shutdown()
        ws.shutdown()
