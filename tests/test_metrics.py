"""Prometheus-style metrics: exposition-format unit tests + live scrape of
the controller and worker /metrics endpoints (the reference has no metrics
surface at all — SURVEY.md §5)."""

import json
import socket
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from tokenpacker_tpu.serve.metrics import (
    REGISTRY,
    Counter,
    Gauge,
    Histogram,
    Registry,
)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _get(url, timeout=10):
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        return resp.status, resp.read().decode()


def _post(url, payload, timeout=10):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read() or b"{}")


# -- exposition format ------------------------------------------------------


def test_counter_render_and_labels():
    c = Counter("x_total", "help text")
    c.inc()
    c.inc(2.5, model="a")
    lines = c.render()
    assert "# HELP x_total help text" in lines
    assert "# TYPE x_total counter" in lines
    assert "x_total 1" in lines
    assert 'x_total{model="a"} 2.5' in lines
    with pytest.raises(ValueError):
        c.inc(-1)


def test_gauge_set_inc_dec():
    g = Gauge("g", "h")
    g.set(5)
    g.inc()
    g.dec(2)
    assert g.value() == 4
    assert "g 4" in g.render()


def test_histogram_cumulative_buckets():
    h = Histogram("lat_seconds", "h", buckets=(0.1, 1.0))
    for v in (0.05, 0.5, 0.5, 5.0):
        h.observe(v)
    lines = h.render()
    # cumulative: le=0.1 sees 1, le=1 sees 3, +Inf sees all 4
    assert 'lat_seconds_bucket{le="0.1"} 1' in lines
    assert 'lat_seconds_bucket{le="1"} 3' in lines
    assert 'lat_seconds_bucket{le="+Inf"} 4' in lines
    assert "lat_seconds_count 4" in lines
    assert any(line.startswith("lat_seconds_sum 6.05") for line in lines)


def test_registry_dedup_and_render():
    r = Registry()
    c1 = r.counter("a_total", "h")
    c2 = r.counter("a_total", "ignored duplicate")
    assert c1 is c2
    r.gauge("b", "h").set(1)
    text = r.render()
    assert text.endswith("\n")
    assert "a_total 0" in text  # zero-valued series still rendered
    assert "b 1" in text


def test_collect_hook_refreshes_gauges_and_swallows_errors():
    r = Registry()
    g = r.gauge("live", "h")
    r.add_collect_hook(lambda: g.set(7))
    r.add_collect_hook(lambda: 1 / 0)  # must not break render
    assert "live 7" in r.render()


def test_label_escaping():
    c = Counter("esc_total", "h")
    c.inc(route='/v1/"chat"')
    assert 'esc_total{route="/v1/\\"chat\\""} 1' in c.render()


# -- live endpoints ---------------------------------------------------------


def test_controller_metrics_endpoint():
    from tokenpacker_tpu.serve.controller import Controller, make_handler

    controller = Controller("shortest_queue")
    port = _free_port()
    server = ThreadingHTTPServer(("localhost", port), make_handler(controller))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://localhost:{port}"
        _post(base + "/register_worker", {
            "worker_name": "http://w:1", "check_heart_beat": False,
            "worker_status": {"model_names": ["m"], "speed": 1, "queue_length": 0},
        })
        _post(base + "/get_worker_address", {"model": "m"})
        _post(base + "/receive_heart_beat", {"worker_name": "http://w:1", "queue_length": 0})
        status, text = _get(base + "/metrics")
        assert status == 200
        assert "tokenpacker_controller_workers 1" in text
        assert 'tokenpacker_controller_dispatches_total{model="m"}' in text
        assert "tokenpacker_controller_heartbeats_total" in text
        # unknown GET routes 404
        with pytest.raises(urllib.error.HTTPError):
            _get(base + "/nope")
    finally:
        server.shutdown()
        controller.stop()


def test_worker_metrics_endpoint_after_generation(tmp_path):
    """One real generation through the worker HTTP plane lands in every
    worker metric family."""
    import jax

    from tests.test_trainer import Tok
    from tokenpacker_tpu.config import tiny_vlm_config
    from tokenpacker_tpu.generate import Generator
    from tokenpacker_tpu.models.vlm import init_vlm
    from tokenpacker_tpu.serve.model_worker import ModelWorker, make_handler

    cfg = tiny_vlm_config()
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    tok = Tok()
    tok("hello world this is a test")

    class FakeLoaded:
        config = cfg
        generator = Generator(params, cfg, tok)

    w = ModelWorker.__new__(ModelWorker)
    w.worker_id = "test"
    w.controller_addr = None
    w.worker_addr = None
    w.model_name = "tiny"
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

    port = _free_port()
    server = ThreadingHTTPServer(("localhost", port), make_handler(w))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://localhost:{port}"
        before = REGISTRY.render()
        req = urllib.request.Request(
            base + "/worker_generate_stream",
            json.dumps({"prompt": "hello world", "max_new_tokens": 4,
                        "temperature": 0.0}).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            raw = resp.read()
        chunks = [json.loads(c) for c in raw.split(b"\0") if c]
        assert chunks and chunks[-1]["error_code"] == 0
        status, text = _get(base + "/metrics")
        assert status == 200

        def series(name, body):
            for line in body.splitlines():
                if line.startswith(name + " ") or line.startswith(name + "{"):
                    return float(line.rsplit(" ", 1)[1])
            return None

        def grew(name):
            b = series(name, before) or 0.0
            a = series(name, text)
            return a is not None and a > b

        assert grew("tokenpacker_worker_requests_total")
        assert grew("tokenpacker_worker_generated_tokens_total")
        assert grew("tokenpacker_worker_prompt_tokens_total")
        assert grew("tokenpacker_worker_ttft_seconds_count")
        assert grew("tokenpacker_worker_preprocess_seconds_count")
        assert "tokenpacker_worker_queue_length 0" in text
    finally:
        server.shutdown()
