"""OpenAI-compatible gateway tests: prompt rendering through the
conversation templates, request validation, and the full three-tier HTTP
chain (gateway → controller → worker) for /v1/models, non-streaming and
SSE-streaming chat completions, legacy completions, usage accounting, and
bearer auth. The gateway surface is BEYOND the reference (llava/serve has
gradio + CLI only)."""

import base64
import io
import json
import socket
import threading
import time
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from tokenpacker_tpu.data.conversation import conv_templates
from tokenpacker_tpu.serve.controller import make_handler as controller_handler
from tokenpacker_tpu.serve.controller import Controller
from tokenpacker_tpu.serve.model_worker import make_handler as worker_handler
from tokenpacker_tpu.serve.openai_api import (
    APIError,
    Gateway,
    _data_url_to_b64,
    _normalize_stop,
    _parse_content,
    make_handler,
    render_chat_prompt,
)
from tests.test_serve import _free_port, _post, servers, tiny_worker  # noqa: F401


# -- unit: content parsing ----------------------------------------------------


def test_parse_content_forms():
    assert _parse_content("hello") == ("hello", [])
    assert _parse_content(None) == ("", [])
    b64 = base64.b64encode(b"notanimage").decode()
    text, imgs = _parse_content([
        {"type": "text", "text": "what is"},
        {"type": "image_url", "image_url": {"url": f"data:image/png;base64,{b64}"}},
        {"type": "text", "text": "this"},
    ])
    assert text == "what is\nthis"
    assert imgs == [b64]
    with pytest.raises(APIError):
        _parse_content([{"type": "video"}])
    with pytest.raises(APIError):
        _parse_content(42)


def test_data_url_rules():
    b64 = base64.b64encode(b"x").decode()
    assert _data_url_to_b64(f"data:image/jpeg;base64,{b64}") == b64
    assert _data_url_to_b64(b64) == b64  # bare base64 tolerated
    with pytest.raises(APIError):  # no egress by design
        _data_url_to_b64("https://example.com/cat.png")
    with pytest.raises(APIError):
        _data_url_to_b64("data:image/png,rawbytes")
    with pytest.raises(APIError):
        _data_url_to_b64("!!! not base64 !!!")


def test_normalize_stop():
    assert _normalize_stop(None, "</s>") == ["</s>"]
    assert _normalize_stop("END", "</s>") == ["</s>", "END"]
    assert _normalize_stop(["a", "b"], None) == ["a", "b"]
    with pytest.raises(APIError):
        _normalize_stop(17, None)


# -- unit: chat rendering vs the conversation templates -----------------------


def test_render_chat_prompt_matches_template():
    """The rendered prompt is byte-identical to driving the llava_v1
    template directly (same auto-selection the web UI / CLI apply)."""
    conv = conv_templates["llava_v1"].copy()
    conv.append_message(conv.roles[0], "hello there")
    conv.append_message(conv.roles[1], "hi!")
    conv.append_message(conv.roles[0], "and now?")
    conv.append_message(conv.roles[1], None)
    want = conv.get_prompt()

    got, images, stop = render_chat_prompt("tokenpacker-7b", [
        {"role": "user", "content": "hello there"},
        {"role": "assistant", "content": "hi!"},
        {"role": "user", "content": "and now?"},
    ])
    assert got == want
    assert images == []
    assert stop == conv.sep2  # SeparatorStyle.TWO


def test_render_chat_prompt_system_override_and_images():
    b64 = base64.b64encode(b"img").decode()
    got, images, _ = render_chat_prompt("tokenpacker-7b", [
        {"role": "system", "content": "You are terse."},
        {"role": "user", "content": [
            {"type": "text", "text": "describe"},
            {"type": "image_url", "image_url": {"url": f"data:image/png;base64,{b64}"}},
        ]},
    ])
    assert got.startswith("You are terse.")
    assert "<image>\ndescribe" in got
    assert images == [b64]


def test_render_chat_prompt_validation():
    with pytest.raises(APIError):  # no user message
        render_chat_prompt("m", [{"role": "assistant", "content": "hi"}])
    with pytest.raises(APIError):  # unknown role
        render_chat_prompt("m", [{"role": "tool", "content": "x"}])
    b64 = base64.b64encode(b"i").decode()
    with pytest.raises(APIError):  # image in assistant turn
        render_chat_prompt("m", [
            {"role": "user", "content": "q"},
            {"role": "assistant", "content": [
                {"type": "image_url", "image_url": {"url": f"data:;base64,{b64}"}}]},
        ])


def test_stream_request_validation():
    g = Gateway("http://unused")
    with pytest.raises(APIError):
        g.stream_request({}, chat=True)  # no model
    with pytest.raises(APIError):
        g.stream_request({"model": "m"}, chat=True)  # no messages
    # n > 1 is supported since r5 (test_n_choices_and_seed); only the
    # bounds/stream combinations reject (test_n_validation)
    with pytest.raises(APIError):
        g.stream_request({"model": "m"}, chat=False)  # no prompt
    p = g.stream_request(
        {"model": "m", "prompt": ["one"], "max_tokens": 7, "stop": ["X"]}, chat=False)
    assert p["prompt"] == "one" and p["max_new_tokens"] == 7 and p["stop"] == ["X"]
    # max_completion_tokens (newer name) wins over max_tokens
    p = g.stream_request(
        {"model": "m", "prompt": "x", "max_tokens": 7, "max_completion_tokens": 3},
        chat=False)
    assert p["max_new_tokens"] == 3
    # top_k / min_p (vLLM-style extensions) forward to the worker; absent -> off
    p = g.stream_request(
        {"model": "m", "prompt": "x", "top_k": 40, "min_p": 0.1}, chat=False)
    assert p["top_k"] == 40 and p["min_p"] == 0.1
    d = g.stream_request({"model": "m", "prompt": "x"}, chat=False)
    assert d["top_k"] == 0 and d["min_p"] == 0.0


# -- integration: full 3-tier chain -------------------------------------------


@pytest.fixture(scope="module")
def gateway_server(servers):  # noqa: F811
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
    gw = Gateway(servers["controller"])
    gs = ThreadingHTTPServer(("localhost", gport), make_handler(gw))
    threading.Thread(target=gs.serve_forever, daemon=True).start()
    time.sleep(0.2)
    yield {"base": f"http://localhost:{gport}", "gateway": gw}
    gs.shutdown()


def _get(url, headers=None, timeout=30):
    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read())


def _post_raw(url, payload, headers=None, timeout=120):
    hdrs = {"Content-Type": "application/json"}
    hdrs.update(headers or {})
    req = urllib.request.Request(url, json.dumps(payload).encode(), hdrs)
    return urllib.request.urlopen(req, timeout=timeout)


def test_v1_models(gateway_server):
    status, body = _get(gateway_server["base"] + "/v1/models")
    assert status == 200 and body["object"] == "list"
    assert [m["id"] for m in body["data"]] == ["tiny-tokenpacker"]


def test_chat_completion_nonstream(gateway_server):
    with _post_raw(gateway_server["base"] + "/v1/chat/completions", {
        "model": "tiny-tokenpacker",
        "messages": [{"role": "user", "content": "a curious user"}],
        "temperature": 0.0,
        "max_tokens": 4,
    }) as resp:
        body = json.loads(resp.read())
    assert body["object"] == "chat.completion"
    assert body["id"].startswith("chatcmpl-")
    choice = body["choices"][0]
    assert choice["message"]["role"] == "assistant"
    assert isinstance(choice["message"]["content"], str)
    assert choice["finish_reason"] in ("stop", "length")
    usage = body["usage"]
    assert usage["completion_tokens"] >= 1
    assert usage["total_tokens"] == usage["prompt_tokens"] + usage["completion_tokens"]
    # the echoed conversation prompt never leaks into the content
    assert "USER" not in choice["message"]["content"]


def _read_sse(resp):
    events = []
    buf = b""
    while True:
        b_ = resp.read(1)
        if not b_:
            break
        buf += b_
        while b"\n\n" in buf:
            frame, buf = buf.split(b"\n\n", 1)
            assert frame.startswith(b"data: ")
            payload = frame[len(b"data: "):]
            events.append(None if payload == b"[DONE]" else json.loads(payload))
    return events


def test_chat_completion_stream_matches_nonstream(gateway_server):
    req = {
        "model": "tiny-tokenpacker",
        "messages": [{"role": "user", "content": "a curious user"}],
        "temperature": 0.0,
        "max_tokens": 4,
    }
    with _post_raw(gateway_server["base"] + "/v1/chat/completions", req) as resp:
        nonstream = json.loads(resp.read())
    with _post_raw(
        gateway_server["base"] + "/v1/chat/completions",
        {**req, "stream": True,
         "stream_options": {"include_usage": True}},
    ) as resp:
        assert resp.headers["Content-Type"] == "text/event-stream"
        events = _read_sse(resp)
    assert events[-1] is None  # [DONE]
    chunks = [e for e in events if e is not None]
    assert all(c["object"] == "chat.completion.chunk" for c in chunks)
    deltas = [c for c in chunks if c["choices"]]
    assert deltas[0]["choices"][0]["delta"].get("role") == "assistant"
    text = "".join(c["choices"][0]["delta"].get("content", "") for c in deltas)
    finish = deltas[-1]["choices"][0]["finish_reason"]
    assert finish in ("stop", "length")
    # greedy decode: streamed concat == non-streaming content
    assert text == nonstream["choices"][0]["message"]["content"]
    usage_chunks = [c for c in chunks if not c["choices"]]
    assert usage_chunks and usage_chunks[0]["usage"]["completion_tokens"] >= 1


def test_stream_error_midstream_stays_sse():
    """A worker error AFTER the SSE headers are on the wire must arrive as
    an in-band SSE error event over valid chunked framing — not as a raw
    'HTTP/1.1 500' status line written into the open body (ADVICE r4)."""

    class FakeGateway:
        api_key = None

        def run(self, body, chat):
            def gen():
                yield {"object": "chat.completion.chunk", "choices": [
                    {"index": 0, "delta": {"content": "hi"}}]}
                raise APIError("worker exploded mid-stream", 500, "server_error")

            return gen()

    port = _free_port()
    server = ThreadingHTTPServer(("localhost", port), make_handler(FakeGateway()))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with _post_raw(
            f"http://localhost:{port}/v1/chat/completions",
            {"model": "m", "messages": [], "stream": True},
        ) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "text/event-stream"
            raw = resp.read()  # valid chunked framing or http.client raises
    finally:
        server.shutdown()
    frames = [f for f in raw.split(b"\n\n") if f]
    assert all(f.startswith(b"data: ") for f in frames)
    events = [json.loads(f[len(b"data: "):]) for f in frames]
    assert events[0]["choices"][0]["delta"]["content"] == "hi"
    assert events[-1]["error"]["type"] == "server_error"
    assert "mid-stream" in events[-1]["error"]["message"]


def test_legacy_completions(gateway_server):
    with _post_raw(gateway_server["base"] + "/v1/completions", {
        "model": "tiny-tokenpacker",
        "prompt": "a curious user",
        "temperature": 0.0,
        "max_tokens": 3,
    }) as resp:
        body = json.loads(resp.read())
    assert body["object"] == "text_completion"
    assert body["id"].startswith("cmpl-")
    assert isinstance(body["choices"][0]["text"], str)


def test_n_choices_and_seed(gateway_server):
    """n > 1 returns n indexed choices from co-scheduled worker streams;
    usage counts the prompt once and sums completions. A pinned seed makes
    each choice reproducible across calls (seed offsets per choice keep
    the n choices themselves distinct draws)."""
    req = {
        "model": "tiny-tokenpacker", "prompt": "a curious user",
        "temperature": 1.5, "max_tokens": 6, "n": 3, "seed": 42,
    }
    with _post_raw(gateway_server["base"] + "/v1/completions", req) as resp:
        body = json.loads(resp.read())
    assert [c["index"] for c in body["choices"]] == [0, 1, 2]
    texts = [c["text"] for c in body["choices"]]
    assert len(set(texts)) > 1  # per-choice seed offsets -> distinct draws
    assert body["usage"]["completion_tokens"] >= 3
    with _post_raw(gateway_server["base"] + "/v1/completions", req) as resp:
        again = json.loads(resp.read())
    assert [c["text"] for c in again["choices"]] == texts  # seeded replay
    # greedy n: all choices identical (and chat shape works)
    with _post_raw(gateway_server["base"] + "/v1/chat/completions", {
        "model": "tiny-tokenpacker",
        "messages": [{"role": "user", "content": "a curious user"}],
        "temperature": 0.0, "max_tokens": 4, "n": 2,
    }) as resp:
        chat = json.loads(resp.read())
    msgs = [c["message"]["content"] for c in chat["choices"]]
    assert msgs[0] == msgs[1]


def test_n_validation():
    g = Gateway("http://unused")
    with pytest.raises(APIError):
        g.stream_request({"model": "m", "prompt": "p", "n": 9}, chat=False)
    with pytest.raises(APIError):
        g.stream_request(
            {"model": "m", "prompt": "p", "n": 2, "stream": True}, chat=False)
    assert g.stream_request(
        {"model": "m", "prompt": "p", "seed": 5}, chat=False)["seed"] == 5


def test_chat_logprobs(gateway_server):
    """Chat logprobs: one content entry per completion token, OpenAI shape
    ({token, logprob, bytes, top_logprobs}); stream chunks carry the same
    entries as the non-stream object."""
    req = {
        "model": "tiny-tokenpacker",
        "messages": [{"role": "user", "content": "a curious user"}],
        "temperature": 0.0, "max_tokens": 5,
        "logprobs": True, "top_logprobs": 2,
    }
    with _post_raw(gateway_server["base"] + "/v1/chat/completions", req) as resp:
        body = json.loads(resp.read())
    content = body["choices"][0]["logprobs"]["content"]
    assert len(content) == body["usage"]["completion_tokens"] >= 1
    for e in content:
        assert isinstance(e["token"], str) and isinstance(e["logprob"], float)
        assert e["logprob"] <= 0.0
        assert e["bytes"] == list(e["token"].encode())
        assert len(e["top_logprobs"]) == 2
        # greedy: the chosen token is the raw argmax -> it leads the top list
        assert e["top_logprobs"][0]["token"] == e["token"]
        assert e["top_logprobs"][0]["logprob"] >= e["top_logprobs"][1]["logprob"]
    with _post_raw(gateway_server["base"] + "/v1/chat/completions",
                   {**req, "stream": True}) as resp:
        events = _read_sse(resp)
    streamed = []
    for ev in events:
        if ev and ev["choices"] and ev["choices"][0].get("logprobs"):
            streamed.extend(ev["choices"][0]["logprobs"]["content"])
    assert streamed == content


def test_legacy_completions_logprobs(gateway_server):
    """Legacy completions `logprobs: N`: tokens / token_logprobs /
    top_logprobs / text_offset aligned, offsets cumulative from 0."""
    with _post_raw(gateway_server["base"] + "/v1/completions", {
        "model": "tiny-tokenpacker", "prompt": "a curious user",
        "temperature": 0.0, "max_tokens": 4, "logprobs": 2,
    }) as resp:
        body = json.loads(resp.read())
    lp = body["choices"][0]["logprobs"]
    n = len(lp["tokens"])
    assert n >= 1
    assert len(lp["token_logprobs"]) == len(lp["top_logprobs"]) == n
    assert len(lp["text_offset"]) == n and lp["text_offset"][0] == 0
    assert lp["text_offset"] == sorted(lp["text_offset"])
    for t, v, top in zip(lp["tokens"], lp["token_logprobs"], lp["top_logprobs"]):
        assert v <= 0.0 and isinstance(top, dict) and t in top


def test_logprobs_validation():
    g = Gateway("http://unused")
    with pytest.raises(APIError):
        g.stream_request({"model": "m", "messages": [
            {"role": "user", "content": "q"}], "logprobs": True,
            "top_logprobs": 25}, chat=True)
    with pytest.raises(APIError):
        g.stream_request({"model": "m", "prompt": "x", "logprobs": 21},
                         chat=False)
    # off by default: no logprobs key reaches the worker
    assert "logprobs" not in g.stream_request(
        {"model": "m", "prompt": "x"}, chat=False)
    assert g.stream_request(
        {"model": "m", "prompt": "x", "logprobs": 0}, chat=False,
    )["logprobs"] == 0


def test_completion_penalties_reach_sampler(gateway_server):
    """End-to-end 3-tier drive: the penalty fields flow gateway → worker →
    Generator and change what gets sampled. presence_penalty=-1000 makes
    every generated token repeat the first one (each generated token's
    logit gains +1000 once it has appeared) — a deterministic,
    device-visible effect; repetition_penalty must round-trip without
    error too."""
    def completion(extra):
        with _post_raw(gateway_server["base"] + "/v1/completions", {
            "model": "tiny-tokenpacker", "prompt": "a curious user",
            "temperature": 0.0, "max_tokens": 6, **extra,
        }) as resp:
            return json.loads(resp.read())["choices"][0]["text"]

    plain = completion({})
    pinned = completion({"presence_penalty": -1000.0})
    words = pinned.split()
    assert len(words) >= 2 and len(set(words)) == 1, pinned
    assert pinned != plain
    assert isinstance(completion({"repetition_penalty": 4.0}), str)


def test_unknown_model_404(gateway_server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_raw(gateway_server["base"] + "/v1/chat/completions", {
            "model": "nope",
            "messages": [{"role": "user", "content": "hi"}],
        })
    assert e.value.code == 404
    body = json.loads(e.value.read())
    assert body["error"]["code"] == "model_not_found"


def test_bad_json_400(gateway_server):
    req = urllib.request.Request(
        gateway_server["base"] + "/v1/chat/completions",
        b"{not json", {"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_bearer_auth(gateway_server):
    gw = gateway_server["gateway"]
    gw.api_key = "sk-test"
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(gateway_server["base"] + "/v1/models")
        assert e.value.code == 401
        assert json.loads(e.value.read())["error"]["type"] == "authentication_error"
        status, _ = _get(
            gateway_server["base"] + "/v1/models",
            headers={"Authorization": "Bearer sk-test"},
        )
        assert status == 200
    finally:
        gw.api_key = None


def test_worker_final_chunk_accounting(servers):  # noqa: F811
    """The worker's terminal chunk carries finish_reason + usage (consumed
    by the gateway; ignored by the web UI / CLI, which read only text)."""
    payload = {
        "prompt": "USER : hello ASSISTANT :",
        "temperature": 0.0,
        "max_new_tokens": 3,
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
    last = chunks[-1]
    assert last["finish_reason"] == "length"  # hit max_new_tokens
    assert last["usage"]["completion_tokens"] == 3
    assert last["usage"]["prompt_tokens"] >= 1
    assert not any("finish_reason" in c for c in chunks[:-1])
