"""Model worker — hosts a TPU-backed model behind the controller.

Parity surface of reference llava/serve/model_worker.py: registration +
15 s heartbeats (constants.py:2, model_worker.py:87-106), token-budget
clamping of max_new_tokens against the context window counting visual tokens
(model_worker.py:148-171), `\\0`-delimited JSON streaming from
/worker_generate_stream, a concurrency semaphore (default 5), and
/worker_get_status.

stdlib ThreadingHTTPServer; generation streams straight from the TPU decode
loop (Generator.generate_stream) — no torch Thread/TextIteratorStreamer.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import threading
import time
import urllib.request
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from tokenpacker_tpu.constants import DEFAULT_IMAGE_TOKEN, WORKER_HEART_BEAT_INTERVAL
from tokenpacker_tpu.data.mm_tokenize import tokenizer_image_token
from tokenpacker_tpu.serve import metrics as mtr
from tokenpacker_tpu.generate import pick_bucket
from tokenpacker_tpu.image.processing import process_image
from tokenpacker_tpu.models.splice import build_splice_plan
from tokenpacker_tpu.utils.logging_utils import build_logger

logger = build_logger("model_worker", "model_worker.log")


def _post_json(url: str, payload: dict, timeout: float = 5.0) -> dict:
    req = urllib.request.Request(
        url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read() or b"{}")


class ModelWorker:
    def __init__(
        self,
        controller_addr: str,
        worker_addr: str,
        model_path: str,
        model_base: str | None = None,
        model_name: str | None = None,
        limit_model_concurrency: int = 5,
        no_register: bool = False,
        load_8bit: bool = False,
        load_4bit: bool = False,
        scheduler: str = "none",  # none | continuous | paged
        scheduler_slots: int = 4,
        scheduler_max_len: int = 1024,
        scheduler_prefill_chunk: int | None = 256,  # chunked admission
        speculative_k: int = 0,  # prompt-lookup speculative decoding (greedy)
        lora_adapters: dict | None = None,  # {name: path} multi-LoRA serving
    ):
        from tokenpacker_tpu.api import load_pretrained_model
        from tokenpacker_tpu.data.mm_tokenize import get_model_name_from_path

        self.worker_id = str(uuid.uuid4())[:6]
        self.controller_addr = controller_addr
        self.worker_addr = worker_addr
        self.model_name = model_name or get_model_name_from_path(model_path)
        logger.info(f"Loading model {self.model_name} on worker {self.worker_id} ...")
        self.tokenizer, self.model, self.image_processor, self.context_len = (
            load_pretrained_model(model_path, model_base, self.model_name,
                                  load_8bit=load_8bit, load_4bit=load_4bit)
        )
        self.cfg = self.model.config
        if os.environ.get("TOKENPACKER_WARMUP", "1") == "1":
            logger.info("Warming up prefill/decode executables ...")
            n_crops = 1 if self.cfg.image_aspect_ratio != "slice" else self.cfg.patch_num + 1
            self.model.generator.warmup(n_crops=n_crops, speculative=speculative_k)
        self.semaphore = threading.Semaphore(limit_model_concurrency)
        self.speculative_k = speculative_k
        self.adapters = {}
        if lora_adapters:
            # multi-LoRA serving (serve/multi_lora.py): adapters load
            # unmerged and are selected per request (by name, or by
            # requesting the adapter as the model). Batcher-only feature.
            if scheduler == "none":
                raise ValueError(
                    "--lora adapters need a continuous/paged scheduler"
                )
            from tokenpacker_tpu.serve.multi_lora import load_adapter

            for name, path in lora_adapters.items():
                logger.info(f"Loading LoRA adapter {name} from {path}")
                self.adapters[name] = load_adapter(path, self.cfg)
        self.batcher = None
        if scheduler != "none":
            # continuous batching: up to scheduler_slots requests decode in
            # ONE batched device step per token (beyond the reference's
            # one-generate-at-a-time worker); 'paged' backs the slots with
            # the paged KV pool
            from tokenpacker_tpu.serve.scheduler import (
                ContinuousBatcher,
                PagedContinuousBatcher,
            )

            if scheduler == "paged":
                self.batcher = PagedContinuousBatcher(
                    self.model.params, self.cfg, self.tokenizer,
                    num_slots=scheduler_slots,
                    num_pages=max(2 * scheduler_slots * ((scheduler_max_len + 63) // 64), 16) + 1,
                    page_size=64,
                    max_pages_per_seq=max((scheduler_max_len + 63) // 64, 1),
                    speculative_k=speculative_k,
                    prefill_chunk_size=scheduler_prefill_chunk,
                    adapters=self.adapters or None,
                )
            else:
                self.batcher = ContinuousBatcher(
                    self.model.params, self.cfg, self.tokenizer,
                    num_slots=scheduler_slots, max_seq_len=scheduler_max_len,
                    prefill_chunk_size=scheduler_prefill_chunk,
                    speculative_k=speculative_k,
                    adapters=self.adapters or None,
                )
            self.batcher.start()
            logger.info(f"{scheduler} batching executor: {scheduler_slots} slots")
        self.queue_length = 0
        self._ql_lock = threading.Lock()
        self.call_ct = 0
        self.draining = False
        self.registered = not no_register
        if not no_register:
            self.register_to_controller()
            self.heart_beat_thread = threading.Thread(target=self._heartbeat_loop, daemon=True)
            self.heart_beat_thread.start()

    # -- controller protocol ----------------------------------------------

    def register_to_controller(self):
        logger.info("Register to controller")
        _post_json(
            self.controller_addr + "/register_worker",
            {
                "worker_name": self.worker_addr,
                "check_heart_beat": True,
                "worker_status": self.get_status(),
            },
        )

    def _heartbeat_loop(self):
        while True:
            time.sleep(WORKER_HEART_BEAT_INTERVAL)
            self.send_heart_beat()

    def send_heart_beat(self):
        logger.info(f"Send heart beat. Models: {[self.model_name]}. Queue: {self.queue_length}")
        try:
            ret = _post_json(
                self.controller_addr + "/receive_heart_beat",
                {"worker_name": self.worker_addr, "queue_length": self.queue_length},
            )
            if not ret.get("exist", False):
                self.register_to_controller()
        except Exception as e:
            logger.error(f"heart beat error: {e}")

    def get_status(self) -> dict:
        from tokenpacker_tpu.utils.profiling import GLOBAL_STATS

        out = {
            # adapters are addressable as models so the controller routes
            # by adapter name too (multi-LoRA serving)
            "model_names": [self.model_name]
            + sorted(getattr(self, "adapters", {})),
            "speed": 1,
            "queue_length": self.queue_length,
            "call_ct": self.call_ct,
            "phase_timings": GLOBAL_STATS.summary(),
        }
        prefix = getattr(self.batcher, "prefix", None)
        if prefix is not None:
            out.update(prefix.stats())
        return out

    # -- generation --------------------------------------------------------

    def generate_stream(self, params: dict):
        """Yields '\\0'-terminated JSON chunks ({'text', 'error_code'}).

        The FINAL chunk additionally carries 'finish_reason' ('stop' |
        'length') and 'usage' {prompt_tokens, completion_tokens,
        total_tokens} — consumed by the OpenAI-compatible gateway
        (serve/openai_api.py); the reference wire format (text +
        error_code on every chunk) is unchanged, extra keys are ignored
        by the web UI / CLI clients."""
        prompt = params["prompt"]
        images_b64 = params.get("images", None)
        temperature = float(params.get("temperature", 1.0))
        top_p = float(params.get("top_p", 1.0))
        # sampling-only top-k width; 0/absent = unfiltered. The reference
        # worker inherits top_k=50 implicitly from HF's GenerationConfig —
        # here it is explicit so the default path stays pure top-p
        top_k = int(params.get("top_k", 0)) or None
        # min-p cutoff (vLLM-style field; HF MinPLogitsWarper semantics,
        # applied after top-p); 0/absent = off
        min_p = float(params.get("min_p", 0.0)) or None
        # token-history penalties (generate.apply_penalties): HF
        # repetition_penalty + the OpenAI presence/frequency fields;
        # identity defaults keep the unpenalized paths bit-unchanged
        repetition_penalty = float(params.get("repetition_penalty", 1.0))
        presence_penalty = float(params.get("presence_penalty", 0.0))
        frequency_penalty = float(params.get("frequency_penalty", 0.0))
        # per-token logprobs (OpenAI gateway): None = off, N = include the
        # N most likely alternatives per token (raw-distribution
        # convention — generate.token_logprob_entry). Chunks gain a
        # "logprobs" list of entries for tokens new in that chunk.
        logprobs = params.get("logprobs")
        logprobs = int(logprobs) if logprobs is not None else None
        # deterministic sampling (the OpenAI `seed` field): token k always
        # draws with fold_in(PRNGKey(seed), k). Absent -> a fresh random
        # seed per request, so identical sampled prompts get independent
        # completions (the pre-r5 non-batcher path pinned PRNGKey(0) and
        # returned the SAME text for every identical sampled request)
        seed = params.get("seed")
        seed = int(seed) if seed is not None else None
        max_new_tokens = min(int(params.get("max_new_tokens", 256)), 1024)
        stop_str = params.get("stop", None)
        # multi-LoRA: explicit "adapter" field, or requesting an adapter
        # name as the model (the worker advertises adapters as models)
        adapter = params.get("adapter")
        if adapter is None and params.get("model") in getattr(self, "adapters", {}):
            adapter = params["model"]

        from tokenpacker_tpu.utils.profiling import GLOBAL_STATS

        t_start = time.perf_counter()
        try:
            crops_list, blocks = [], []
            n_prompt_imgs = prompt.count(DEFAULT_IMAGE_TOKEN)
            if images_b64:
                if len(images_b64) != n_prompt_imgs:
                    raise ValueError(
                        "Number of images does not match number of <image> tokens in prompt"
                    )
                from PIL import Image

                for b64 in images_b64:
                    img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
                    crops, hb, wb = process_image(
                        img, self.cfg.image_aspect_ratio, self.cfg.patch_num,
                        image_size=self.cfg.vision.image_size,
                    )
                    crops_list.append(crops)
                    blocks.append((hb, wb))

            ids = np.asarray(tokenizer_image_token(prompt, self.tokenizer), dtype=np.int64)
            mode = "slice" if self.cfg.image_aspect_ratio == "slice" else "single"
            sep_id = self.tokenizer.convert_tokens_to_ids(",")
            ret_id = self.tokenizer.convert_tokens_to_ids("\n")
            pad_id = self.tokenizer.pad_token_id or 0
            plan = build_splice_plan([ids], [blocks], self.cfg.tokens_per_view, mode,
                                     sep_id, ret_id, pad_id)
            spliced_len = int(plan.lengths[0])
            # clamp against context window (model_worker.py:168-171)
            budget = self.context_len - spliced_len - 8
            if budget <= 0:
                yield json.dumps(
                    {
                        "text": prompt + "Exceeds max token length. Please start a new conversation, thanks.",
                        "error_code": 0,
                    }
                ).encode() + b"\0"
                return
            max_new_tokens = min(max_new_tokens, budget)
            pad_to = pick_bucket(spliced_len)
            plan = build_splice_plan([ids], [blocks], self.cfg.tokens_per_view, mode,
                                     sep_id, ret_id, pad_id, pad_to=pad_to)
            images = (
                np.concatenate(crops_list, axis=0).transpose(0, 2, 3, 1) if crops_list else None
            )
            if stop_str is None or isinstance(stop_str, str):
                stop_strings = (stop_str,) if stop_str else ()
            else:  # OpenAI-style list of stop strings
                stop_strings = tuple(s for s in stop_str if s)
            generated = ""
            GLOBAL_STATS.record("preprocess", time.perf_counter() - t_start)
            mtr.WORKER_PREPROCESS.observe(time.perf_counter() - t_start)
            t_prefill = time.perf_counter()
            if adapter is not None and (
                getattr(self, "batcher", None) is None
                or adapter not in getattr(self, "adapters", {})
            ):
                raise ValueError(f"unknown LoRA adapter: {adapter}")
            if getattr(self, "batcher", None) is not None:
                yield from self._stream_via_batcher(
                    prompt,
                    {
                        "token_ids": plan.token_ids,
                        "is_image": plan.is_image,
                        "image_slot": plan.image_slot,
                        "lengths": plan.lengths,
                        "images": images,
                    },
                    max_new_tokens, temperature, top_p, stop_strings, t_prefill,
                    spliced_len, adapter=adapter, top_k=top_k, min_p=min_p,
                    repetition_penalty=repetition_penalty,
                    presence_penalty=presence_penalty,
                    frequency_penalty=frequency_penalty,
                    logprobs=logprobs, seed=seed,
                )
                return
            import secrets

            import jax as _jax

            rng_key = _jax.random.PRNGKey(
                seed & 0x7FFFFFFFFFFFFFFF if seed is not None
                else secrets.randbits(63))
            first = True
            n_toks = 0
            for item in self.model.generator.generate_stream(
                {
                    "token_ids": plan.token_ids,
                    "is_image": plan.is_image,
                    "image_slot": plan.image_slot,
                    "lengths": plan.lengths,
                    "images": images,
                },
                max_new_tokens=max_new_tokens,
                temperature=temperature,
                top_p=top_p,
                top_k=top_k,
                min_p=min_p,
                stop_strings=stop_strings,
                rng_key=rng_key,
                speculative=getattr(self, "speculative_k", 0),
                repetition_penalty=repetition_penalty,
                presence_penalty=presence_penalty,
                frequency_penalty=frequency_penalty,
                logprobs=logprobs,
            ):
                # with logprobs on, generate_stream yields (text, entry)
                text, entry = item if logprobs is not None else (item, None)
                if first:
                    GLOBAL_STATS.record("prefill_ttft", time.perf_counter() - t_prefill)
                    mtr.WORKER_TTFT.observe(time.perf_counter() - t_prefill)
                    t_decode = time.perf_counter()
                    first = False
                n_toks += 1
                generated = text
                payload = {"text": prompt + generated, "error_code": 0}
                if entry is not None:
                    payload["logprobs"] = [self._lp_json(entry)]
                yield json.dumps(payload).encode() + b"\0"
            if not first and n_toks > 1:
                per_tok = (time.perf_counter() - t_decode) / (n_toks - 1)
                GLOBAL_STATS.record("decode_per_token", per_tok)
                mtr.WORKER_DECODE_TOKEN.observe(per_tok)
            yield self._final_chunk(prompt + generated, spliced_len, n_toks, max_new_tokens)
        except ValueError as e:
            logger.error(f"ValueError: {e}")
            mtr.WORKER_ERRORS.inc()
            yield json.dumps(
                {"text": f"{e}\n(error_code: 1)", "error_code": 1}
            ).encode() + b"\0"
        except Exception as e:
            logger.error(f"Unknown error: {e}")
            mtr.WORKER_ERRORS.inc()
            yield json.dumps(
                {"text": f"internal error\n(error_code: 1)", "error_code": 1}
            ).encode() + b"\0"

    def _lp_json(self, entry: dict) -> dict:
        """Wire form of a generate.token_logprob_entry record: token ids
        resolved to token strings (tokenizer piece form when the tokenizer
        exposes it, else a single-id decode); "top" becomes
        ``[[id, token, logprob], ...]``. The gateway renders these into the
        OpenAI chat/legacy logprobs shapes."""
        if hasattr(self.tokenizer, "convert_ids_to_tokens"):
            tokstr = lambda i: str(self.tokenizer.convert_ids_to_tokens(i))
        else:
            tokstr = lambda i: self.tokenizer.decode([i])
        out = {"id": entry["id"], "token": tokstr(entry["id"]),
               "logprob": entry["logprob"]}
        if "top" in entry:
            out["top"] = [[i, tokstr(i), lp] for i, lp in entry["top"]]
        return out

    def _final_chunk(self, full_text: str, prompt_tokens: int,
                     completion_tokens: int, max_new_tokens: int,
                     finish: str | None = None) -> bytes:
        """Terminal stream chunk with OpenAI-style accounting (see
        generate_stream docstring). `finish` is the actual stream-end cause
        when the caller knows it (eos/stop-string → "stop", cap →
        "length"); when None it is inferred from the cap — only correct for
        paths whose token counter excludes EOS."""
        if finish is None:
            finish = "length" if completion_tokens >= max_new_tokens else "stop"
        mtr.WORKER_PROMPT_TOKENS.inc(prompt_tokens)
        mtr.WORKER_GENERATED_TOKENS.inc(completion_tokens)
        return json.dumps({
            "text": full_text,
            "error_code": 0,
            "finish_reason": finish,
            "usage": {
                "prompt_tokens": prompt_tokens,
                "completion_tokens": completion_tokens,
                "total_tokens": prompt_tokens + completion_tokens,
            },
        }).encode() + b"\0"

    def _stream_via_batcher(self, prompt, batch, max_new_tokens, temperature,
                            top_p, stop_strings, t_prefill, spliced_len=0,
                            adapter=None, top_k=None, min_p=None,
                            repetition_penalty=1.0,
                            presence_penalty=0.0, frequency_penalty=0.0,
                            logprobs=None, seed=None):
        """Stream through the continuous-batching executor: tokens arrive via
        the slot's on_token callback while other requests decode in the same
        device step; each slot samples with its own temperature and top_p."""
        import queue as _queue

        from tokenpacker_tpu.utils.profiling import GLOBAL_STATS

        q: _queue.Queue = _queue.Queue()
        fut = self.batcher.submit(
            batch, max_new_tokens=max_new_tokens,
            temperature=temperature if temperature > 0 else 0.0,
            top_p=top_p if 0.0 < top_p < 1.0 else None,
            top_k=top_k,
            min_p=min_p,
            seed=seed,
            on_token=q.put,
            adapter=adapter,
            repetition_penalty=repetition_penalty,
            presence_penalty=presence_penalty,
            frequency_penalty=frequency_penalty,
            logprobs=logprobs,
        )
        fut.add_done_callback(lambda f: q.put(None))
        # lp_entries on the request object are appended BEFORE on_token
        # fires (same batcher thread), so entry lp_i-1 exists when queue
        # token lp_i arrives
        lp_req = getattr(fut, "_tp_request", None)
        lp_i = 0
        eos = self.cfg.lm.eos_token_id
        toks: list[int] = []
        first = True
        n = 0  # non-EOS emitted tokens only (OpenAI completion_tokens)
        finish = None  # why the stream actually ended (ADVICE r4)
        text = ""
        t_decode = time.perf_counter()
        try:
            while True:
                try:
                    tok = q.get(timeout=600)
                except _queue.Empty:
                    self.batcher.cancel(fut)
                    yield json.dumps(
                        {"text": "scheduler timeout\n(error_code: 1)", "error_code": 1}
                    ).encode() + b"\0"
                    return
                if tok is None:
                    err = fut.exception() if fut.done() else None
                    if err is not None:
                        logger.error(f"batcher error: {err}")
                        yield json.dumps(
                            {"text": f"{err}\n(error_code: 1)", "error_code": 1}
                        ).encode() + b"\0"
                        return
                    break
                if first:
                    GLOBAL_STATS.record("prefill_ttft", time.perf_counter() - t_prefill)
                    mtr.WORKER_TTFT.observe(time.perf_counter() - t_prefill)
                    t_decode = time.perf_counter()
                    first = False
                lp_i += 1
                if tok == eos:
                    # even an EOS landing exactly at max_new_tokens is a
                    # natural stop, not a cap hit — and it is not billed
                    # (its logprob entry is skipped too — OpenAI excludes
                    # the stop token from logprobs content)
                    finish = "stop"
                    continue
                n += 1
                toks.append(int(tok))
                text = self.tokenizer.decode(toks, skip_special_tokens=True)
                stopped = False
                for s in stop_strings:
                    if s and s in text:
                        text = text.split(s)[0]
                        stopped = True
                payload = {"text": prompt + text, "error_code": 0}
                if (logprobs is not None and lp_req is not None
                        and lp_i <= len(lp_req.lp_entries)):
                    payload["logprobs"] = [
                        self._lp_json(lp_req.lp_entries[lp_i - 1])]
                yield json.dumps(payload).encode() + b"\0"
                if stopped:
                    # free the slot NOW — the client has its answer; without
                    # this the batcher decodes on to max_new_tokens
                    finish = "stop"
                    self.batcher.cancel(fut)
                    break
        except GeneratorExit:
            # client disconnected mid-stream: stop burning decode steps
            self.batcher.cancel(fut)
            raise
        if n > 1:
            per_tok = (time.perf_counter() - t_decode) / (n - 1)
            GLOBAL_STATS.record("decode_per_token", per_tok)
            mtr.WORKER_DECODE_TOKEN.observe(per_tok)
        if finish is None:
            finish = "length" if n >= max_new_tokens else "stop"
        yield self._final_chunk(prompt + text, spliced_len, n, max_new_tokens,
                                finish=finish)

    def drain(self, timeout: float = 60.0):
        """Graceful shutdown: deregister from the controller (no new
        dispatches), refuse new requests, wait for in-flight generations,
        then stop the batcher. The reference has no drain path — a killed
        worker just times out of the controller's 30 s heartbeat window,
        failing every request dispatched to it in between."""
        self.draining = True
        if self.controller_addr and getattr(self, "registered", True):
            try:
                _post_json(
                    self.controller_addr + "/deregister_worker",
                    {"worker_name": self.worker_addr},
                )
            except Exception as e:
                logger.error(f"deregister failed (continuing drain): {e}")
        deadline = time.time() + timeout
        while self.queue_length > 0 and time.time() < deadline:
            time.sleep(0.25)
        if self.queue_length:
            logger.warning(
                f"drain timeout with {self.queue_length} requests in flight"
            )
        if self.batcher is not None:
            self.batcher.stop()
        logger.info("worker drained")

    def generate_stream_gate(self, params: dict):
        if getattr(self, "draining", False):
            yield json.dumps(
                {"text": "worker is shutting down", "error_code": 1}
            ).encode() + b"\0"
            return
        mtr.WORKER_REQUESTS.inc()
        with self._ql_lock:
            self.queue_length += 1
            mtr.WORKER_QUEUE.set(self.queue_length)
        self.semaphore.acquire()
        try:
            self.call_ct += 1
            yield from self.generate_stream(params)
        finally:
            self.semaphore.release()
            with self._ql_lock:
                self.queue_length -= 1
                mtr.WORKER_QUEUE.set(self.queue_length)


def make_handler(worker: ModelWorker):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _read_json(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def do_GET(self):
            if self.path.rstrip("/") == "/metrics":
                # refresh point-in-time gauges from live worker state
                mtr.WORKER_QUEUE.set(worker.queue_length)
                prefix = getattr(worker.batcher, "prefix", None)
                if prefix is not None:
                    for k, v in prefix.stats().items():
                        mtr.WORKER_PREFIX.set(v, stat=k.removeprefix("prefix_"))
                mtr.send_metrics_response(self)
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            body = self._read_json()
            route = self.path.rstrip("/")
            if route == "/worker_get_status":
                data = json.dumps(worker.get_status()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            elif route == "/worker_generate_stream":
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.end_headers()
                gen = worker.generate_stream_gate(body)
                try:
                    for chunk in gen:
                        self.wfile.write(chunk)
                        self.wfile.flush()
                except (BrokenPipeError, ConnectionResetError):
                    pass  # client disconnected mid-stream
                finally:
                    # closing the generator raises GeneratorExit inside it,
                    # which cancels the batcher slot (no tokens decode for
                    # a client that walked away)
                    gen.close()
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="localhost")
    parser.add_argument("--port", type=int, default=21002)
    parser.add_argument("--worker-address", default="http://localhost:21002")
    parser.add_argument("--controller-address", default="http://localhost:21001")
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--model-base", default=None)
    parser.add_argument("--model-name", default=None)
    parser.add_argument("--limit-model-concurrency", type=int, default=5)
    parser.add_argument("--no-register", action="store_true")
    parser.add_argument("--load-8bit", action="store_true")
    parser.add_argument("--load-4bit", action="store_true")
    parser.add_argument("--scheduler", default="none",
                        choices=["none", "continuous", "paged"])
    parser.add_argument("--scheduler-slots", type=int, default=4)
    parser.add_argument("--scheduler-max-len", type=int, default=1024)
    parser.add_argument("--scheduler-prefill-chunk", type=int, default=256,
                        help="0 disables chunked admission (whole-prompt prefill)")
    parser.add_argument("--lora", action="append", default=[], metavar="NAME=PATH",
                        help="load a LoRA adapter for multi-LoRA serving "
                             "(repeatable). Requests select it via the "
                             "'adapter' field or by using NAME as the model; "
                             "the worker also advertises NAME to the "
                             "controller. Needs --scheduler continuous|paged")
    parser.add_argument("--speculative-k", type=int, default=0,
                        help="prompt-lookup speculative decoding draft length "
                             "for greedy requests (direct streaming path and "
                             "both schedulers; 0 disables)")
    parser.add_argument("--kv-cache", default="auto", choices=["auto", "int8"],
                        help="KV cache storage: int8 stores K/V with "
                             "per-(position, head) absmax scales "
                             "(ops/kv_quant) — halves cache HBM, enabling "
                             "HD-length multi-slot serving on one chip; "
                             "llama-family only")
    parser.add_argument("--compile-cache", default=None, metavar="DIR|off",
                        help="persistent XLA compilation cache directory "
                             "(default ~/.cache/tokenpacker_tpu/xla, or "
                             "TOKENPACKER_COMPILE_CACHE). Makes worker "
                             "restarts skip recompilation; 'off' disables")
    args = parser.parse_args(argv)
    import os

    from tokenpacker_tpu.utils.compile_cache import enable_compilation_cache

    cache_dir = enable_compilation_cache(args.compile_cache)
    if cache_dir:
        logger.info(f"persistent compilation cache: {cache_dir}")
    if args.kv_cache == "int8":
        # process-level: read by models/llama.kv_cache_dtype at every cache
        # creation site (batcher slots, chunked-admission staging, prefill)
        os.environ["TOKENPACKER_KV_CACHE"] = "int8"
    from tokenpacker_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    worker = ModelWorker(
        args.controller_address,
        args.worker_address,
        args.model_path,
        args.model_base,
        args.model_name,
        args.limit_model_concurrency,
        args.no_register,
        args.load_8bit,
        args.load_4bit,
        scheduler=args.scheduler,
        scheduler_slots=args.scheduler_slots,
        scheduler_max_len=args.scheduler_max_len,
        scheduler_prefill_chunk=args.scheduler_prefill_chunk or None,
        speculative_k=args.speculative_k,
        lora_adapters=dict(s.split("=", 1) for s in args.lora) or None,
    )
    server = ThreadingHTTPServer((args.host, args.port), make_handler(worker))

    import signal

    def _graceful(signum, frame):
        logger.info(f"signal {signum}: draining worker")
        # drain + shutdown off the signal handler thread (server.shutdown()
        # deadlocks if called from within serve_forever's own thread)
        threading.Thread(
            target=lambda: (worker.drain(), server.shutdown()), daemon=True
        ).start()

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _graceful)
    logger.info(f"worker listening on {args.host}:{args.port}")
    server.serve_forever()
    logger.info("worker exited cleanly")


if __name__ == "__main__":
    main()
