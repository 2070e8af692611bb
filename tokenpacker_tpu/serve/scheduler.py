"""Continuous-batching executor — slot-based shared-cache serving.

Goes beyond the reference's one-request-per-generate worker
(model_worker.py): up to `num_slots` requests decode together in ONE
batched step per token, and new requests are admitted into free slots
between steps (their prefill runs batch-1, then the prefilled KV rows are
copied into the slot). Per-slot sequences are cache-contiguous, so each
slot advances independently (generate.decode_step_cb).

Usage:
    batcher = ContinuousBatcher(params, cfg, tokenizer, num_slots=8)
    batcher.start()
    fut = batcher.submit(splice_batch, max_new_tokens=64)
    tokens = fut.result()          # list[int]
    batcher.stop()

Streaming: pass `on_token=callable(token_id)`.
"""

from __future__ import annotations

import math
import os
import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import TokenPackerVLMConfig
from tokenpacker_tpu.generate import (
    decode_step_cb_donated,
    device_batch,
    insert_into_cache,
    prefill,
    prefill_chunk,
    sample_tokens,
    sample_tokens_per_row,
)
from tokenpacker_tpu.models.llama import KVCache

# speculative backoff tuning (ContinuousBatcher): below SPEC_EMA_THRESHOLD
# accepted drafts per greedy slot per round, run plain decode for
# SPEC_BACKOFF_ROUNDS before retrying speculation
SPEC_EMA_THRESHOLD = 0.15
SPEC_BACKOFF_ROUNDS = 32


@dataclass
class _Request:
    batch: dict  # single-sample splice-plan arrays (+ images)
    max_new_tokens: int
    temperature: float
    top_p: float | None
    future: Future
    on_token: object = None
    top_k: int | None = None  # sampling-only top-k width (HF warper order)
    min_p: float | None = None  # min-p cutoff, applied after top-p (HF order)
    # deterministic sampling (the OpenAI `seed` field): token k draws with
    # fold_in(PRNGKey(seed), k), independent of slot placement and
    # co-scheduled traffic (sample_tokens_per_row seeds/steps)
    seed: int | None = None
    adapter: str | None = None  # multi-LoRA serving (serve/multi_lora.py)
    # token-history logit penalties (generate.apply_penalties): HF
    # repetition_penalty + the OpenAI presence/frequency fields; identity
    # values cost nothing (the penalty arrays are only built/shipped when
    # some active slot is penalized)
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    # per-token logprob recording (generate.token_logprob_entry, raw-
    # distribution convention): None = off, N = include N top alternatives.
    # Entries land in lp_entries 1:1 with emitted tokens, appended BEFORE
    # on_token fires (same batcher thread) so streaming consumers can read
    # entry i as soon as token i arrives.
    logprobs: int | None = None
    lp_entries: list = field(default_factory=list)
    cancelled: bool = False  # set from any thread; honored before the next
    # decode step (client disconnect / stop-string satisfied)
    produced: int = 0
    tokens: list = field(default_factory=list)

    @property
    def has_penalties(self) -> bool:
        return (self.repetition_penalty != 1.0 or self.presence_penalty != 0.0
                or self.frequency_penalty != 0.0)

    ctx: list = field(default_factory=list)  # prompt+generated ids for
    # prompt-lookup drafting (-1 at image positions); maintained only when
    # the batcher speculates


class PagedContinuousBatcher:
    """Continuous batching over a paged KV pool (ops/paged_kv.py): pages
    allocate on demand as sequences grow and free on completion, so HBM
    holds sum(active lengths) of KV instead of slots × max_seq_len."""

    def __init__(
        self,
        params,
        cfg: TokenPackerVLMConfig,
        tokenizer=None,
        num_slots: int = 8,
        num_pages: int = 256,
        page_size: int = 64,  # one page = one KV-block DMA in the Pallas
        # paged-attention kernel; measured on v5e (int8 7B, 8 slots):
        # ps=64 -> 292 agg tok/s vs 186 (XLA gather) — small vLLM-style
        # pages (16) fragment the grid and lose (267 vs 285)
        max_pages_per_seq: int = 16,
        temperature: float = 0.0,
        speculative_k: int = 0,
        prefix_cache: bool | None = None,
        prefill_chunk_size: int | None = None,
        adapters: dict | None = None,
    ):
        """speculative_k: prompt-lookup speculation over the paged pool —
        verify rounds (ops/paged_kv.paged_verify_step) score k+1 tokens per
        sequence through the page tables (attention takes the gather path;
        plain/backoff rounds keep the Pallas paged kernel). Page growth runs
        with a k-token lookahead. Same greedy-parity + adaptive-backoff
        semantics as ContinuousBatcher.

        prefix_cache: automatic prefix caching (serve/prefix_cache.py) —
        full prompt pages are content-addressed and shared across requests;
        a repeat prefix skips its share of prefill (and the vision encode
        when every image token is inside the cached prefix). Default ON
        (TOKENPACKER_PREFIX_CACHE=0 opts out).

        prefill_chunk_size: chunked admissions like the dense batcher's —
        one prompt chunk per loop iteration interleaved with active slots'
        decode steps. Composes with the prefix cache: only the un-cached
        suffix is chunked (chunking starts at the matched-prefix offset)."""
        from tokenpacker_tpu.ops.paged_kv import PagedKV, PageAllocator

        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.num_slots = num_slots
        self.page_size = page_size
        self.max_pages_per_seq = max_pages_per_seq
        self.temperature = temperature
        self.queue: queue.Queue[_Request] = queue.Queue()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.dead: Exception | None = None
        from tokenpacker_tpu.models.llama import kv_cache_dtype

        self.paged = PagedKV.create(
            cfg.lm, num_pages, page_size, num_slots, max_pages_per_seq,
            kv_cache_dtype(cfg.dtype, family=cfg.lm.model_family),
        )
        self.allocator = PageAllocator(num_pages)
        self.slot_pages: list[list[int]] = [[] for _ in range(num_slots)]
        self.slots: list[_Request | None] = [None] * num_slots
        self.next_tokens = np.zeros((num_slots,), np.int32)
        self._rng = jax.random.PRNGKey(0)
        self.speculative_k = speculative_k
        self._spec_accept_ema = 1.0
        self._spec_backoff = 0
        self._spec_fail_streak = 0
        self.prefill_chunk_size = prefill_chunk_size
        self._pending = None  # in-progress chunked admission state
        if prefix_cache is None:
            prefix_cache = os.environ.get("TOKENPACKER_PREFIX_CACHE", "1") not in (
                "0", "off",
            )
        if prefix_cache:
            from tokenpacker_tpu.serve.prefix_cache import PrefixCache

            self.prefix: PrefixCache | None = PrefixCache(page_size)
        else:
            self.prefix = None
        self._pen = None  # token-history penalty rows, allocated lazily
        self._init_slot_lora(adapters)

    # -- token-history penalties (generate.apply_penalties) -----------------

    def _pen_setup(self, slot: int, req: _Request):
        """Initialize the slot's penalty rows at admission. The [N, V]
        count / prompt-presence arrays are allocated lazily on the first
        penalized request and shipped to the sampler only while some active
        slot is penalized — unpenalized serving never pays for them."""
        if not req.has_penalties and self._pen is None:
            return
        v = self.cfg.lm.vocab_size
        if self._pen is None:
            self._pen = {
                "counts": np.zeros((self.num_slots, v), np.int32),
                "prompt": np.zeros((self.num_slots, v), bool),
            }
        self._pen["counts"][slot] = 0
        self._pen["prompt"][slot] = False
        if req.has_penalties:
            from tokenpacker_tpu.generate import prompt_presence_mask

            self._pen["prompt"][slot] = prompt_presence_mask(req.batch, v)[0]

    def _pen_first_logits(self, slot: int, req: _Request, logits):
        """Penalize a fresh admission's batch-1 prompt logits (the slot's
        counts are zero, so only the prompt-presence repetition term can
        fire — presence/frequency count generated tokens only)."""
        if not req.has_penalties:
            return logits
        from tokenpacker_tpu.generate import apply_penalties

        return apply_penalties(
            logits, self._pen["counts"][slot][None],
            self._pen["prompt"][slot][None], req.repetition_penalty,
            req.presence_penalty, req.frequency_penalty,
        )

    def _pen_count(self, slot: int, req: _Request, tok: int):
        if (self._pen is not None and req.has_penalties
                and 0 <= tok < self._pen["counts"].shape[1]):
            self._pen["counts"][slot, tok] += 1

    def _pen_apply(self, logits):
        """Penalize a batched decode step's [N, V] logits. Rows whose
        request has no penalties carry identity values (rep=1, pres/freq=0)
        so their distribution is bit-unchanged; when NO active slot is
        penalized the call is a pure pass-through (no host->device
        traffic)."""
        if self._pen is None or not any(
                r is not None and r.has_penalties for r in self.slots):
            return logits
        from tokenpacker_tpu.generate import apply_penalties

        reps = np.ones(self.num_slots, np.float32)
        press = np.zeros(self.num_slots, np.float32)
        freqs = np.zeros(self.num_slots, np.float32)
        for i, r in enumerate(self.slots):
            if r is not None and r.has_penalties:
                reps[i] = r.repetition_penalty
                press[i] = r.presence_penalty
                freqs[i] = r.frequency_penalty
        return apply_penalties(
            logits, self._pen["counts"], self._pen["prompt"], reps, press,
            freqs,
        )

    # -- deterministic per-request sampling (OpenAI `seed`) -----------------

    def _seed_key(self, req: _Request, step: int, shared_key):
        """Admission-time sampling key: a seeded request draws its token
        `step` with fold_in(PRNGKey(seed), step) — the same rule
        sample_tokens_per_row applies via seeds/steps — so the sequence is
        reproducible regardless of slot placement; unseeded requests keep
        the shared split."""
        if req.seed is None:
            return shared_key
        return jax.random.fold_in(
            jax.random.PRNGKey(req.seed & 0x7FFFFFFF), step)

    def _seed_arrays(self):
        """(seeds, steps) rows for the per-row sampler, or (None, None)
        when no active slot pinned a seed (zero cost)."""
        if not any(r is not None and r.seed is not None for r in self.slots):
            return None, None
        seeds = np.full(self.num_slots, -1, np.int32)
        steps = np.zeros(self.num_slots, np.int32)
        for i, r in enumerate(self.slots):
            if r is not None and r.seed is not None:
                seeds[i] = r.seed & 0x7FFFFFFF
                steps[i] = r.produced
        return seeds, steps

    # -- per-token logprob recording ----------------------------------------

    def _lp_record(self, logits, toks):
        """Append raw-distribution logprob entries for every active slot
        that asked (req.logprobs is not None). `logits` are the step's RAW
        [N, V] logits (pre-penalty — generate.token_logprob_entry's
        convention); `toks` the sampled token per row. No device work when
        no slot asked."""
        reqs = [(i, r) for i, r in enumerate(self.slots)
                if r is not None and r.logprobs is not None]
        if not reqs:
            return
        n_top = max(r.logprobs for _, r in reqs)
        lp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
        chosen = np.asarray(jnp.take_along_axis(
            lp, jnp.asarray(np.asarray(toks))[:, None], axis=-1))[:, 0]
        if n_top > 0:
            top_lps, top_ids = jax.lax.top_k(lp, n_top)
            top_lps, top_ids = np.asarray(top_lps), np.asarray(top_ids)
        for i, r in reqs:
            e = {"id": int(toks[i]), "logprob": float(chosen[i])}
            if r.logprobs > 0:
                e["top"] = [(int(top_ids[i, j]), float(top_lps[i, j]))
                            for j in range(r.logprobs)]
            r.lp_entries.append(e)

    def _lp_first(self, req: _Request, logits, tok: int):
        """Admission-time entry for the first token (batch-1 prompt
        logits)."""
        if req.logprobs is not None:
            from tokenpacker_tpu.generate import token_logprob_entry

            req.lp_entries.append(
                token_logprob_entry(logits[0], tok, req.logprobs))

    # -- multi-LoRA serving (serve/multi_lora.py) ---------------------------

    def _init_slot_lora(self, adapters: dict | None):
        """adapters: {name: multi_lora.Adapter} — when set, every request
        may pick one (submit(..., adapter=name)); decode runs with the
        slot-selection overlay params and the fused decode kernel gates
        itself off (XLA path carries the per-slot term)."""
        self.base_params = self.params
        self.slot_lora = None
        if adapters:
            from tokenpacker_tpu.serve.multi_lora import SlotLora

            self.slot_lora = SlotLora(
                self.base_params, self.cfg, adapters, self.num_slots,
                dtype=self.cfg.dtype,
            )
            self.params = self.slot_lora.overlay(self.base_params)

    def _admission_params(self, req: _Request):
        """Prefill-time params for one request: batch-1 selector row plus
        the adapter's projector override (non-LoRA trainables)."""
        if self.slot_lora is None:
            return self.params
        return self.slot_lora.prefill_params(self.base_params, req.adapter)

    def _bind_slot_adapter(self, slot: int, req: _Request):
        if self.slot_lora is not None:
            self.slot_lora.set_slot(slot, req.adapter)
            self.params = self.slot_lora.overlay(self.base_params)

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)

    def _run(self):
        """_loop with a crash net: a device/pool error fails every in-flight
        and queued future instead of silently wedging clients."""
        try:
            self._loop()
        except BaseException as e:  # noqa: BLE001
            self.dead = e
            err = RuntimeError(f"batcher loop died: {e!r}")
            for req in self.slots:
                if req is not None and not req.future.done():
                    req.future.set_exception(err)
            while True:
                try:
                    req = self.queue.get_nowait()
                except queue.Empty:
                    break
                if not req.future.done():
                    req.future.set_exception(err)

    def _admit_safe(self, slot: int, req: _Request):
        """Admission crash net: a request dying during its own prefill must
        fail ITS future too (it is neither in a slot nor in the queue when
        _run's net fires)."""
        try:
            self._admit(slot, req)
        except BaseException as e:  # noqa: BLE001
            if not req.future.done():
                req.future.set_exception(RuntimeError(f"batcher loop died: {e!r}"))
            raise

    def _alloc(self, n: int) -> list[int]:
        """Pool alloc, evicting LRU prefix-cache blocks under pressure."""
        if self.prefix is not None and self.allocator.available() < n:
            self.prefix.evict_until_available(self.allocator, n)
        return self.allocator.alloc(n)

    def _padded_plan(self, b, l_pad: int):
        """Pad a batch-1 splice plan's per-token arrays out to l_pad."""
        l = b["token_ids"].shape[1]

        def padded(name, fill=0):
            arr = np.full((1, l_pad), fill, np.asarray(b[name]).dtype)
            arr[:, :l] = b[name]
            return jnp.asarray(arr)

        return padded("token_ids"), padded("is_image", False), padded("image_slot")

    def _plan_admission(self, b, adapter: str | None = None):
        """Shared admission planning: page-aligned pad + prefix-cache match.
        Returns (l_pad, true_len, m, shared, hashes) — m cached blocks whose
        pages can be mapped instead of prefilled. `adapter` seeds the block
        hashes: KV depends on the serving adapter, so identical prompts
        under different adapters must never share pages."""
        l = b["token_ids"].shape[1]
        ps = self.page_size
        # align to lcm(page_size, cache tile): prefill() rounds its cache
        # length up to the KV dtype's sublane tile (8 bf16 / 32 int8), so
        # admission page math must agree with the cache shape prefill
        # actually returns (ADVICE r3: page_size=4 + a 12-token pad produced
        # a 16-wide cache and crashed insert_prefill)
        from tokenpacker_tpu.generate import cache_len_tile
        from tokenpacker_tpu.models.llama import kv_cache_dtype

        align = math.lcm(ps, cache_len_tile(
            kv_cache_dtype(self.cfg.dtype, family=self.cfg.lm.model_family)))
        l_pad = ((l + align - 1) // align) * align
        # bound the compile-cache cardinality (ADVICE r4): prefill and
        # prefix_admit mark l_pad/chunk_len static, so every distinct padded
        # length compiles a fresh program (minutes each over the tunnel).
        # Snap to the generate.pick_bucket sizes whenever that fits the
        # per-sequence page budget and at most doubles the footprint — the
        # extra pages are plain padding (attention is length-masked, spare
        # pages return at release); tiny configs (tests, short caps) skip.
        from tokenpacker_tpu.generate import pick_bucket

        bucketed = ((pick_bucket(l_pad) + align - 1) // align) * align
        if bucketed // ps <= self.max_pages_per_seq and bucketed <= 2 * l_pad:
            l_pad = max(l_pad, bucketed)
        assert l_pad // ps <= self.max_pages_per_seq
        true_len = int(np.asarray(b["lengths"])[0])

        m, shared, hashes = 0, [], []
        if self.prefix is not None:
            from tokenpacker_tpu.serve.prefix_cache import block_hashes, image_digest

            im_h = np.asarray(b["is_image"])[0, :true_len]
            digest = (image_digest(b["images"])
                      if b.get("images") is not None and im_h.any() else b"")
            # at least one prompt token is always recomputed (admission
            # needs last-token logits), hence the (true_len - 1) // ps cap
            hashes = block_hashes(
                np.asarray(b["token_ids"])[0, :true_len], im_h,
                np.asarray(b["image_slot"])[0, :true_len], digest, ps,
                limit=(true_len - 1) // ps,
                seed=adapter.encode() if adapter else b"",
            )
            m, shared = self.prefix.match(hashes)
        return l_pad, true_len, m, shared, hashes

    def _suffix_visual(self, b, start: int, true_len: int, params=None):
        """Projector output for an admission whose positions before `start`
        are already cached: the ViT+projector encode is skipped entirely
        when no image token falls in [start, true_len). `params` carries a
        per-request adapter overlay (projector override) when set."""
        from tokenpacker_tpu.models.vlm import encode_images

        needs_vision = b.get("images") is not None and bool(
            np.any(np.asarray(b["is_image"])[0, start:true_len])
        )
        if needs_vision:
            return encode_images(
                params if params is not None else self.params,
                self.cfg, jnp.asarray(b["images"], self.cfg.dtype)
            )
        if self.prefix is not None and b.get("images") is not None:
            self.prefix.vision_skipped += 1
        return jnp.zeros(
            (1, self.cfg.tokens_per_view, self.cfg.lm.hidden_size), self.cfg.dtype
        )

    def _finish_bookkeeping(self, slot: int, req: _Request, logits,
                            true_len: int, all_pages: list[int], m: int,
                            hashes: list[bytes]):
        """Host-side admission tail: sample the first token, record the
        slot's pages, register full prompt blocks with the prefix cache."""
        self._pen_setup(slot, req)
        self._rng, sub = jax.random.split(self._rng)
        tok = int(np.asarray(sample_tokens(
            self._pen_first_logits(slot, req, logits),
            req.temperature, req.top_p, self._seed_key(req, 0, sub),
            top_k=req.top_k, min_p=req.min_p))[0])
        self._lp_first(req, logits, tok)
        self._bind_slot_adapter(slot, req)
        self.slot_pages[slot] = all_pages
        if self.prefix is not None:
            self.prefix.register(hashes, all_pages[: len(hashes)], self.allocator)
            self.prefix.tokens_reused += m * self.page_size
        self.slots[slot] = req
        self._init_ctx(req, true_len)
        self.next_tokens[slot] = tok
        self._emit(slot, tok)

    def _finish_admission(self, slot: int, req: _Request, small_cache, logits,
                          l_pad: int, true_len: int, m: int,
                          shared: list[int], hashes: list[bytes]):
        """Common admission tail: move the dense prefilled rows [m·ps,
        l_pad) into fresh pages, map the m shared prefix pages, then the
        host bookkeeping."""
        from tokenpacker_tpu.ops.paged_kv import insert_prefill, map_blocks

        fresh = self._alloc(l_pad // self.page_size - m)
        self.paged = insert_prefill(
            self.paged, small_cache, slot, fresh, true_len, first_block=m
        )
        self.paged = map_blocks(self.paged, slot, 0, shared)
        self._finish_bookkeeping(
            slot, req, logits, true_len, list(shared) + fresh, m, hashes
        )

    def _admit(self, slot: int, req: _Request):
        if req.cancelled:
            if not req.future.done():
                req.future.set_result([])
            return
        b = req.batch
        l_pad, true_len, m, shared, hashes = self._plan_admission(b, req.adapter)
        if m > 0:
            self._admit_with_prefix(slot, req, l_pad, true_len, m, shared, hashes)
            return

        token_ids, is_image, image_slot = self._padded_plan(b, l_pad)
        dev_batch = {
            "token_ids": token_ids,
            "is_image": is_image,
            "image_slot": image_slot,
            "lengths": jnp.asarray(b["lengths"], jnp.int32),
            "images": jnp.asarray(b["images"], self.cfg.dtype)
            if b.get("images") is not None
            else None,
        }
        logits, small_cache = prefill(
            self._admission_params(req), self.cfg, dev_batch, l_pad
        )
        self._finish_admission(
            slot, req, small_cache, logits, l_pad, true_len, 0, [], hashes
        )

    def _admit_with_prefix(self, slot: int, req: _Request, l_pad: int,
                           true_len: int, m: int, shared: list[int],
                           hashes: list[bytes]):
        """Suffix-only admission on a prefix-cache hit, as ONE device
        dispatch (ops/paged_kv.prefix_admit): map the m cached blocks,
        gather them into a dense prefix, prefill ONLY positions [m·ps,
        l_pad), and write the suffix blocks as slot-owned pages. When no
        image token falls in the suffix the ViT+projector encode is skipped
        entirely (the image embeddings live in the cached KV)."""
        from tokenpacker_tpu.ops.paged_kv import prefix_admit

        b = req.batch
        start = m * self.page_size
        # the slot's claim on the shared pages — taken BEFORE any alloc so
        # pool-pressure eviction cannot free them mid-admission
        for pid in shared:
            self.allocator.incref(pid)
        fresh = self._alloc(l_pad // self.page_size - m)

        token_ids, is_image, image_slot = self._padded_plan(b, l_pad)
        pp = self._admission_params(req)
        visual = self._suffix_visual(b, start, true_len, pp)
        logits, self.paged = prefix_admit(
            self.paged, pp, self.cfg,
            jnp.asarray(shared, jnp.int32), jnp.asarray(fresh, jnp.int32),
            visual, token_ids[:, start:], is_image[:, start:],
            image_slot[:, start:], jnp.asarray(slot, jnp.int32),
            jnp.asarray(true_len, jnp.int32), m, l_pad - start,
        )
        self._finish_bookkeeping(
            slot, req, logits, true_len, list(shared) + fresh, m, hashes
        )

    # -- chunked admission (prefill interleaved with decode steps) ----------

    def _start_pending(self, slot: int, req: _Request):
        """Begin a chunked paged admission: plan + prefix match + vision
        encode + prefix gather now; the prompt chunks run one per loop
        iteration (_step_pending) so active slots keep decoding."""
        from tokenpacker_tpu.models.llama import KVCache, kv_cache_dtype
        from tokenpacker_tpu.ops.paged_kv import gather_prefix

        if req.cancelled:
            if not req.future.done():
                req.future.set_result([])
            return
        b = req.batch
        l_pad, true_len, m, shared, hashes = self._plan_admission(b, req.adapter)
        # the slot's claim on the shared pages — taken BEFORE any alloc so
        # pool-pressure eviction cannot free them mid-admission
        for pid in shared:
            self.allocator.incref(pid)
        start0 = m * self.page_size
        token_ids, is_image, image_slot = self._padded_plan(b, l_pad)
        pp = self._admission_params(req)
        visual = self._suffix_visual(b, start0, true_len, pp)
        if m > 0:
            small = gather_prefix(self.paged, shared, l_pad)
        else:
            small = KVCache.create(
                self.cfg.lm, 1, l_pad,
                kv_cache_dtype(self.cfg.dtype, family=self.cfg.lm.model_family),
            )
        self._pending = {
            "req": req, "slot": slot, "cache": small, "visual": visual,
            "offset": start0, "start0": start0, "true_len": true_len,
            "l_pad": l_pad, "m": m, "shared": shared, "hashes": hashes,
            "token_ids": token_ids, "is_image": is_image,
            "image_slot": image_slot, "params": pp,
        }

    def _step_pending(self):
        from tokenpacker_tpu.models.lm_api import lm_logits

        p = self._pending
        l_pad, start0 = p["l_pad"], p["start0"]
        # fixed chunk length for a stable jit signature, clamped so the
        # window NEVER re-enters the cached prefix [0, start0): those rows
        # would need the (possibly skipped) vision encode to recompute
        cs = min(self.prefill_chunk_size, l_pad - start0)
        start = max(start0, min(p["offset"], l_pad - cs))
        hidden, p["cache"] = prefill_chunk(
            p["params"], self.cfg, p["cache"], p["visual"],
            jax.lax.dynamic_slice_in_dim(p["token_ids"], start, cs, 1),
            jax.lax.dynamic_slice_in_dim(p["is_image"], start, cs, 1),
            jax.lax.dynamic_slice_in_dim(p["image_slot"], start, cs, 1),
            jnp.asarray(start, jnp.int32), cs,
        )
        p["offset"] = start + cs
        if p["offset"] >= p["true_len"]:
            logits = lm_logits(
                p["params"]["lm"], self.cfg.lm, hidden[:, p["true_len"] - 1 - start]
            )
            self._pending = None
            self._finish_admission(
                p["slot"], p["req"], p["cache"], logits, l_pad,
                p["true_len"], p["m"], p["shared"], p["hashes"],
            )

    def _step_pending_safe(self):
        p = self._pending
        try:
            self._step_pending()
        except BaseException as e:  # noqa: BLE001
            self._pending = None
            if p is not None and not p["req"].future.done():
                p["req"].future.set_exception(RuntimeError(f"batcher loop died: {e!r}"))
            raise

    def _start_pending_safe(self, slot: int, req: _Request):
        """Crash net for the planning/encode phase (mirrors _admit_safe)."""
        try:
            self._start_pending(slot, req)
        except BaseException as e:  # noqa: BLE001
            if not req.future.done():
                req.future.set_exception(RuntimeError(f"batcher loop died: {e!r}"))
            raise

    def _emit(self, slot: int, tok: int):
        req = self.slots[slot]
        req.tokens.append(tok)
        req.produced += 1
        self._pen_count(slot, req, tok)
        if self.speculative_k > 0:
            req.ctx.append(tok)
        if req.on_token is not None:
            req.on_token(tok)
        eos = self.cfg.lm.eos_token_id
        cur_len = int(np.asarray(self.paged.lengths)[slot])
        # with speculation a round writes up to k+1 positions past cur_len
        out_of_room = (
            (cur_len + 1 + self.speculative_k) // self.page_size
            >= self.max_pages_per_seq
        )
        if tok == eos or req.produced >= req.max_new_tokens or out_of_room:
            req.future.set_result(req.tokens)
            self._release_slot(slot)

    def _release_slot(self, slot: int):
        self.slots[slot] = None
        # Unmap before releasing: the freed pages may be re-allocated to a
        # growing sequence, and a stale table row would let this slot's
        # masked-but-still-issued decode writes corrupt them.
        self.paged = self.paged._replace(
            page_table=self.paged.page_table.at[slot].set(0)
        )
        self.allocator.release(self.slot_pages[slot])
        self.slot_pages[slot] = []

    def _reap_cancelled(self):
        """Free every cancelled request before the next device step: the
        future resolves with the tokens produced so far and the slot (and
        its pages / prefix-cache claims) returns to the pool. The reference
        has no cancellation at all — an abandoned stream decodes to
        max_new_tokens on the device."""
        for slot, req in enumerate(self.slots):
            if req is not None and req.cancelled:
                if not req.future.done():
                    req.future.set_result(req.tokens)
                self._release_slot(slot)
        p = self._pending
        if p is not None and p["req"].cancelled:
            self._pending = None
            if not p["req"].future.done():
                p["req"].future.set_result([])
            shared = p.get("shared")
            if shared:  # paged chunked admission holds prefix-page claims
                self.allocator.release(list(shared))

    def _grow_pages(self):
        """Map fresh pages for any slot whose next writes cross into unmapped
        logical blocks — with speculation, a round writes positions
        [len, len+k], so growth runs with a k-token lookahead."""
        from tokenpacker_tpu.ops.paged_kv import map_page

        lens = np.asarray(self.paged.lengths)
        for slot in range(self.num_slots):
            if self.slots[slot] is None:
                continue
            target = (int(lens[slot]) + self.speculative_k) // self.page_size
            target = min(target, self.max_pages_per_seq - 1)
            while len(self.slot_pages[slot]) <= target:
                (pid,) = self._alloc(1)
                block = len(self.slot_pages[slot])
                self.slot_pages[slot].append(pid)
                self.paged = map_page(self.paged, slot, block, pid)

    def _loop(self):
        from tokenpacker_tpu.ops.paged_kv import paged_decode_step_jit

        chunked = self.prefill_chunk_size is not None
        while not self._stop.is_set():
            self._reap_cancelled()
            if chunked:
                if self._pending is None:
                    for slot in range(self.num_slots):
                        if self.slots[slot] is None:
                            try:
                                req = self.queue.get_nowait()
                            except queue.Empty:
                                break
                            self._start_pending_safe(slot, req)
                            break
                if self._pending is not None:
                    self._step_pending_safe()
            else:
                for slot in range(self.num_slots):
                    if self.slots[slot] is None:
                        try:
                            req = self.queue.get_nowait()
                        except queue.Empty:
                            break
                        self._admit_safe(slot, req)
            active = np.array([r is not None for r in self.slots])
            if not active.any():
                if chunked and self._pending is not None:
                    continue  # keep chunking the admission
                try:
                    req = self.queue.get(timeout=0.05)
                except queue.Empty:
                    continue
                if chunked:
                    self._start_pending_safe(0, req)
                    continue
                self._admit_safe(0, req)
                active = np.array([r is not None for r in self.slots])
            if not active.any():
                continue

            self._grow_pages()
            has_greedy = any(
                r is not None and r.temperature <= 0.0
                and not r.has_penalties and r.logprobs is None
                for r in self.slots
            )
            if self.speculative_k > 0 and has_greedy:
                if self._spec_backoff > 0:
                    self._spec_backoff -= 1
                    if self._spec_backoff == 0:
                        self._spec_accept_ema = 1.0  # optimistic retry
                else:
                    self._verify_round(active)
                    continue
            logits, self.paged = paged_decode_step_jit(
                self.params, self.cfg, self.paged, jnp.asarray(self.next_tokens),
                jnp.asarray(active),
            )
            self._rng, sub = jax.random.split(self._rng)
            temps = np.array(
                [r.temperature if r is not None else 0.0 for r in self.slots],
                np.float32,
            )
            tps = np.array(
                [r.top_p if r is not None and r.top_p else 1.0 for r in self.slots],
                np.float32,
            )
            tks = np.array(
                [r.top_k if r is not None and r.top_k else 0 for r in self.slots],
                np.int32,
            )
            mps = np.array(
                [r.min_p if r is not None and r.min_p else 0.0 for r in self.slots],
                np.float32,
            )
            seeds, steps = self._seed_arrays()
            toks = np.asarray(sample_tokens_per_row(
                self._pen_apply(logits), temps, sub, tps, tks, mps,
                seeds, steps))
            self._lp_record(logits, toks)
            for slot in range(self.num_slots):
                if self.slots[slot] is not None:
                    self.next_tokens[slot] = int(toks[slot])
                    self._emit(slot, int(toks[slot]))

    def _verify_round(self, active):
        """Speculative round over the paged pool (verify via the page-gather
        attention path; see ops/paged_kv.paged_verify_step)."""
        from tokenpacker_tpu.ops.paged_kv import paged_verify_step_jit

        fed, dks = self._propose_fed()
        logits, self.paged = paged_verify_step_jit(
            self.params, self.cfg, self.paged, jnp.asarray(fed), jnp.asarray(active)
        )
        bursts, new_lens = self._accept_bursts(fed, dks, logits, self.paged.lengths)
        self.paged = self.paged._replace(lengths=jnp.asarray(new_lens))
        self._emit_bursts(bursts)


class ContinuousBatcher:
    def __init__(
        self,
        params,
        cfg: TokenPackerVLMConfig,
        tokenizer=None,
        num_slots: int = 8,
        max_seq_len: int = 1024,
        temperature: float = 0.0,
        prefill_chunk_size: int | None = None,
        speculative_k: int = 0,
        adapters: dict | None = None,
    ):
        """prefill_chunk_size: when set, admissions run CHUNKED prefill —
        one chunk of the new prompt per loop iteration, interleaved with the
        active slots' decode steps, so a long (e.g. HD) prompt no longer
        head-of-line blocks every running request for its whole prefill.

        speculative_k: when > 0, every decode step becomes a VERIFY step
        (speculative.verify_step_cb): each greedy slot feeds its last token
        plus up to k prompt-lookup draft tokens and advances by its own
        acceptance count — per-slot cache offsets make desynchronized
        advancement natural. Greedy parity is preserved per slot
        (tests/test_speculative.py); temperature>0 slots ride along
        advancing one sampled token per step."""
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.num_slots = num_slots
        self.max_seq_len = max_seq_len
        self.temperature = temperature
        self.speculative_k = speculative_k
        # adaptive backoff: a verify round costs ~1.28x a plain step, so on
        # low-acceptance workloads speculation is a net loss — track an EMA
        # of accepted drafts per greedy slot per round and fall back to
        # plain decode for SPEC_BACKOFF_ROUNDS when it drops, retrying after
        self._spec_accept_ema = 1.0
        self._spec_backoff = 0
        self._spec_fail_streak = 0  # doubles the backoff each re-trip
        self.queue: queue.Queue[_Request] = queue.Queue()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

        self.dead: Exception | None = None
        self.prefill_chunk_size = prefill_chunk_size
        self._pending = None  # in-progress chunked admission state
        from tokenpacker_tpu.models.llama import kv_cache_dtype

        self.cache = KVCache.create(
            cfg.lm, num_slots, max_seq_len,
            dtype=kv_cache_dtype(cfg.dtype, family=cfg.lm.model_family),
        )._replace(length=jnp.zeros((num_slots,), jnp.int32))
        self.slots: list[_Request | None] = [None] * num_slots
        self.next_tokens = np.zeros((num_slots,), np.int32)
        self._rng = jax.random.PRNGKey(0)
        self._pen = None  # token-history penalty rows, allocated lazily
        self._init_slot_lora(adapters)

    # -- public api --------------------------------------------------------

    def submit(self, batch: dict, max_new_tokens: int = 128, temperature: float | None = None,
               on_token=None, top_p: float | None = None,
               top_k: int | None = None,
               min_p: float | None = None,
               seed: int | None = None,
               adapter: str | None = None,
               repetition_penalty: float = 1.0,
               presence_penalty: float = 0.0,
               frequency_penalty: float = 0.0,
               logprobs: int | None = None) -> Future:
        fut: Future = Future()
        if self.dead is not None:
            fut.set_exception(RuntimeError(f"batcher loop died: {self.dead!r}"))
            return fut
        if adapter is not None:
            if getattr(self, "slot_lora", None) is None:
                fut.set_exception(
                    KeyError(f"no LoRA adapters loaded (requested {adapter!r})")
                )
                return fut
            try:
                self.slot_lora.adapter_index(adapter)
            except KeyError as e:
                fut.set_exception(e)
                return fut
        req = _Request(
            batch=batch,
            max_new_tokens=max_new_tokens,
            temperature=self.temperature if temperature is None else temperature,
            top_p=top_p,
            top_k=top_k,
            min_p=min_p,
            seed=seed,
            future=fut,
            on_token=on_token,
            adapter=adapter,
            repetition_penalty=repetition_penalty,
            presence_penalty=presence_penalty,
            frequency_penalty=frequency_penalty,
            logprobs=logprobs,
        )
        fut._tp_request = req  # handle for cancel()
        self.queue.put(req)
        return fut

    def cancel(self, fut: Future) -> bool:
        """Stop generating for a submitted request (client disconnect, stop
        string satisfied client-side). Takes effect before the next decode
        step; the future resolves with the tokens produced so far. Safe
        from any thread; returns False for foreign futures."""
        req = getattr(fut, "_tp_request", None)
        if req is None:
            return False
        req.cancelled = True
        return True

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)

    _run = PagedContinuousBatcher._run  # same crash net
    _admit_safe = PagedContinuousBatcher._admit_safe
    _start_pending_safe = PagedContinuousBatcher._start_pending_safe
    _init_slot_lora = PagedContinuousBatcher._init_slot_lora
    _admission_params = PagedContinuousBatcher._admission_params
    _bind_slot_adapter = PagedContinuousBatcher._bind_slot_adapter
    _reap_cancelled = PagedContinuousBatcher._reap_cancelled
    _pen_setup = PagedContinuousBatcher._pen_setup
    _pen_first_logits = PagedContinuousBatcher._pen_first_logits
    _pen_count = PagedContinuousBatcher._pen_count
    _pen_apply = PagedContinuousBatcher._pen_apply
    _lp_record = PagedContinuousBatcher._lp_record
    _lp_first = PagedContinuousBatcher._lp_first
    _seed_key = PagedContinuousBatcher._seed_key
    _seed_arrays = PagedContinuousBatcher._seed_arrays

    def _release_slot(self, slot: int):
        self.slots[slot] = None  # the dense cache slot is simply reusable

    # -- internals ---------------------------------------------------------

    def _admit(self, slot: int, req: _Request):
        """Prefill batch-1, sample the first token, copy KV into the slot."""
        if req.cancelled:
            if not req.future.done():
                req.future.set_result([])
            return
        b = req.batch
        l = b["token_ids"].shape[1]
        assert l <= self.max_seq_len, "prompt exceeds scheduler max_seq_len"
        dev_batch = device_batch(b, self.cfg.dtype)
        logits, small_cache = prefill(
            self._admission_params(req), self.cfg, dev_batch, l
        )
        self._pen_setup(slot, req)
        self._rng, sub = jax.random.split(self._rng)
        tok = int(np.asarray(sample_tokens(
            self._pen_first_logits(slot, req, logits),
            req.temperature, req.top_p, self._seed_key(req, 0, sub),
            top_k=req.top_k, min_p=req.min_p))[0])
        self._lp_first(req, logits, tok)
        length = int(np.asarray(dev_batch["lengths"])[0])
        self._bind_slot_adapter(slot, req)
        # compact the prefilled rows: positions [0, length) are valid; pad
        # rows within [length, l) get overwritten as the slot decodes
        self.cache = insert_into_cache(self.cache, small_cache, slot, length)
        self.slots[slot] = req
        self._init_ctx(req, length)
        self.next_tokens[slot] = tok
        self._emit(slot, tok)

    def _init_ctx(self, req: _Request, true_len: int):
        if self.speculative_k <= 0:
            return
        ids = np.asarray(req.batch["token_ids"][0])[:true_len]
        im = np.asarray(req.batch["is_image"][0])[:true_len]
        req.ctx = [-1 if m else int(t) for t, m in zip(ids, im)]

    def _emit(self, slot: int, tok: int):
        req = self.slots[slot]
        req.tokens.append(tok)
        req.produced += 1
        self._pen_count(slot, req, tok)
        if self.speculative_k > 0:
            req.ctx.append(tok)
        if req.on_token is not None:
            req.on_token(tok)
        eos = self.cfg.lm.eos_token_id
        cur_len = int(np.asarray(self.cache.length)[slot])
        # with speculation a step writes up to k+1 slots past cur_len
        if (tok == eos or req.produced >= req.max_new_tokens
                or cur_len + 1 + self.speculative_k >= self.max_seq_len):
            req.future.set_result(req.tokens)
            self.slots[slot] = None

    # -- chunked admission (prefill interleaved with decode steps) ----------

    def _start_pending(self, slot: int, req: _Request):
        import jax.numpy as jnp

        from tokenpacker_tpu.models.vlm import encode_images

        if req.cancelled:
            if not req.future.done():
                req.future.set_result([])
            return
        b = req.batch
        l = b["token_ids"].shape[1]
        assert l <= self.max_seq_len, "prompt exceeds scheduler max_seq_len"
        pp = self._admission_params(req)
        visual = (
            encode_images(pp, self.cfg,
                          jnp.asarray(b["images"], self.cfg.dtype))
            if b.get("images") is not None
            else jnp.zeros((1, self.cfg.tokens_per_view, self.cfg.lm.hidden_size),
                           self.cfg.dtype)
        )
        from tokenpacker_tpu.models.llama import kv_cache_dtype

        small = KVCache.create(
            self.cfg.lm, 1, l,
            kv_cache_dtype(self.cfg.dtype, family=self.cfg.lm.model_family),
        )
        self._pending = {
            "req": req, "slot": slot, "cache": small, "visual": visual,
            "offset": 0, "true_len": int(np.asarray(b["lengths"])[0]),
            "hidden": None, "params": pp,
            "token_ids": jnp.asarray(b["token_ids"]),
            "is_image": jnp.asarray(b["is_image"]),
            "image_slot": jnp.asarray(b["image_slot"]),
        }

    def _step_pending(self):
        import jax.numpy as jnp

        from tokenpacker_tpu.models.lm_api import lm_logits

        p = self._pending
        cs = min(self.prefill_chunk_size, p["token_ids"].shape[1])
        off = p["offset"]
        # fixed chunk length for a stable jit signature: slice cs tokens,
        # clamped at the padded array edge (the overlap recomputes identical
        # K/V; pad rows past true_len are overwritten by decode writes)
        start = max(0, min(off, p["token_ids"].shape[1] - cs))
        hidden, p["cache"] = prefill_chunk(
            p["params"], self.cfg, p["cache"], p["visual"],
            jax.lax.dynamic_slice_in_dim(p["token_ids"], start, cs, 1),
            jax.lax.dynamic_slice_in_dim(p["is_image"], start, cs, 1),
            jax.lax.dynamic_slice_in_dim(p["image_slot"], start, cs, 1),
            jnp.asarray(start, jnp.int32), cs,
        )
        p["offset"] = start + cs
        if p["offset"] >= p["true_len"]:
            # admission complete: sample the first token from the last valid
            # position, copy the prefilled rows into the slot
            req, slot = p["req"], p["slot"]
            idx = p["true_len"] - 1 - start
            logits = lm_logits(p["params"]["lm"], self.cfg.lm, hidden[:, idx])
            self._pen_setup(slot, req)
            self._rng, sub = jax.random.split(self._rng)
            tok = int(np.asarray(sample_tokens(
                self._pen_first_logits(slot, req, logits),
                req.temperature, req.top_p, self._seed_key(req, 0, sub),
                top_k=req.top_k, min_p=req.min_p))[0])
            self._lp_first(req, logits, tok)
            self._bind_slot_adapter(slot, req)
            self.cache = insert_into_cache(self.cache, p["cache"], slot, p["true_len"])
            self.slots[slot] = req
            self._init_ctx(req, p["true_len"])
            self.next_tokens[slot] = tok
            self._pending = None
            self._emit(slot, tok)

    def _step_pending_safe(self):
        p = self._pending
        try:
            self._step_pending()
        except BaseException as e:  # noqa: BLE001
            self._pending = None
            if p is not None and not p["req"].future.done():
                p["req"].future.set_exception(RuntimeError(f"batcher loop died: {e!r}"))
            raise

    def _loop(self):
        chunked = self.prefill_chunk_size is not None
        while not self._stop.is_set():
            self._reap_cancelled()
            # admit queued requests into free slots
            if chunked:
                if self._pending is None:
                    for slot in range(self.num_slots):
                        if self.slots[slot] is None:
                            try:
                                req = self.queue.get_nowait()
                            except queue.Empty:
                                break
                            self._start_pending_safe(slot, req)
                            break
                if self._pending is not None:
                    self._step_pending_safe()
            else:
                for slot in range(self.num_slots):
                    if self.slots[slot] is None:
                        try:
                            req = self.queue.get_nowait()
                        except queue.Empty:
                            break
                        self._admit_safe(slot, req)
            active = np.array([r is not None for r in self.slots])
            if not active.any():
                if chunked and self._pending is not None:
                    continue  # keep chunking the admission
                try:
                    req = self.queue.get(timeout=0.05)
                except queue.Empty:
                    continue
                if chunked:
                    self._start_pending_safe(0, req)
                    continue
                self._admit_safe(0, req)
                active = np.array([r is not None for r in self.slots])
            if not active.any():  # admitted request may have finished already
                continue

            has_greedy = any(
                r is not None and r.temperature <= 0.0
                and not r.has_penalties and r.logprobs is None
                for r in self.slots
            )
            if self.speculative_k > 0 and has_greedy:
                # only greedy slots draft; with none active a k+1-wide verify
                # is pure overhead — fall through to the plain decode step
                if self._spec_backoff > 0:
                    self._spec_backoff -= 1
                    if self._spec_backoff == 0:
                        self._spec_accept_ema = 1.0  # optimistic retry
                else:
                    self._verify_round(active)
                    continue

            # one batched decode step across all active slots; the cache is
            # donated (we rebind it) — without donation each step leaves a
            # 2x-cache transient in HBM (4 GB at the B=8/S=2048/int8 shape)
            logits, self.cache = decode_step_cb_donated(
                self.params,
                self.cfg,
                self.cache,
                jnp.asarray(self.next_tokens),
                self.cache.length,
                jnp.asarray(active),
            )
            self._rng, sub = jax.random.split(self._rng)
            temps = np.array(
                [r.temperature if r is not None else 0.0 for r in self.slots],
                np.float32,
            )
            tps = np.array(
                [r.top_p if r is not None and r.top_p else 1.0 for r in self.slots],
                np.float32,
            )
            tks = np.array(
                [r.top_k if r is not None and r.top_k else 0 for r in self.slots],
                np.int32,
            )
            mps = np.array(
                [r.min_p if r is not None and r.min_p else 0.0 for r in self.slots],
                np.float32,
            )
            seeds, steps = self._seed_arrays()
            toks = np.asarray(sample_tokens_per_row(
                self._pen_apply(logits), temps, sub, tps, tks, mps,
                seeds, steps))
            self._lp_record(logits, toks)
            for slot in range(self.num_slots):
                if self.slots[slot] is not None:
                    self.next_tokens[slot] = int(toks[slot])
                    self._emit(slot, int(toks[slot]))

    def _propose_fed(self):
        """Per-slot verify inputs: [last token, drafts..., -1 padding]."""
        from tokenpacker_tpu.speculative import propose_ngram_host

        k = self.speculative_k
        fed = np.full((self.num_slots, k + 1), -1, np.int32)
        dks = np.zeros(self.num_slots, np.int32)
        for slot in range(self.num_slots):
            req = self.slots[slot]
            if req is None:
                continue
            fed[slot, 0] = self.next_tokens[slot]
            # penalized/logprob slots never draft: acceptance compares
            # drafts against UNpenalized argmax (breaks penalty semantics),
            # and accepted bursts skip the per-token logits a logprob
            # request records — both advance one token per round instead
            if (req.temperature <= 0.0 and not req.has_penalties
                    and req.logprobs is None):
                d = propose_ngram_host(req.ctx, k)
                fed[slot, 1 : 1 + len(d)] = d
                dks[slot] = len(d)
        return fed, dks

    def _accept_bursts(self, fed, dks, logits, cur_lens):
        """Greedy acceptance per slot (+1 sampled token for temperature>0
        slots), EMA/backoff bookkeeping. Returns (bursts, new_lens)."""
        from tokenpacker_tpu.speculative import accept_greedy

        eos = self.cfg.lm.eos_token_id
        self._rng, sub = jax.random.split(self._rng)
        temps = np.array(
            [r.temperature if r is not None else 0.0 for r in self.slots], np.float32
        )
        tps = np.array(
            [r.top_p if r is not None and r.top_p else 1.0 for r in self.slots],
            np.float32,
        )
        tks = np.array(
            [r.top_k if r is not None and r.top_k else 0 for r in self.slots],
            np.int32,
        )
        mps = np.array(
            [r.min_p if r is not None and r.min_p else 0.0 for r in self.slots],
            np.float32,
        )
        preds = np.asarray(jnp.argmax(logits, axis=-1))  # [N, k+1]
        # position-0 logits are penalized per row (identity for unpenalized
        # slots): penalized greedy slots take their next token from the
        # penalized argmax via the sampled0 path below, like temperature>0
        # slots — they fed no drafts (_propose_fed)
        seeds, steps = self._seed_arrays()
        sampled0 = np.asarray(sample_tokens_per_row(
            self._pen_apply(logits[:, 0]), temps, sub, tps, tks, mps,
            seeds, steps))
        # logprob slots take the sampled0 path (they fed no drafts), so
        # their per-round token is sampled0[slot] — record its entry from
        # the raw position-0 logits
        self._lp_record(logits[:, 0], sampled0)
        new_lens = np.asarray(cur_lens).copy()
        bursts: dict[int, list[int]] = {}
        n_greedy = accepted = 0
        for slot in range(self.num_slots):
            req = self.slots[slot]
            if req is None:
                continue
            if (req.temperature <= 0.0 and not req.has_penalties
                    and req.logprobs is None):
                burst = accept_greedy(preds[slot], fed[slot, 1:], int(dks[slot]), eos)
                n_greedy += 1
                accepted += len(burst) - 1
            else:
                burst = [int(sampled0[slot])]
            bursts[slot] = burst
            new_lens[slot] += len(burst)
        if n_greedy:
            ratio = accepted / n_greedy
            self._spec_accept_ema = 0.9 * self._spec_accept_ema + 0.1 * ratio
            if ratio > 0.5:
                self._spec_fail_streak = 0  # drafts are landing again
            if self._spec_accept_ema < SPEC_EMA_THRESHOLD:
                self._spec_backoff = min(
                    SPEC_BACKOFF_ROUNDS * (2 ** self._spec_fail_streak), 512
                )
                self._spec_fail_streak += 1
        return bursts, new_lens

    def _emit_bursts(self, bursts):
        for slot, burst in bursts.items():
            for tok in burst:
                if self.slots[slot] is None:
                    break
                self._emit(slot, tok)
            if self.slots[slot] is not None:
                self.next_tokens[slot] = int(burst[-1])

    def _verify_round(self, active):
        """One speculative step for every active slot: greedy slots feed
        their prompt-lookup drafts and advance by their own acceptance;
        temperature>0 slots advance one sampled token (position 0)."""
        from tokenpacker_tpu.speculative import verify_step_cb

        fed, dks = self._propose_fed()
        logits, self.cache = verify_step_cb(
            self.params, self.cfg, self.cache, jnp.asarray(fed),
            self.cache.length, jnp.asarray(active),
        )
        bursts, new_lens = self._accept_bursts(fed, dks, logits, self.cache.length)
        # advance lengths BEFORE emitting so _emit's room check sees the
        # post-step state (its +k+1 margin keeps the next round in bounds)
        self.cache = self.cache._replace(length=jnp.asarray(new_lens))
        self._emit_bursts(bursts)


PagedContinuousBatcher.submit = ContinuousBatcher.submit
PagedContinuousBatcher.cancel = ContinuousBatcher.cancel
# speculation plumbing shared with the dense batcher (only the cache-length
# bookkeeping differs — each class has its own _verify_round)
PagedContinuousBatcher._init_ctx = ContinuousBatcher._init_ctx
PagedContinuousBatcher._propose_fed = ContinuousBatcher._propose_fed
PagedContinuousBatcher._accept_bursts = ContinuousBatcher._accept_bursts
PagedContinuousBatcher._emit_bursts = ContinuousBatcher._emit_bursts
