"""Single-dispatch fused decode step: the whole 32-layer decoder in ONE
Pallas kernel.

Why: decode is weight-bandwidth-bound, but the measured ~55us per-pallas_call
dispatch floor on v5e (ROADMAP.md) makes per-layer kernels lose — 224
calls/step of dispatch cancels any in-kernel win (w8a8 and the decode
attention kernel both measured net-negative integrated). This kernel removes
the dispatch tax entirely: one `pallas_call` runs an in-kernel
`lax.fori_loop` over layers, streaming every int8 weight matrix from HBM
(`pl.ANY` memory space) through ONE double-buffered DMA ring, computing the
per-layer GEMVs + RoPE + attention-over-cache + MLP on data that never
leaves VMEM. The XLA graph per decode step shrinks to: embed lookup →
[this kernel] → final RMSNorm → lm_head → sample.

Replaces (for the quantized llama-family serving path) the per-layer XLA
decode in models/llama._layer — numerics match that path's int8
convert-in-dot semantics modulo f32-vs-bf16 accumulation reorder (tested).
The reference has no analog: its decode is HF `model.generate` over CUDA
kernels (llava/model/language_model/llava_llama.py:120-140).

Mosaic constraints this design is shaped by (all measured on the axon v5e
stack via bisection — see ROADMAP.md round-2 notes):
- single vector ops wider than ~12288 lanes crash the compiler (a dot over
  a [512, 8192] int8 operand fails, [512, 4096] passes; a 16384-wide f32
  accumulator fails, 12288 passes) → convert+dot is tiled to <=2048-column
  sub-dots whose results are CONCATENATED into one accumulator per chunk
  (carrying per-tile accumulators across the chunk loop also crashes), and
  weight matrices wider than 12288 are processed as independent column
  segments (gate/up separately; q/k/v separately at 13B geometry).
- TWO independent weight-streaming scratch buffers crash the compiler; one
  ring reused sequentially is fine → all five matrices stream through a
  single [2, ck_max, 12288] int8 ring with one DMA-semaphore pair, as a
  flat per-layer chunk queue. Cross-segment prefetch hooks keep the ring
  full across matrix boundaries (the next segment's first two chunks are
  issued during the previous segment's last two computes).
- statically unrolling more than ~2 dozen dot sites crashes the compiler →
  the chunk loop is a lax.fori_loop with traced ring slots; x chunks are
  staged into a VMEM scratch for dynamic ref reads (value-level
  dynamic_slice does not lower), and each DMA start/wait resolves its slot
  to a static 0/1 through pl.when branches (a DMA destination combining a
  traced slot with pl.ds sub-rectangles also crashes the compiler).

STATUS (round 3): RESOLVED and running on the real chip. The round-2
"interaction bug" was a scoped-VMEM stack OOM all along — the axon helper
now surfaces mosaic diagnostics, and the full composition's scratch
(12.6 MB weight ring + K/V staging + tail) exceeded the 16 MB default
`xla_tpu_scoped_vmem_limit_kib`. Fix: every top-level jit that can contain
this kernel raises the limit to 64 MB (generate._fd_jit; the option is
only legal on the OUTERMOST jit — nested invocations drop it). On-chip
parity: greedy tokens identical to the XLA int8 path over multi-step
runs, max |dlogits| ~1e-3 (scripts/check_fused_parity.py). Round-3
attention rework: the [S, D]-sized probability work rides the MXU
(p^T·V full-matrix dot + block-diagonal extract via G^T) and K/V staging
is split into two buffers whose next-(layer, sample) DMA starts right
after each buffer's last read — the remaining VPU-heavy op is one bf16
row-broadcast multiply for the logits ([1,D]→[D,1] relayouts for a
q-masked G do not lower in mosaic, nor do bf16 minor-dim reshapes).
Several round-2 "envelope" rules were surely the same masked VMEM OOM
(e.g. two 12.6 MB rings, >12288-wide f32 accumulators); the surviving
structural rules are noted inline where they shaped the code.

Other design notes (v5e):
- attention avoids every in-kernel transpose/reshape of the [S, H*D] cache:
  logits[s,h] = sum_d K[s,·]·q via a VPU broadcast-multiply then an MXU dot
  with a block-diagonal ones matrix G [D, H]; probabilities expand back to
  lanes via G^T. The current token's k/v never touch the cache buffer — its
  logit/value ride as a separate rank-1 term in the softmax.
- RoPE's rotate-half is an MXU dot with a [Dh, Dh] permutation matrix on a
  [B*H, Dh] view (the only reshape in the kernel, on a tiny tensor).
- per-sample attendable ranges ride SMEM; the new k/v row is returned and
  scattered into the cache by the wrapper (write_pos never enters the kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
MAX_WIDE = 12288  # widest proven value/accumulator width (lanes)
N_TILE = 4096  # max columns per convert+dot ([512, 4096] operands are
# proven; wider fails) — also minimizes static dot sites, which are the
# scarcest compile resource on this stack


def _chunks(k: int, ck: int):
    """[(offset, size)] covering k in slices of ck (+ a 128-aligned tail)."""
    out = []
    off = 0
    while off < k:
        sz = min(ck, k - off)
        out.append((off, sz))
        off += sz
    return out


class _Seg:
    """One streaming segment: a (layer, column-range) of an [L, K, N] int8
    stack, funneled through the shared ring.

    The chunk loop is a `lax.fori_loop` over uniform `ck`-row chunks (plus
    an optional static tail of K % ck rows), with the ring slot computed
    dynamically from `parity` (a traced per-layer value) — this keeps the
    kernel's instruction count roughly constant per segment, which is what
    lets the whole decoder compile (the axon mosaic stack crashes beyond
    roughly two dozen statically-unrolled dot sites). x chunks are staged
    into the small `xbuf` scratch so the fori body can read them with a
    dynamic leading index (dynamic_slice on *values* does not lower)."""

    def __init__(self, hbm_ref, layer, col_off, ncols, k, ck, ring, sem,
                 xbuf, parity, hooks=True, tail_buf=None, tail_sem=None,
                 w8a8=False, unpack=None, row_off=0):
        self.w8a8 = w8a8
        # unpack: callable(u16 [rows/2, n]) -> int8 [rows, n] when the HBM
        # source is row-packed uint16 (ops/quantize.pack_fused_weights — the
        # v5e DMA engine streams 16-bit tiles ~2.5x the byte rate of int8);
        # None = plain int8 source. k/ck stay in UNPACKED (int8-row) units;
        # only the DMA slicing and ring rows halve.
        self.unpack = unpack
        self.rdiv = 2 if unpack is not None else 1
        # source-ROW offset (unpacked units): k-split segments of one
        # matrix (the 13B down projection — its x operand would exceed the
        # 12288-lane value width as a single gemv)
        self.row_off = row_off
        self.hbm_ref = hbm_ref
        self.layer = layer
        self.col_off = col_off
        self.ncols = ncols
        self.k = k
        self.ck = ck
        self.nck = k // ck
        self.tail = k % ck
        self.nct = self.nck  # ring chunk count (the tail rides its own buffer)
        self.ring = ring
        self.nslots = ring.shape[0]  # TOKENPACKER_FD_RING (default 2)
        self.sem = sem
        self.xbuf = xbuf
        self.parity = parity
        self.hooks = hooks
        self.tail_buf = tail_buf
        self.tail_sem = tail_sem
        self.n_tiles = _chunks(ncols, N_TILE)
        if self.tail:
            assert tail_buf is not None, "tail chunk needs its dedicated buffer"
        # a tail-only segment would break the cross-segment hook chain (no
        # main chunk ever fires the next segment's starts) — geometry plans
        # must keep k >= ck (true for 7B/13B; guards exotic test shapes)
        assert self.nck >= 1, "tail-only segment unsupported"

    def _slot(self, ci):
        return jax.lax.rem(self.parity + ci, self.nslots)

    def _dma_s(self, ci, slot: int):
        """Copy for ring chunk ci into ring slot `slot`. Measured DMA-dest
        rules on the axon mosaic stack: the slot index must be STATIC (a
        traced slot combined with pl.ds sub-rects crashes the compiler),
        the ROW extent must cover the full ring rows (row-partial dests
        crash), while COLUMN-partial dests are fine — hence one uniform
        chunk row count for every segment and a separate one-shot buffer
        for the K-remainder tail."""
        rck = self.ck // self.rdiv  # rows per chunk in SOURCE units
        return pltpu.make_async_copy(
            self.hbm_ref.at[
                self.layer,
                pl.ds(self.row_off // self.rdiv + ci * rck, rck),
                pl.ds(self.col_off, self.ncols)
            ],
            self.ring.at[slot, pl.ds(0, rck), pl.ds(0, self.ncols)],
            self.sem.at[slot],
        )

    def _slot_branch(self, ci, fn):
        """Run fn(copy) with the slot for ring chunk ci resolved to a
        static index via pl.when branches (see _dma_s)."""
        slot = self._slot(ci)
        for s in range(self.nslots):
            @pl.when(slot == s)
            def _(s=s):
                fn(self._dma_s(ci, s))

    def _start_chunk(self, ci):
        self._slot_branch(ci, lambda dma: dma.start())

    def _wait_chunk(self, ci):
        self._slot_branch(ci, lambda dma: dma.wait())

    def _tail_dma(self):
        """The K % ck tail streams through its own exact-shape one-shot
        buffer (a second SIMPLE buffer is fine; a second ring is not)."""
        off = (self.row_off + self.nck * self.ck) // self.rdiv
        rtail = self.tail // self.rdiv
        return pltpu.make_async_copy(
            self.hbm_ref.at[
                self.layer, pl.ds(off, rtail), pl.ds(self.col_off, self.ncols)
            ],
            self.tail_buf.at[pl.ds(0, rtail), pl.ds(0, self.ncols)],
            self.tail_sem,
        )

    def start(self, ci: int, guard=None):
        """Start ring chunk ci (static index; prologue / self-start use)."""
        if ci >= self.nct:
            return
        if guard is None:
            self._start_chunk(ci)
        else:
            @pl.when(guard)
            def _():
                self._start_chunk(ci)

    def starter(self, ci: int, guard=None):
        return lambda cond=None: self.start(ci, guard if cond is None else cond)

    def _tile_dots(self, xs, slot):
        """w8a8: xs is exact-integer bf16, cast to int8 per chunk ([B, ck]
        is tiny) and fed to a NATIVE s8xs8->s32 MXU dot against the raw
        ring — the per-weight int8->bf16 VPU conversion (6.6G elements per
        7B step, the measured chain-floor suspect) disappears entirely."""
        if self.w8a8:
            xs = xs.astype(jnp.int8)
        acc_t = jnp.int32 if self.w8a8 else jnp.float32
        if self.unpack is not None:
            # one bitcast recovers the whole slot's int8 rows (free in VMEM
            # on mosaic — sublane repacking), then tiles slice a VALUE
            w8 = self.unpack(
                self.ring[pl.ds(slot, 1), : self.ck // 2, : self.ncols][0]
            )  # [ck, ncols] int8
            tiles = [w8[:, noff : noff + nsz] for noff, nsz in self.n_tiles]
        else:
            tiles = [
                self.ring[pl.ds(slot, 1), : self.ck, noff : noff + nsz][0]
                for noff, nsz in self.n_tiles
            ]
        parts = [
            jax.lax.dot_general(
                xs, t if self.w8a8 else t.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_t,
            )
            for t in tiles
        ]
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    def _tail_dots(self, xs_t):
        if self.w8a8:
            xs_t = xs_t.astype(jnp.int8)
        acc_t = jnp.int32 if self.w8a8 else jnp.float32
        if self.unpack is not None:
            w8 = self.unpack(self.tail_buf[: self.tail // 2, : self.ncols])
            tiles = [w8[:, noff : noff + nsz] for noff, nsz in self.n_tiles]
        else:
            tiles = [
                self.tail_buf[: self.tail, noff : noff + nsz]
                for noff, nsz in self.n_tiles
            ]
        parts = [
            jax.lax.dot_general(
                xs_t, t if self.w8a8 else t.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_t,
            )
            for t in tiles
        ]
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    def gemv(self, x, next_starts=()):
        """x: [B, K] bf16 → [B, ncols] f32.

        With hooks on, chunks 0/1 were started by the previous segment (or
        the prologue) and this segment starts the NEXT segment's first two
        chunks at its own last two flat positions, so the ring never
        drains across matrix boundaries. With hooks off (self-start
        fallback) each segment starts its own first chunks."""
        b = x.shape[0]
        nck, ck, tail = self.nck, self.ck, self.tail
        sx = None
        if self.w8a8:
            # dynamic per-row absmax activation quant (w8a8): the quantized
            # values are EXACT integers in bf16 (|q| <= 127 < 2^8 mantissa),
            # so they stage through the same bf16 xbuf and cast to int8 at
            # the dot — no second scratch, no int8 dynamic-ref-read risk
            x32 = x.astype(jnp.float32)
            sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=1, keepdims=True), 1e-8)
            sx = sx / 127.0  # [B, 1] f32
            x = jnp.round(x32 / sx).astype(jnp.bfloat16)
        # stage x chunks for dynamic ref reads inside the fori
        for ci in range(nck):
            self.xbuf[ci, :b, :ck] = x[:, ci * ck : (ci + 1) * ck]
        # timing-only chain ablations (TOKENPACKER_FD_DEBUG +
        # TOKENPACKER_FUSED_DECODE=debug): nodma skips every ring DMA
        # start/wait (compute-only floor, dots read stale slot 0); nodot
        # replaces the MXU dots with a scalar touch (DMA-only floor).
        # Together with noattn they split the chain cost exactly.
        import os as _os

        _dbg = _os.environ.get("TOKENPACKER_FD_DEBUG", "")
        nodma = "nodma" in _dbg
        nodot = "nodot" in _dbg
        if tail and not nodma:
            # the tail's one-shot DMA overlaps the whole main-chunk loop
            self._tail_dma().start()
        if not self.hooks and not nodma:
            for s in range(self.nslots):
                self.start(s)
        ns = [
            next_starts[i] if i < len(next_starts) else (lambda: None)
            for i in range(self.nslots)
        ]

        def body(ci, acc):
            slot = self._slot(ci)
            if not nodma:
                self._wait_chunk(ci)
            xs = self.xbuf[pl.ds(ci, 1), :b, :ck][0]  # [B, ck]
            if nodot:
                acc = acc + jnp.sum(xs).astype(acc.dtype)
            else:
                acc = acc + self._tile_dots(xs, slot)

            if not nodma:
                @pl.when(ci + self.nslots < nck)
                def _():
                    self._start_chunk(ci + self.nslots)

            if self.hooks and not nodma:
                # fire the next segment's first `nslots` starts at this
                # segment's last `nslots` computes: next chunk j reuses the
                # slot of current chunk (nck - nslots + j), whose last read
                # is the dots above
                for j in range(self.nslots):
                    @pl.when(ci + self.nslots - j == nck)
                    def _(j=j):
                        ns[j]()

            return acc

        acc = jax.lax.fori_loop(
            0, nck, body,
            jnp.zeros((b, self.ncols), jnp.int32 if self.w8a8 else jnp.float32),
        )
        if tail:
            if not nodma:
                self._tail_dma().wait()
            if nodot:
                acc = acc + jnp.sum(x[:, nck * ck :]).astype(acc.dtype)
            else:
                acc = acc + self._tail_dots(x[:, nck * ck :])
        if self.w8a8:
            acc = acc.astype(jnp.float32) * sx
        return acc


def _ring_slots() -> int:
    """Weight-ring depth (TOKENPACKER_FD_RING, default 2). Deeper rings
    keep more DMA streams in flight — the measured chain floor at depth 2
    is 412 GB/s (half of v5e HBM peak), the motivating experiment."""
    import os

    return max(2, int(os.environ.get("TOKENPACKER_FD_RING", "2")))


def _layer_chunkplan(d: int, f: int):
    """Static per-layer streaming plan: (ck for D-reduction segments, ck
    for the F-reduction segment, qkv segment count). Chunk sizes must be
    multiples of 128 (static lane slicing of x) — guaranteed by the
    fused_eligible geometry gates.

    TOKENPACKER_FD_CK overrides the ring chunk rows (default 512; 256
    halves the ring's VMEM to fit the 16 MB default scoped-vmem stack
    when the outer jit does not raise xla_tpu_scoped_vmem_limit_kib)."""
    import os

    ck = min(int(os.environ.get("TOKENPACKER_FD_CK", "512")), d, f)
    n_qkv_segs = 1 if 3 * d <= MAX_WIDE else 3
    return ck, ck, n_qkv_segs


def _rms(h, w_row, eps):
    """h [B, D]; w_row [1, D] bf16. Matches ops.layers.rms_norm numerics."""
    h32 = h.astype(jnp.float32)
    var = jnp.mean(h32 * h32, axis=1, keepdims=True)
    y = (h32 * jax.lax.rsqrt(var + eps)).astype(jnp.bfloat16)
    return y * w_row


def _kernel(
    # inputs
    seq_ref,  # SMEM [3, B] int32: len0 / start2 / end2 (excl)
    h_ref,  # [B*T, D] bf16 (T = t_tok verify tokens per sample; 1 = decode)
    cos_ref,  # [B*T*H, Dh] f32 (per-head expanded)
    sin_ref,
    rot_ref,  # [Dh, Dh] bf16 rotate-half permutation
    g_ref,  # [D, H] bf16 block-diagonal ones
    gt_ref,  # [H, D] bf16 — its transpose: every attention dot stays in
    # standard (contract lhs dim1 with rhs dim0) form; NT-form dot_general
    # inside the layer fori is part of what crashes the axon compiler
    e_ref,  # [T, T*H] f32 query-selector: E[t, t*H+h] = 1 (the qg attention
    # form and the T>1 block-extract / denominator-expand dots)
    grep_ref,  # [D, T*H] bf16 — G tiled T times along columns
    grept_ref,  # [T*H, D] f32 — its transpose
    cmask_ref,  # [T, T*H] f32 — in-chunk causal mask: key row t' may attend
    # query column t*H+h iff t' <= t (0 / NEG)
    ln1_ref,  # [L, D] f32 — dynamically-indexed row reads of a 2D BF16
    ln2_ref,  # VMEM ref crash the axon compiler; f32 refs read fine
    qkv_s_ref,  # [L, 3D] f32
    o_s_ref,  # [L, D]
    gu_s_ref,  # [L, 2F]
    down_s_ref,  # [L, D]
    qkv_ref,  # ANY [L, D, 3D] int8
    o_ref,  # ANY [L, D, D]
    gu_ref,  # ANY [L, D, 2F]
    down_ref,  # ANY [L, F, D]
    kc_ref,  # ANY [L, B, S, HD] bf16 — or int8 when kv_quant (int8 KV cache:
    vc_ref,  # halves the per-step cache DMA bytes, the dominant traffic at
    # long S — composes the two round-3 winners, VERDICT r3 item 2)
    ks_ref,  # ANY [L, B, H, S] f32 per-(position, head) scales, TRANSPOSED
    vs_ref,  # so the DMA'd [H, S] block's minor dim is 128-aligned (a
    # [S, H=32] f32 slice does not lower: "Slice shape along dimension 3
    # must be aligned to tiling (128)"). Dummy [1,1,8,128] when not kv_quant.
    selm_ref,  # VMEM [rows, Wm] f32 — padded slot-LoRA column mask (see
    # build_fd_lora); dummy [1, 128] when lora is off
    la_d_ref,  # ANY [L, D, Wq+Wo+Wg] bf16 — d-input LoRA A (qkv | o | gu)
    la_f_ref,  # ANY [L, F, Wd] bf16 — down's LoRA A
    lb_qkv_ref,  # ANY [L, segs·Wq, ·] bf16 — LoRA B, column segments as rows
    lb_o_ref,  # ANY [L, Wo, D]
    lb_gu_ref,  # ANY [L, 2·splits·Wg, bw]
    lb_down_ref,  # ANY [L, Wd, D]
    # outputs
    hout_ref,  # [B*T, D] bf16
    knew_ref,  # [L, B*T, HD] bf16 (kv_quant: quantize-dequantized values —
    vnew_ref,  # the wrapper's quantize_kv reproduces the int8+scale exactly)
    # scratch
    ring,  # [2, ck, ring_w] int8 — the one shared weight ring (full-row dests)
    xbuf,  # [max_chunks, B, ck] bf16 — staged x chunks
    tail_buf,  # [F % ck (or 8), D] int8 — one-shot down-projection tail
    kbuf,  # [S, HD] bf16/int8 — K-cache staging (single buffer; the next
    vbuf,  # (l,b) DMA starts right after this one's last read) — V likewise
    ksbuf,  # [cache_group, H, S] f32 — staged K scales (kv_quant)
    vsbuf,
    labuf_d,  # [D, Wq+Wo+Wg] bf16 — staged d-input LoRA A (one-shot/layer)
    labuf_f,  # [F, Wd] bf16
    lbq_buf,  # [segs·Wq, ·] bf16 — staged LoRA B matrices
    lbo_buf,  # [Wo, D]
    lbg_buf,  # [2·splits·Wg, bw]
    lbd_buf,  # [Wd, D]
    wsem,
    aux_sem,  # [11] DMA sems: 0=K, 1=V, 2=down tail, 3=K scales, 4=V scales,
    # 5..10 = the six slot-LoRA staging buffers above
    *,
    layers: int,
    batch: int,
    d: int,
    f: int,
    heads: int,
    head_dim: int,
    s: int,
    eps: float,
    packed: bool = False,
    interp: bool = False,
    t_tok: int = 1,
    kv_quant: bool = False,
    lora: bool = False,
):
    ck_d, ck_f, n_qkv_segs = _layer_chunkplan(d, f)
    rows = batch * t_tok  # GEMV/RoPE row count; attention is per SAMPLE
    scale = head_dim**-0.5
    import os

    # the qg attention form: per-sample [T, D] query blocks contract with
    # Qg[d, tH+h] = q[t,d]·G[d,h] so every [S, ·]-sized op is a single MXU
    # dot even at T>1 (verify steps). T==1 keeps the proven broadcast form
    # unless TOKENPACKER_FD_ATTN=qg opts in (the qg form also replaces the
    # [S, D] VPU row-broadcast multiply with MXU work — measure then flip).
    use_qg = t_tok > 1 or os.environ.get("TOKENPACKER_FD_ATTN") == "qg"

    # cross-segment prefetch hooks keep the ring full across matrix
    # boundaries; TOKENPACKER_FUSED_PIPELINE=self disables them (each
    # segment then starts its own first two chunks — ~8us ring-drain bubble
    # per segment boundary) — kept as a compile-compatibility fallback
    nslots = _ring_slots()
    nct_d = d // ck_d  # ring chunks per D-reduction segment
    # F (gate/up width) may exceed the 12288-lane value limit (13B: 13824)
    # → gate/up stream as column segments and down as matching row (k)
    # segments, so every gemv accumulator and x operand stays <= MAX_WIDE.
    # 7B (f=11008) keeps a single split — identical to the round-2 plan.
    mlp_splits = _chunks(f, (MAX_WIDE // ck_f) * ck_f)
    total = (
        nct_d * (n_qkv_segs + 1 + 2 * len(mlp_splits))
        + sum(nc // ck_f for _, nc in mlp_splits)
    )  # ring chunks per layer
    # hook scheduling needs >=nslots main chunks per segment; tiny test
    # geometries fall back to self-starting segments
    hooks = (
        os.environ.get("TOKENPACKER_FUSED_PIPELINE", "hooks") == "hooks"
        and min(d // ck_d, min(nc // ck_f for _, nc in mlp_splits)) >= nslots
    )

    # w8a8 (TOKENPACKER_FD_W8A8=1): native s8 MXU dots for every streaming
    # GEMV, with dynamic per-row activation quantization. Changes numerics
    # vs the XLA int8 path (activation rounding) — opt-in until the
    # measured accuracy/speed trade is recorded.
    w8a8 = os.environ.get("TOKENPACKER_FD_W8A8", "0") == "1"

    unpack = None
    if packed:
        if interp:
            # interpret mode can't rely on pltpu.bitcast matching mosaic's
            # measured sublane pairing — emulate it with the shared XLA
            # inverse (ops/quantize.unpack_int8_rows, the single source of
            # truth for the lo/hi byte pairing)
            from tokenpacker_tpu.ops.quantize import unpack_int8_rows as unpack
        else:
            def unpack(w):
                return pltpu.bitcast(w, jnp.int8)

    def starters(seg, guard=None):
        return tuple(seg.starter(i, guard) for i in range(nslots))

    def segs_for(l):
        """The layer's ordered segment list; ring parities are traced
        values derived from the layer index (no static parity constraint).
        Construction order == gemv call order == ring chunk order (the
        parity bookkeeping and the cross-segment hooks both depend on it):
        qkv segs, o, (gate_i, up_i) per mlp column split, down k-segs."""
        par_box = [jax.lax.rem(l * total, nslots)]

        def mk(ref, co, nc, k, ck, row_off=0, with_tail=False):
            seg = _Seg(
                ref, l, co, nc, k, ck, ring, wsem, xbuf, par_box[0], hooks,
                w8a8=w8a8, unpack=unpack, row_off=row_off,
                tail_buf=tail_buf if with_tail else None,
                tail_sem=aux_sem.at[2] if with_tail else None,
            )
            par_box[0] = jax.lax.rem(par_box[0] + seg.nck, nslots)
            return seg

        if n_qkv_segs == 1:
            qkv_segs = [mk(qkv_ref, 0, 3 * d, d, ck_d)]
        else:
            # 13B geometry (3D > MAX_WIDE): q/k/v as three column segments
            qkv_segs = [mk(qkv_ref, i * d, d, d, ck_d) for i in range(3)]
        o_seg = mk(o_ref, 0, d, d, ck_d)
        gu_segs = [
            (mk(gu_ref, co, nc, d, ck_d), mk(gu_ref, f + co, nc, d, ck_d))
            for co, nc in mlp_splits
        ]
        # only the LAST k-split can have a K % ck remainder (earlier splits
        # are multiples of ck by construction) — it owns the tail buffer
        down_segs = [
            mk(down_ref, 0, d, nc, ck_f, row_off=co, with_tail=nc % ck_f > 0)
            for co, nc in mlp_splits
        ]
        return qkv_segs, o_seg, gu_segs, down_segs

    # kbuf/vbuf hold `cache_group` samples per DMA: the whole batch when the
    # scratch fits the raised scoped-vmem stack (ONE K + ONE V copy per
    # layer — removes 2(B-1) serialized per-sample copies and their waits),
    # else one sample at a time (the round-3 per-b fallback)
    batched_cache = kbuf.shape[0] == batch

    class _PairDMA:
        """A cache copy + its scale copy started/awaited together (int8 KV:
        every K/V staging DMA has a [S, H] f32 scale companion — ~1.5% of
        the int8 payload's bytes)."""

        def __init__(self, *copies):
            self.copies = copies

        def start(self):
            for c in self.copies:
                c.start()

        def wait(self):
            for c in self.copies:
                c.wait()

    def k_dma(l, b):
        if batched_cache:
            c = pltpu.make_async_copy(kc_ref.at[l], kbuf, aux_sem.at[0])
            if kv_quant:
                return _PairDMA(c, pltpu.make_async_copy(
                    ks_ref.at[l], ksbuf, aux_sem.at[3]))
            return c
        c = pltpu.make_async_copy(kc_ref.at[l, b], kbuf.at[0], aux_sem.at[0])
        if kv_quant:
            return _PairDMA(c, pltpu.make_async_copy(
                ks_ref.at[l, b], ksbuf.at[0], aux_sem.at[3]))
        return c

    def v_dma(l, b):
        if batched_cache:
            c = pltpu.make_async_copy(vc_ref.at[l], vbuf, aux_sem.at[1])
            if kv_quant:
                return _PairDMA(c, pltpu.make_async_copy(
                    vs_ref.at[l], vsbuf, aux_sem.at[4]))
            return c
        c = pltpu.make_async_copy(vc_ref.at[l, b], vbuf.at[0], aux_sem.at[1])
        if kv_quant:
            return _PairDMA(c, pltpu.make_async_copy(
                vs_ref.at[l, b], vsbuf.at[0], aux_sem.at[4]))
        return c

    def start_next_cache(dma_of, l, b):
        """Start the next cache DMA — issued immediately after the current
        buffer's LAST read so the copy overlaps the rest of attention + the
        o/MLP GEMV chain (the buffers are single, not rings: a traced-slot
        read of a bf16 ref does not lower — ROADMAP envelope)."""
        if not batched_cache and b + 1 < batch:
            dma_of(l, b + 1).start()
            return
        if batched_cache and b + 1 < batch:
            return  # whole batch already staged
        nl = jnp.minimum(l + 1, layers - 1)

        @pl.when(l + 1 < layers)
        def _():
            dma_of(nl, 0).start()

    dbg = os.environ.get("TOKENPACKER_FD_DEBUG", "")  # chain-only A/B probe

    # --- slot-LoRA composition (multi-LoRA serving, VERDICT r4 #1) ---
    # Six per-layer one-shot staging copies (dedicated buffers + sems —
    # simple buffers beside the ring are fine; a second RING is not). Each
    # layer's copies are started by the PREVIOUS layer right after its last
    # read of that buffer (prologue starts layer 0's), so the small slabs
    # stream behind the base weights. The correction per target is the XLA
    # path's term with adapters flattened:
    #   u = x @ A_flat  → masked by the slot-selection columns → @ B_flat
    # (ops/layers.linear's per-adapter einsum + one-hot select is the same
    # f32 sum — the masked columns contribute exact zeros).
    if lora:
        wq = lb_qkv_ref.shape[1] // n_qkv_segs
        wo = lb_o_ref.shape[1]
        wg = lb_gu_ref.shape[1] // (2 * len(mlp_splits))
        wd = lb_down_ref.shape[1]

        def _l_dma(ref, buf, si):
            return lambda l: pltpu.make_async_copy(ref.at[l], buf, aux_sem.at[si])

        lora_dmas = [
            _l_dma(la_d_ref, labuf_d, 5), _l_dma(la_f_ref, labuf_f, 6),
            _l_dma(lb_qkv_ref, lbq_buf, 7), _l_dma(lb_o_ref, lbo_buf, 8),
            _l_dma(lb_gu_ref, lbg_buf, 9), _l_dma(lb_down_ref, lbd_buf, 10),
        ]

        def lora_next(i, l):
            nl = jnp.minimum(l + 1, layers - 1)

            @pl.when(l + 1 < layers)
            def _():
                lora_dmas[i](nl).start()

        def lora_u(x, coff, w):
            return jax.lax.dot_general(
                x, labuf_d[:, coff : coff + w], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def lora_term(u, moff, w, bbuf, roff, cw):
            um = (u * selm_ref[:, moff : moff + w]).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                um, bbuf[roff : roff + w, :cw], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    def layer_body(l, h):
        qkv_segs, o_seg, gu_segs, down_segs = segs_for(l)

        ln1 = ln1_ref[pl.ds(l, 1), :].astype(jnp.bfloat16)
        x1 = _rms(h, ln1, eps)
        if lora:
            lora_dmas[0](l).wait()  # labuf_d: first read (last is u_gu below)
            u_qkv = lora_u(x1, 0, wq)
            lora_dmas[2](l).wait()
        if n_qkv_segs == 1:
            qkv_acc = qkv_segs[0].gemv(x1, starters(o_seg))
            sc = qkv_s_ref[pl.ds(l, 1), :]
            qkv_acc = qkv_acc * sc
            if lora:
                qkv_acc = qkv_acc + lora_term(u_qkv, 0, wq, lbq_buf, 0, 3 * d)
            q = jax.lax.slice(qkv_acc, (0, 0), (rows, d))
            k = jax.lax.slice(qkv_acc, (0, d), (rows, 2 * d))
            v = jax.lax.slice(qkv_acc, (0, 2 * d), (rows, 3 * d))
        else:
            accs = []
            for i, seg in enumerate(qkv_segs):
                nxt = (
                    starters(qkv_segs[i + 1]) if i + 1 < 3 else starters(o_seg)
                )
                a = seg.gemv(x1, nxt)
                a = a * qkv_s_ref[pl.ds(l, 1), i * d : (i + 1) * d]
                if lora:
                    a = a + lora_term(u_qkv, 0, wq, lbq_buf, i * wq, d)
                accs.append(a)
            q, k, v = accs
        if lora:
            lora_next(2, l)  # lbq_buf read above

        # RoPE on a [B*H, Dh] view; rotate-half = MXU dot with a permutation
        rot32 = rot_ref[...].astype(jnp.float32)

        def rope(x32, out_f32=False):
            x3 = x32.reshape(rows * heads, head_dim)
            xr = jax.lax.dot_general(
                x3, rot32, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = x3 * cos_ref[...] + xr * sin_ref[...]
            y2 = y.reshape(rows, d)
            return y2 if out_f32 else y2.astype(jnp.bfloat16)

        qr = rope(q)
        kr = rope(k)
        v = v.astype(jnp.bfloat16)
        if kv_quant:
            # quantize-dequantize the new k/v per (row, head) — the XLA int8
            # path writes quantized values to the cache BEFORE attending, so
            # the current token is attended through its int8 representation;
            # matching that keeps greedy parity token-exact. The wrapper's
            # quantize_kv on these values reproduces the (int8, scale) pair
            # bit-exactly (max|q|=127 ⇒ the recomputed scale is identical).
            def qdq(x):
                x3 = x.reshape(rows * heads, head_dim).astype(jnp.float32)
                amax = jnp.max(jnp.abs(x3), axis=1, keepdims=True)
                s_ = jnp.maximum(amax, 1e-8) / 127.0
                y = jnp.round(x3 / s_) * s_
                return y.astype(jnp.bfloat16).reshape(rows, d)

            kr = qdq(kr)
            v = qdq(v)

        # --- attention over the cached sequence + the current token ---
        # MXU-centric form (round 3): every [S, ·]-sized op is a dot.
        #   logits[s, h] = kc[s, :] · (q ⊙ G)[:, h]   (block-column q matrix)
        #   ctx_full     = pᵀ · vc   [H, D] on the MXU (32x waste, ~1-2us),
        #   ctx          = ones · (ctx_full ⊙ Gᵀ)     (block-diag extract)
        # vs round 2's [S, D] broadcast-multiply chain: ~4 VPU passes over
        # 2M f32 elements per (layer, sample) — measured 43us/layer; this
        # form leaves only [S, H]- and [H, D]-sized elementwise work.
        gb = g_ref[...]
        gt32 = gt_ref[...].astype(jnp.float32)
        # timing-only ablations (TOKENPACKER_FD_DEBUG, comma-separated):
        # nocache / nologit / noctx / nosm each stub one piece of the
        # attention section so its on-chip cost can be attributed (numerics
        # are wrong under any of them; used by scripts/bench_fused_decode.py)
        cache_on = "nocache" not in dbg
        outs = []
        n_att = batch if "noattn" not in dbg else 0
        for b in range(n_att if use_qg else 0):
            # qg form (T>=1): logits[s, tH+h] = K[s,:]·Qg[:, tH+h] with
            # Qg = (Qᵀ tiled per head) ⊙ (G tiled per query) — one MXU dot
            # replaces T broadcast-multiplies, and the fed tokens' keys ride
            # a second [T, TH] logit block with an in-chunk causal mask (so
            # T=1's separate current-token rank-1 term is subsumed)
            qb = jax.lax.slice(qr, (b * t_tok, 0), ((b + 1) * t_tok, d))
            kn = jax.lax.slice(kr, (b * t_tok, 0), ((b + 1) * t_tok, d))
            vn = jax.lax.slice(v, (b * t_tok, 0), ((b + 1) * t_tok, d))
            e32 = e_ref[...]  # [T, TH] f32
            # Qᵀ replication on the MXU via an NT-form dot with E ([1,D]→
            # [D,1]-style relayouts do not lower in mosaic; NT dots do):
            # qt_rep[d, tH+h] = q[t, d]
            qt_rep = jax.lax.dot_general(
                qb, e32.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [D, TH]
            qg = qt_rep.astype(jnp.bfloat16) * grep_ref[...]
            if cache_on and (b == 0 or not batched_cache):
                k_dma(l, b).wait()
            kslot = b if batched_cache else 0
            kmat = kbuf[kslot]
            if kv_quant:
                # expand per-(position, head) scales to lanes on the MXU
                # (NT-form dot with Gᵀ: ks_exp[s, d] = ks[head(d), s]) and
                # dequantize exactly like the XLA path's dequantize_kv
                # (f32 multiply, then bf16)
                ks_exp = jax.lax.dot_general(
                    ksbuf[kslot], gt32, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [S, D]
                kmat = (kmat.astype(jnp.float32) * ks_exp).astype(jnp.bfloat16)
            logits = (
                jax.lax.dot_general(
                    kmat, qg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )  # [S, TH]
            if cache_on:
                start_next_cache(k_dma, l, b)  # kbuf's last read is above
            ln_new = (
                jax.lax.dot_general(
                    kn, qg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
                + cmask_ref[...]
            )  # [T, TH] — causal among the fed tokens, self included
            iot = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
            len0 = seq_ref[0, b]
            st2 = seq_ref[1, b]
            en2 = seq_ref[2, b]
            valid = (iot < len0) | ((iot >= st2) & (iot < en2))
            logits = jnp.where(valid, logits, NEG)
            m = jnp.maximum(
                jnp.max(logits, axis=0, keepdims=True),
                jnp.max(ln_new, axis=0, keepdims=True),
            )  # [1, TH]
            p = jnp.exp(logits - m)  # [S, TH] f32
            pn = jnp.exp(ln_new - m)  # [T, TH]
            den = jnp.sum(p, axis=0, keepdims=True) + jnp.sum(
                pn, axis=0, keepdims=True
            )  # [1, TH]
            if cache_on and (b == 0 or not batched_cache):
                v_dma(l, b).wait()
            vmat = vbuf[kslot]
            if kv_quant:
                vs_exp = jax.lax.dot_general(
                    vsbuf[kslot], gt32, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [S, D]
                vmat = (vmat.astype(jnp.float32) * vs_exp).astype(jnp.bfloat16)
            ctx_full = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vmat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [TH, D]
            if cache_on:
                start_next_cache(v_dma, l, b)  # vbuf's last read is above
            ctx_full = ctx_full + jax.lax.dot_general(
                pn.astype(jnp.bfloat16), vn, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            masked = ctx_full * grept_ref[...]  # keep each column's own head
            num = jax.lax.dot_general(
                e32, masked, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [T, D] block-diagonal extract
            den_e = jax.lax.dot_general(
                e32 * den, grept_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [T, D] per-(t, head) denominator expanded to lanes
            outs.append(num / den_e)
        for b in range(0 if use_qg else n_att):
            qb = jax.lax.slice(qr, (b, 0), (b + 1, d))  # [1, D] bf16
            if cache_on and (b == 0 or not batched_cache):
                k_dma(l, b).wait()
            kslot = b if batched_cache else 0
            # row-broadcast multiply (sublane broadcast, ~1 VPU pass in
            # bf16) then per-head reduction on the MXU via G — a [1,D]→
            # [D,1] relayout for a q-masked G matrix does not lower
            if "nologit" not in dbg:
                kmat = kbuf[kslot]
                if kv_quant:
                    ks_exp = jax.lax.dot_general(
                        ksbuf[kslot], gt32, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [S, D] — see the qg branch
                    kmat = (kmat.astype(jnp.float32) * ks_exp).astype(jnp.bfloat16)
                logits = (
                    jax.lax.dot_general(
                        kmat * qb, gb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                )  # [S, H]
            else:
                logits = jnp.zeros((s, heads), jnp.float32)
            if cache_on:
                start_next_cache(k_dma, l, b)  # kbuf's last read is above
            kb = jax.lax.slice(kr, (b, 0), (b + 1, d))
            lc = (
                jax.lax.dot_general(
                    kb * qb, gb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )  # [1, H] current-token logit per head
            if "nosm" not in dbg:
                iot = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
                len0 = seq_ref[0, b]
                st2 = seq_ref[1, b]
                en2 = seq_ref[2, b]
                valid = (iot < len0) | ((iot >= st2) & (iot < en2))
                logits = jnp.where(valid, logits, NEG)
                m = jnp.maximum(jnp.max(logits, axis=0, keepdims=True), lc)
                p = jnp.exp(logits - m)  # [S, H] f32
                pc = jnp.exp(lc - m)  # [1, H]
                den = jnp.sum(p, axis=0, keepdims=True) + pc  # [1, H]
            else:
                p = logits
                pc = lc
                den = lc + 1.0
            if cache_on and (b == 0 or not batched_cache):
                v_dma(l, b).wait()
            if "noctx" not in dbg:
                vmat = vbuf[kslot]
                if kv_quant:
                    vs_exp = jax.lax.dot_general(
                        vsbuf[kslot], gt32, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [S, D]
                    vmat = (vmat.astype(jnp.float32) * vs_exp).astype(jnp.bfloat16)
                ctx_full = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), vmat, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [H, D] — only the block diagonal is wanted
            else:
                ctx_full = jnp.zeros((heads, d), jnp.float32) + jnp.sum(p)
            if cache_on:
                start_next_cache(v_dma, l, b)  # vbuf's last read is above
            ctx = jax.lax.dot_general(
                jnp.ones((1, heads), jnp.float32), ctx_full * gt32,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, D]
            vb = jax.lax.slice(v, (b, 0), (b + 1, d)).astype(jnp.float32)
            pc_e = jax.lax.dot_general(
                pc, gt32, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            den_e = jax.lax.dot_general(
                den, gt32, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append((ctx + pc_e * vb) / den_e)
        attn = (
            jnp.concatenate(outs, axis=0).astype(jnp.bfloat16)
            if outs
            else qr
        )  # [B, D]

        ao = o_seg.gemv(attn, starters(gu_segs[0][0]))
        o_sc = o_s_ref[pl.ds(l, 1), :]
        ao = ao * o_sc
        if lora:
            u_o = lora_u(attn, wq, wo)
            lora_dmas[3](l).wait()
            ao = ao + lora_term(u_o, wq, wo, lbo_buf, 0, d)
            lora_next(3, l)
        h = h + ao.astype(jnp.bfloat16)

        ln2 = ln2_ref[pl.ds(l, 1), :].astype(jnp.bfloat16)
        x2 = _rms(h, ln2, eps)
        if lora:
            u_gu = lora_u(x2, wq + wo, wg)
            lora_next(0, l)  # labuf_d's last read
            lora_dmas[4](l).wait()
        # flat MLP segment order (== ring order): gate_0, up_0, gate_1, ...
        # then the down k-segments; each gemv hooks the NEXT flat segment
        mlp_flat = [seg for pair in gu_segs for seg in pair] + down_segs
        x_mlps = []
        for i, (co, nc) in enumerate(mlp_splits):
            g_seg, u_seg = gu_segs[i]
            gate = g_seg.gemv(x2, starters(mlp_flat[2 * i + 1]))
            gate = gate * gu_s_ref[pl.ds(l, 1), co : co + nc]
            up = u_seg.gemv(x2, starters(mlp_flat[2 * i + 2]))
            up = up * gu_s_ref[pl.ds(l, 1), f + co : f + co + nc]
            if lora:
                gate = gate + lora_term(u_gu, wq + wo, wg, lbg_buf, 2 * i * wg, nc)
                up = up + lora_term(u_gu, wq + wo, wg, lbg_buf, (2 * i + 1) * wg, nc)
            # silu in f32 (jax.nn.silu on bf16 plants f32->bf16 broadcasts
            # that fail mosaic verification at some widths — CLAUDE.md)
            x_mlps.append((jax.nn.silu(gate) * up).astype(jnp.bfloat16))
        if lora:
            lora_next(4, l)  # lbg_buf read above
            lora_dmas[1](l).wait()
            u_dn = None
            for i, (co, nc) in enumerate(mlp_splits):
                part = jax.lax.dot_general(
                    x_mlps[i], labuf_f[co : co + nc, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                u_dn = part if u_dn is None else u_dn + part
            lora_next(1, l)
            lora_dmas[5](l).wait()
            v_dn = lora_term(u_dn, wq + wo + wg, wd, lbd_buf, 0, d)
            lora_next(5, l)

        guard = l + 1 < layers
        down_sc = down_s_ref[pl.ds(l, 1), :]
        mo = None
        for i, d_seg in enumerate(down_segs):
            if i + 1 < len(down_segs):
                nxt = starters(down_segs[i + 1])
            else:
                nqs = segs_for(l + 1)[0][0]
                nxt = starters(nqs, guard)
            c = d_seg.gemv(x_mlps[i], nxt)
            mo = c if mo is None else mo + c
        mo = mo * down_sc
        if lora:
            mo = mo + v_dn
        h = h + mo.astype(jnp.bfloat16)

        knew_ref[pl.ds(l, 1), :, :] = kr[None]
        vnew_ref[pl.ds(l, 1), :, :] = v[None]
        return h

    # prologue: start layer 0's first two weight chunks + its first cache pair
    if hooks and "nodma" not in dbg:
        first = segs_for(0)[0][0]
        for _s in range(nslots):
            first.start(_s)
    if "noattn" not in dbg and "nocache" not in dbg:
        k_dma(0, 0).start()
        v_dma(0, 0).start()
    if lora:
        for _dma in lora_dmas:
            _dma(0).start()
    h = jax.lax.fori_loop(0, layers, layer_body, h_ref[...])
    hout_ref[...] = h


@functools.partial(
    jax.jit,
    static_argnames=("layers", "batch", "d", "f", "heads", "head_dim", "s", "eps", "interpret", "packed", "t_tok", "kv_quant", "lora"),
)
def _fused_call(
    seq_info, h0, cos_e, sin_e, rot, gmat, gmat_t, e_mat, grep, grept, cmask,
    ln1, ln2,
    qkv_s, o_s, gu_s, down_s, qkv_q, o_q, gu_q, down_q, k_cache, v_cache,
    k_scales, v_scales, selm, la_d, la_f, lb_qkv, lb_o, lb_gu, lb_down,
    *, layers, batch, d, f, heads, head_dim, s, eps, interpret, packed=False,
    t_tok=1, kv_quant=False, lora=False,
):
    ck_d, ck_f, _ = _layer_chunkplan(d, f)
    ck_max = max(ck_d, ck_f)  # == ck_d == ck_f (uniform full-row ring)
    mlp_splits = _chunks(f, (MAX_WIDE // ck_f) * ck_f)  # mirrors _kernel
    tail_rows = mlp_splits[-1][1] % ck_f
    max_chunks = max(d // ck_d, *(nc // ck_f for _, nc in mlp_splits))
    ring_w = min(max(3 * d, *(nc for _, nc in mlp_splits), d), MAX_WIDE)
    # cache staging group: the whole batch when the scratch total fits the
    # raised 64 MB scoped-vmem stack (one K + one V DMA per layer), else
    # per-sample. TOKENPACKER_FD_CACHE=perb forces the fallback (tests).
    import os as _os

    hd = heads * head_dim
    rows = batch * t_tok
    nslots = _ring_slots()
    fixed = nslots * ck_max * ring_w + max_chunks * rows * ck_max * 2 + max(tail_rows, 8) * d
    # per-sample staged cache bytes: int8 halves the K/V payload, plus the
    # small f32 scale companions — B=8 S=512 int8 fits the batched grouping
    # (≈34 MB) where bf16 (67 MB) does not
    cache_bytes_per_b = 2 * s * (hd * (1 if kv_quant else 2)
                                 + (heads * 4 if kv_quant else 0))
    # slot-LoRA staging buffers count against the scoped-vmem stack too
    lora_buf_shapes = [
        la_d.shape[1:], la_f.shape[1:], lb_qkv.shape[1:],
        lb_o.shape[1:], lb_gu.shape[1:], lb_down.shape[1:],
    ]
    if lora:
        fixed += sum(2 * int(np.prod(sh)) for sh in lora_buf_shapes)
    cache_group = batch
    if (_os.environ.get("TOKENPACKER_FD_CACHE") == "perb"
            or fixed + batch * cache_bytes_per_b > 56 << 20):
        cache_group = 1
    kernel = functools.partial(
        _kernel,
        layers=layers, batch=batch, d=d, f=f, heads=heads,
        head_dim=head_dim, s=s, eps=eps, packed=packed, interp=interpret,
        t_tok=t_tok, kv_quant=kv_quant, lora=lora,
    )
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = lambda: pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem(),
            vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem(),
            any_(), any_(), any_(), any_(), any_(), any_(), any_(), any_(),
            vmem(), any_(), any_(), any_(), any_(), any_(), any_(),
        ],
        out_specs=[vmem(), vmem(), vmem()],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((layers, rows, heads * head_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((layers, rows, heads * head_dim), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((nslots, ck_max // 2, ring_w), jnp.uint16)
            if packed
            else pltpu.VMEM((nslots, ck_max, ring_w), jnp.int8),
            pltpu.VMEM((max_chunks, rows, ck_max), jnp.bfloat16),
            pltpu.VMEM((max(tail_rows // 2, 8), d), jnp.uint16)
            if packed
            else pltpu.VMEM((max(tail_rows, 8), d), jnp.int8),
            pltpu.VMEM((cache_group, s, hd),
                       jnp.int8 if kv_quant else jnp.bfloat16),  # kbuf
            pltpu.VMEM((cache_group, s, hd),
                       jnp.int8 if kv_quant else jnp.bfloat16),  # vbuf
            pltpu.VMEM((cache_group, heads, s) if kv_quant else (1, 8, 128),
                       jnp.float32),  # ksbuf (dummy when bf16 cache)
            pltpu.VMEM((cache_group, heads, s) if kv_quant else (1, 8, 128),
                       jnp.float32),  # vsbuf
            *[pltpu.VMEM(sh, jnp.bfloat16) for sh in lora_buf_shapes],
            pltpu.SemaphoreType.DMA((nslots,)),
            pltpu.SemaphoreType.DMA((11,)),
        ],
        interpret=interpret,
    )(
        seq_info, h0, cos_e, sin_e, rot, gmat, gmat_t, e_mat, grep, grept,
        cmask, ln1, ln2,
        qkv_s, o_s, gu_s, down_s, qkv_q, o_q, gu_q, down_q, k_cache, v_cache,
        k_scales, v_scales, selm, la_d, la_f, lb_qkv, lb_o, lb_gu, lb_down,
    )


def _rot_matrix(head_dim: int) -> np.ndarray:
    """rotate_half(x) = x @ R for the HF half-split convention."""
    half = head_dim // 2
    r = np.zeros((head_dim, head_dim), np.float32)
    for j in range(half):
        r[j + half, j] = -1.0
    for j in range(half, head_dim):
        r[j - half, j] = 1.0
    return r


def _g_matrix(heads: int, head_dim: int) -> np.ndarray:
    """G[d, h] = 1 iff lane d belongs to head h."""
    g = np.zeros((heads * head_dim, heads), np.float32)
    for h in range(heads):
        g[h * head_dim : (h + 1) * head_dim, h] = 1.0
    return g


def _qg_constants(heads: int, head_dim: int, t: int):
    """Constant operands for the qg attention form at T = t fed tokens:
    E [T, T*H] query selector, G tiled per query [D, T*H] (+ transpose),
    and the in-chunk causal mask [T, T*H] (key row t' attends query column
    t*H+h iff t' <= t). At T=1 these degenerate to ones/G/Gᵀ/zeros."""
    th = t * heads
    e = np.zeros((t, th), np.float32)
    for tt in range(t):
        e[tt, tt * heads : (tt + 1) * heads] = 1.0
    g = _g_matrix(heads, head_dim)
    grep = np.tile(g, (1, t))  # [D, T*H]
    tq = np.arange(th) // heads  # query index per column
    cmask = np.where(np.arange(t)[:, None] <= tq[None, :], 0.0, NEG).astype(
        np.float32
    )
    return (
        jnp.asarray(e),
        jnp.asarray(grep, jnp.bfloat16),
        jnp.asarray(grep.T, jnp.float32),
        jnp.asarray(cmask),
    )


def _nrp(nr: int) -> int:
    """Pad a flattened adapter width (n·rcat) to the 128-lane multiple the
    kernel's DMA minor dims and static lane slices require."""
    return -(-nr // 128) * 128


def build_fd_lora(stacks, cfg, dtype=jnp.bfloat16):
    """Kernel-ready slot-LoRA arrays (multi-LoRA serving × fused decode —
    VERDICT r4 #1; the reference can only MERGE one LoRA at load,
    llava/model/builder.py:46-79, so per-request adapters must not cost
    the decode headline).

    stacks: serve/multi_lora.SlotLora stacks for the FUSED params layout —
    {(grp, leaf): (a [L, n, in, rcat], b [L, n, rcat, out])} with keys
    ("attn","qkv"), ("attn","o"), ("mlp","gateup"), ("mlp","down").

    Layout contract (mirrored by _kernel; one source of truth here):
    - per target, adapters flatten into ONE A [L, in, NRp] (columns) and
      ONE B [L, NRp, out] (rows), NRp = n·rcat padded to 128 — zero
      padding is exact (pad columns of A produce u entries whose B rows
      are zero).
    - the three d-input A matrices concatenate along columns in the order
      qkv | o | gateup (one staging DMA per layer); down's A stays alone
      (f-input).
    - B matrices whose `out` exceeds the 12288-lane value limit restack
      their column segments along ROWS, matching the kernel's own segment
      plan: qkv → n_qkv_segs blocks of width d; gate/up → (gate_i, up_i)
      per _layer_chunkplan mlp split, padded to the widest split; o/down
      stay single blocks.
    - `expand` [n, Wm] maps a [rows, n] one-hot selection to the padded
      column mask (Wm = NRp_qkv + NRp_o + NRp_gu + NRp_down, same order).
    """
    d, f = cfg.hidden_size, cfg.intermediate_size
    ck_d, ck_f, n_qkv_segs = _layer_chunkplan(d, f)
    mlp_splits = _chunks(f, (MAX_WIDE // ck_f) * ck_f)

    def flat(key):
        a, b = stacks[key]
        layers, n, din, rcat = a.shape
        out = b.shape[-1]
        nr = n * rcat
        w = _nrp(nr)
        af = jnp.zeros((layers, din, w), dtype).at[..., :nr].set(
            jnp.moveaxis(jnp.asarray(a, dtype), 1, 2).reshape(layers, din, nr)
        )
        bf = jnp.zeros((layers, w, out), dtype).at[:, :nr].set(
            jnp.asarray(b, dtype).reshape(layers, nr, out)
        )
        return af, bf, w, rcat

    a_qkv, b_qkv, wq, rq = flat(("attn", "qkv"))
    a_o, b_o, wo, ro = flat(("attn", "o"))
    a_gu, b_gu, wg, rg = flat(("mlp", "gateup"))
    a_dn, b_dn, wd, rd = flat(("mlp", "down"))
    if n_qkv_segs > 1:  # 13B: 3d > MAX_WIDE — q/k/v column blocks as rows
        b_qkv = jnp.concatenate(
            [b_qkv[..., i * d : (i + 1) * d] for i in range(3)], axis=1
        )
    bw = max(nc for _, nc in mlp_splits)
    blocks = []
    for co, nc in mlp_splits:
        for half in range(2):  # gate_i then up_i — the kernel's gemv order
            blk = b_gu[..., half * f + co : half * f + co + nc]
            if nc < bw:
                blk = jnp.zeros((blk.shape[0], wg, bw), dtype).at[..., :nc].set(blk)
            blocks.append(blk)
    b_gu = jnp.concatenate(blocks, axis=1) if len(blocks) > 1 else blocks[0]

    n = stacks[("attn", "qkv")][0].shape[1]
    expand = np.zeros((n, wq + wo + wg + wd), np.float32)
    off = 0
    for w, rc in ((wq, rq), (wo, ro), (wg, rg), (wd, rd)):
        for j in range(n):
            expand[j, off + j * rc : off + (j + 1) * rc] = 1.0
        off += w
    return {
        "a_d": jnp.concatenate([a_qkv, a_o, a_gu], axis=2),
        "a_f": a_dn,
        "b_qkv": b_qkv,
        "b_o": b_o,
        "b_gu": b_gu,
        "b_down": b_dn,
        "expand": jnp.asarray(expand),
    }


def fused_eligible(lm_params, cfg) -> bool:
    """The kernel serves the int8 fused-projection llama-family decode.

    Geometry gates reflect measured mosaic limits: values wider than 12288
    lanes crash the axon compiler, so D must fit one accumulator; wider
    compound widths split into segments (3D > 12288 → per-projection
    column segments; F > 12288 → gate/up column splits with matching
    down-projection k-splits), which covers 13B (5120/13824/40h)."""
    if cfg.model_family != "llama":
        return False
    if cfg.num_attention_heads != cfg.kv_heads or cfg.head_dim != 128:
        return False
    if cfg.hidden_size % 512 or cfg.intermediate_size % 128:
        return False
    if cfg.hidden_size > MAX_WIDE:
        return False
    layers = lm_params.get("layers", {})
    attn = layers.get("attn", {})
    mlp = layers.get("mlp", {})
    if "qkv" not in attn or "gateup" not in mlp:
        return False
    modes = set()
    for leaf in (attn["qkv"], attn["o"], mlp["gateup"], mlp["down"]):
        k = leaf.get("kernel")
        if isinstance(k, dict) and "qp" in k and k["qp"].dtype == jnp.uint16:
            modes.add("qp")  # u16-row-packed int8 (pack_fused_weights)
        elif isinstance(k, dict) and "q" in k and k["q"].dtype == jnp.int8:
            modes.add("q")
        else:
            return False
        if "lora_a" in k:
            return False
    return len(modes) == 1  # all four matrices in the SAME storage mode



def _lora_args(slot_lora, rows_rep: int):
    """(selm, a_d, a_f, b_qkv, b_o, b_gu, b_down), lora-flag for a
    build_fd_lora bundle (+ its per-step "sel" [B, n] selection rows);
    rows_rep repeats each sample's mask row for verify steps (T>1)."""
    if slot_lora is None:
        dummy = jnp.zeros((1, 8, 128), jnp.bfloat16)
        return (jnp.zeros((1, 128), jnp.float32),) + (dummy,) * 6, False
    sel = slot_lora["sel"].astype(jnp.float32)
    selm = sel @ slot_lora["expand"]  # [B, Wm] padded column mask
    if rows_rep > 1:
        selm = jnp.repeat(selm, rows_rep, axis=0)
    return (
        selm, slot_lora["a_d"], slot_lora["a_f"], slot_lora["b_qkv"],
        slot_lora["b_o"], slot_lora["b_gu"], slot_lora["b_down"],
    ), True


def fused_decode_hidden(lm_params, cfg, h0, cache_k, cache_v, lengths0,
                        start2, end2, write_pos, positions, *, interpret=False,
                        k_scale=None, v_scale=None, slot_lora=None):
    """Run the full decoder stack for one decode step.

    h0: [B, D] bf16 embedded tokens. cache_k/v: [L, B, S, Hkv, Dh].
    lengths0/start2/end2: per-sample attendable ranges [0,len0) ∪
    [start2,end2) over cache slots (the current token is always attended).
    write_pos: cache slot for the new k/v. positions: [B] true positions
    for RoPE. Returns (hidden [B, D] — pre-final-norm, new cache_k/v).

    k_scale/v_scale: [L, B, S, Hkv] f32 when the cache is int8-quantized
    (ops/kv_quant.py format) — the kernel stages int8 K/V (half the cache
    DMA bytes, the dominant per-step traffic at long S) and dequantizes via
    the factored-out scales; the return becomes a 5-tuple
    (hidden, new_k, new_v, new_k_scale, new_v_scale).

    slot_lora: optional build_fd_lora bundle + "sel" [B, n] selection rows
    (multi-LoRA serving) — the kernel adds the masked low-rank correction
    beside each streamed base GEMV.
    """
    from tokenpacker_tpu.models.llama import rope_cos_sin

    layers_p = lm_params["layers"]
    l, b2, s, hkv, dh = cache_k.shape
    b, d = h0.shape
    heads = cfg.num_attention_heads
    f = cfg.intermediate_size

    cos, sin = rope_cos_sin(positions[:, None], dh, cfg.rope_theta)  # [B,1,dh]
    cos_e = jnp.repeat(cos[:, 0], heads, axis=0)  # [B*H, dh] f32
    sin_e = jnp.repeat(sin[:, 0], heads, axis=0)

    rot = jnp.asarray(_rot_matrix(dh), jnp.bfloat16)
    gmat = jnp.asarray(_g_matrix(heads, dh), jnp.bfloat16)
    e_mat, grep, grept, cmask = _qg_constants(heads, dh, 1)
    seq_info = jnp.stack([lengths0, start2, end2]).astype(jnp.int32)  # [3, B]

    qkv = layers_p["attn"]["qkv"]["kernel"]
    o = layers_p["attn"]["o"]["kernel"]
    gu = layers_p["mlp"]["gateup"]["kernel"]
    down = layers_p["mlp"]["down"]["kernel"]
    packed = "qp" in qkv  # u16-row-packed storage (pack_fused_weights)
    wkey = "qp" if packed else "q"
    kv_quant = k_scale is not None
    # scales ride TRANSPOSED ([L, B, H, S]) so the kernel's [H, S] scale DMA
    # has a 128-aligned minor dim (see _kernel's ks_ref note)
    dummy_s = jnp.zeros((1, 1, 8, 128), jnp.float32)
    lora_arrs, lora = _lora_args(slot_lora, 1)

    hidden, k_new, v_new = _fused_call(
        seq_info,
        h0.astype(jnp.bfloat16),
        cos_e, sin_e, rot, gmat, gmat.T, e_mat, grep, grept, cmask,
        layers_p["input_ln"]["scale"].astype(jnp.float32),
        layers_p["post_ln"]["scale"].astype(jnp.float32),
        jnp.squeeze(qkv["scale"], -2).astype(jnp.float32),
        jnp.squeeze(o["scale"], -2).astype(jnp.float32),
        jnp.squeeze(gu["scale"], -2).astype(jnp.float32),
        jnp.squeeze(down["scale"], -2).astype(jnp.float32),
        qkv[wkey], o[wkey], gu[wkey], down[wkey],
        cache_k.reshape(l, b2, s, hkv * dh),
        cache_v.reshape(l, b2, s, hkv * dh),
        jnp.swapaxes(k_scale.astype(jnp.float32), 2, 3) if kv_quant else dummy_s,
        jnp.swapaxes(v_scale.astype(jnp.float32), 2, 3) if kv_quant else dummy_s,
        *lora_arrs,
        layers=l, batch=b, d=d, f=f, heads=heads, head_dim=dh, s=s,
        eps=cfg.rms_norm_eps, interpret=interpret, packed=packed,
        kv_quant=kv_quant, lora=lora,
    )

    rows = jnp.arange(b)
    if kv_quant:
        from tokenpacker_tpu.ops.kv_quant import quantize_kv

        # the kernel returned quantize-dequantized rows: quantize_kv here
        # reproduces the in-kernel (int8, scale) pair bit-exactly
        kq, ksc = quantize_kv(k_new.reshape(l, b, hkv, dh))
        vq, vsc = quantize_kv(v_new.reshape(l, b, hkv, dh))
        return (
            hidden,
            cache_k.at[:, rows, write_pos].set(kq),
            cache_v.at[:, rows, write_pos].set(vq),
            k_scale.at[:, rows, write_pos].set(ksc),
            v_scale.at[:, rows, write_pos].set(vsc),
        )
    new_k = cache_k.at[:, rows, write_pos].set(
        k_new.reshape(l, b, hkv, dh).astype(cache_k.dtype)
    )
    new_v = cache_v.at[:, rows, write_pos].set(
        v_new.reshape(l, b, hkv, dh).astype(cache_v.dtype)
    )
    return hidden, new_k, new_v


def fused_verify_hidden(lm_params, cfg, h0, cache_k, cache_v, lengths0,
                        start2, end2, write_pos0, positions, *,
                        interpret=False, k_scale=None, v_scale=None,
                        slot_lora=None):
    """Run the full decoder stack for a T-token verify step (speculative
    decoding: the last accepted token + the drafts, one weight-streaming
    pass — a verify step costs nearly the same HBM traffic as a 1-token
    step, so every accepted draft is a nearly-free extra token).

    h0: [B, T, D] bf16 embedded tokens. positions: [B, T] RoPE positions.
    lengths0/start2/end2: per-sample attendable CACHE ranges [0,len0) ∪
    [start2,end2) — shared by all T queries; causality among the fed tokens
    themselves is enforced in-kernel (query t attends fed keys 0..t).
    write_pos0: [B] first cache slot — token t writes write_pos0+t.
    Returns (hidden [B, T, D] pre-final-norm, new cache_k, new cache_v).
    k_scale/v_scale: int8-KV scales as in fused_decode_hidden (return
    becomes a 5-tuple with the updated scale arrays appended).
    """
    from tokenpacker_tpu.models.llama import rope_cos_sin

    layers_p = lm_params["layers"]
    l, b2, s, hkv, dh = cache_k.shape
    b, t, d = h0.shape
    heads = cfg.num_attention_heads
    f = cfg.intermediate_size

    pos_flat = positions.reshape(b * t)
    cos, sin = rope_cos_sin(pos_flat[:, None], dh, cfg.rope_theta)  # [B*T,1,dh]
    cos_e = jnp.repeat(cos[:, 0], heads, axis=0)  # [B*T*H, dh] f32
    sin_e = jnp.repeat(sin[:, 0], heads, axis=0)

    rot = jnp.asarray(_rot_matrix(dh), jnp.bfloat16)
    gmat = jnp.asarray(_g_matrix(heads, dh), jnp.bfloat16)
    e_mat, grep, grept, cmask = _qg_constants(heads, dh, t)
    seq_info = jnp.stack([lengths0, start2, end2]).astype(jnp.int32)  # [3, B]

    qkv = layers_p["attn"]["qkv"]["kernel"]
    o = layers_p["attn"]["o"]["kernel"]
    gu = layers_p["mlp"]["gateup"]["kernel"]
    down = layers_p["mlp"]["down"]["kernel"]
    packed = "qp" in qkv
    wkey = "qp" if packed else "q"
    kv_quant = k_scale is not None
    # scales ride TRANSPOSED ([L, B, H, S]) so the kernel's [H, S] scale DMA
    # has a 128-aligned minor dim (see _kernel's ks_ref note)
    dummy_s = jnp.zeros((1, 1, 8, 128), jnp.float32)
    lora_arrs, lora = _lora_args(slot_lora, t)

    hidden, k_new, v_new = _fused_call(
        seq_info,
        h0.reshape(b * t, d).astype(jnp.bfloat16),
        cos_e, sin_e, rot, gmat, gmat.T, e_mat, grep, grept, cmask,
        layers_p["input_ln"]["scale"].astype(jnp.float32),
        layers_p["post_ln"]["scale"].astype(jnp.float32),
        jnp.squeeze(qkv["scale"], -2).astype(jnp.float32),
        jnp.squeeze(o["scale"], -2).astype(jnp.float32),
        jnp.squeeze(gu["scale"], -2).astype(jnp.float32),
        jnp.squeeze(down["scale"], -2).astype(jnp.float32),
        qkv[wkey], o[wkey], gu[wkey], down[wkey],
        cache_k.reshape(l, b2, s, hkv * dh),
        cache_v.reshape(l, b2, s, hkv * dh),
        jnp.swapaxes(k_scale.astype(jnp.float32), 2, 3) if kv_quant else dummy_s,
        jnp.swapaxes(v_scale.astype(jnp.float32), 2, 3) if kv_quant else dummy_s,
        *lora_arrs,
        layers=l, batch=b, d=d, f=f, heads=heads, head_dim=dh, s=s,
        eps=cfg.rms_norm_eps, interpret=interpret, packed=packed, t_tok=t,
        kv_quant=kv_quant, lora=lora,
    )

    rows_bt = jnp.repeat(jnp.arange(b), t)  # sample of each flat row
    wpos_bt = (write_pos0[:, None] + jnp.arange(t)[None, :]).reshape(-1)
    if kv_quant:
        from tokenpacker_tpu.ops.kv_quant import quantize_kv

        kq, ksc = quantize_kv(k_new.reshape(l, b * t, hkv, dh))
        vq, vsc = quantize_kv(v_new.reshape(l, b * t, hkv, dh))
        return (
            hidden.reshape(b, t, d),
            cache_k.at[:, rows_bt, wpos_bt].set(kq),
            cache_v.at[:, rows_bt, wpos_bt].set(vq),
            k_scale.at[:, rows_bt, wpos_bt].set(ksc),
            v_scale.at[:, rows_bt, wpos_bt].set(vsc),
        )
    new_k = cache_k.at[:, rows_bt, wpos_bt].set(
        k_new.reshape(l, b * t, hkv, dh).astype(cache_k.dtype)
    )
    new_v = cache_v.at[:, rows_bt, wpos_bt].set(
        v_new.reshape(l, b * t, hkv, dh).astype(cache_v.dtype)
    )
    return hidden.reshape(b, t, d), new_k, new_v
