"""Single-dispatch fused decode step: the whole 32-layer decoder in ONE
Pallas kernel.

Why: decode is weight-bandwidth-bound, but the measured ~55us per-pallas_call
dispatch floor on v5e (ROADMAP.md) makes per-layer kernels lose — 224
calls/step of dispatch cancels any in-kernel win (w8a8 and the decode
attention kernel both measured net-negative integrated). This kernel removes
the dispatch tax entirely: one `pallas_call` runs an in-kernel
`lax.fori_loop` over layers, streaming every int8 weight matrix from HBM
(`pl.ANY` memory space) through double-buffered async DMA, computing the
per-layer GEMVs + RoPE + attention-over-cache + MLP on data that never
leaves VMEM. The XLA graph per decode step shrinks to: embed lookup →
[this kernel] → final RMSNorm → lm_head → sample.

Replaces (for the quantized llama-family serving path) the per-layer XLA
decode in models/llama._layer — numerics match that path's int8
convert-in-dot semantics modulo f32-vs-bf16 accumulation reorder (tested).
The reference has no analog: its decode is HF `model.generate` over CUDA
kernels (llava/model/language_model/llava_llama.py:120-140).

Design notes (v5e):
- weights stay int8 [L, K, N] (quantize.quantize_tree + fuse_llama_layers
  fused qkv/gateup layout); chunks of K are DMA'd HBM→VMEM and converted
  int8→bf16 in-kernel, overlapped with the next chunk's DMA. Per-chunk
  convert+dot (~6.5us) hides under the chunk DMA (~7.7us at peak BW).
- attention avoids every in-kernel transpose/reshape of the [S, H*D] cache:
  logits[s,h] = sum_d K[s,·]·q via a VPU broadcast-multiply then an MXU dot
  with a block-diagonal ones matrix G [D, H]; probabilities expand back to
  lanes via G^T. The current token's k/v never touch the cache buffer — its
  logit/value ride as a separate rank-1 term in the softmax.
- RoPE's rotate-half is an MXU dot with a [Dh, Dh] permutation matrix on a
  [B*H, Dh] view (the only reshape in the kernel, on a tiny tensor).
- per-sample sequence state (valid ranges, write position) rides SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _chunks(k: int, ck: int):
    """[(offset, size)] covering k in slices of ck (+ a 128-aligned tail)."""
    out = []
    off = 0
    while off < k:
        sz = min(ck, k - off)
        out.append((off, sz))
        off += sz
    return out


class _MatStream:
    """Double-buffered HBM→VMEM weight streamer for one [K, N] matrix of a
    dynamically-indexed layer stack [L, K, N]."""

    def __init__(self, hbm_ref, layer, buf, sem, chunks):
        self.hbm_ref = hbm_ref
        self.layer = layer
        self.buf = buf
        self.sem = sem
        self.chunks = chunks

    def _dma(self, ci: int):
        off, sz = self.chunks[ci]
        slot = ci % 2
        return pltpu.make_async_copy(
            self.hbm_ref.at[self.layer, pl.ds(off, sz), :],
            self.buf.at[slot, pl.ds(0, sz)],
            self.sem.at[slot],
        )

    def start(self, ci: int):
        if ci < len(self.chunks):
            self._dma(ci).start()

    def gemv(self, x, n_out: int):
        """x: [B, K] bf16 → [B, n_out] f32. Chunks 0/1 must be started.

        The convert+dot is tiled to <=2048 output columns per op: the axon
        TPU compile crashes on single vector ops touching more than ~2M
        elements (measured: dot over a [512, 8192] operand fails, [512,
        4096] passes), and slices must stay 128-lane aligned.
        """
        b = x.shape[0]
        n_tiles = _chunks(n_out, 2048)
        accs = [jnp.zeros((b, nsz), jnp.float32) for _, nsz in n_tiles]
        for ci, (off, sz) in enumerate(self.chunks):
            slot = ci % 2
            self._dma(ci).wait()
            xs = jax.lax.slice(x, (0, off), (b, off + sz))
            for ti, (noff, nsz) in enumerate(n_tiles):
                w = self.buf[slot, :sz, noff : noff + nsz].astype(jnp.bfloat16)
                accs[ti] = accs[ti] + jax.lax.dot_general(
                    xs, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            # reuses this chunk's slot — must be issued after its compute
            self.start(ci + 2)
        return jnp.concatenate(accs, axis=1) if len(accs) > 1 else accs[0]


def _rms(h, w_row, eps):
    """h [B, D]; w_row [1, D] bf16. Matches ops.layers.rms_norm numerics."""
    h32 = h.astype(jnp.float32)
    var = jnp.mean(h32 * h32, axis=1, keepdims=True)
    y = (h32 * jax.lax.rsqrt(var + eps)).astype(jnp.bfloat16)
    return y * w_row


def _kernel(
    # inputs
    seq_ref,  # SMEM [4, B] int32: len0 / start2 / end2 (excl) / wpos
    h_ref,  # [B, D] bf16
    cos_ref,  # [B*H, Dh] f32 (per-head expanded)
    sin_ref,
    rot_ref,  # [Dh, Dh] bf16 rotate-half permutation
    g_ref,  # [D, H] bf16 block-diagonal ones
    ln1_ref,  # [L, D] bf16
    ln2_ref,
    qkv_s_ref,  # [L, 3D] f32
    o_s_ref,  # [L, D]
    gu_s_ref,  # [L, 2F]
    down_s_ref,  # [L, D]
    qkv_ref,  # ANY [L, D, 3D] int8
    o_ref,  # ANY [L, D, D]
    gu_ref,  # ANY [L, D, 2F]
    down_ref,  # ANY [L, F, D]
    kc_ref,  # ANY [L, B, S, HD] bf16
    vc_ref,
    # outputs
    hout_ref,  # [B, D] bf16
    knew_ref,  # [L, B, HD] bf16
    vnew_ref,
    # scratch
    qkv_buf,
    o_buf,
    gu_buf,
    down_buf,
    kbuf,  # [2, S, HD] bf16
    vbuf,
    qkv_sem,
    o_sem,
    gu_sem,
    down_sem,
    k_sem,
    v_sem,
    *,
    layers: int,
    batch: int,
    d: int,
    f: int,
    heads: int,
    head_dim: int,
    s: int,
    eps: float,
):
    ck_d = qkv_buf.shape[1]
    ck_f = down_buf.shape[1]
    d_chunks = _chunks(d, ck_d)
    f_chunks = _chunks(f, ck_f)
    scale = head_dim**-0.5

    def kv_dma(l, b):
        slot = b % 2
        return (
            pltpu.make_async_copy(kc_ref.at[l, b], kbuf.at[slot], k_sem.at[slot]),
            pltpu.make_async_copy(vc_ref.at[l, b], vbuf.at[slot], v_sem.at[slot]),
        )

    def layer_body(l, h):
        qkv = _MatStream(qkv_ref, l, qkv_buf, qkv_sem, d_chunks)
        o = _MatStream(o_ref, l, o_buf, o_sem, d_chunks)
        gu = _MatStream(gu_ref, l, gu_buf, gu_sem, d_chunks)
        down = _MatStream(down_ref, l, down_buf, down_sem, f_chunks)

        qkv.start(0)
        qkv.start(1)
        for dma in kv_dma(l, 0):
            dma.start()

        ln1 = ln1_ref[pl.ds(l, 1), :]
        x1 = _rms(h, ln1, eps)
        qkv_acc = qkv.gemv(x1, 3 * d)
        o.start(0)
        o.start(1)
        qkv_sc = qkv_s_ref[pl.ds(l, 1), :]
        qkv_acc = qkv_acc * qkv_sc

        q = jax.lax.slice(qkv_acc, (0, 0), (batch, d))
        k = jax.lax.slice(qkv_acc, (0, d), (batch, 2 * d))
        v = jax.lax.slice(qkv_acc, (0, 2 * d), (batch, 3 * d)).astype(jnp.bfloat16)

        # RoPE on a [B*H, Dh] view; rotate-half = MXU dot with a permutation
        rot32 = rot_ref[...].astype(jnp.float32)

        def rope(x32):
            x3 = x32.reshape(batch * heads, head_dim)
            xr = jax.lax.dot_general(
                x3, rot32, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = x3 * cos_ref[...] + xr * sin_ref[...]
            return y.reshape(batch, d).astype(jnp.bfloat16)

        qr = rope(q)
        kr = rope(k)

        # --- attention over the cached sequence + the current token ---
        g32 = g_ref[...].astype(jnp.float32)
        outs = []
        for b in range(batch):
            for dma in kv_dma(l, b):
                dma.wait()
            if b + 1 < batch:
                for dma in kv_dma(l, b + 1):
                    dma.start()
            kc = kbuf[b % 2]  # [S, HD] bf16
            vc = vbuf[b % 2]
            qb = jax.lax.slice(qr, (b, 0), (b + 1, d))  # [1, D] bf16
            pk = (kc * qb).astype(jnp.float32)  # [S, D]
            logits = (
                jax.lax.dot_general(
                    pk.astype(jnp.bfloat16), g32.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )  # [S, H]
            kb = jax.lax.slice(kr, (b, 0), (b + 1, d))
            lc = (
                jax.lax.dot_general(
                    (kb * qb).astype(jnp.float32), g32,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )  # [1, H]
            iot = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
            len0 = seq_ref[0, b]
            st2 = seq_ref[1, b]
            en2 = seq_ref[2, b]
            valid = (iot < len0) | ((iot >= st2) & (iot < en2))
            logits = jnp.where(valid, logits, NEG)
            m = jnp.maximum(jnp.max(logits, axis=0, keepdims=True), lc)  # [1, H]
            p = jnp.exp(logits - m)  # [S, H]
            pc = jnp.exp(lc - m)  # [1, H]
            den = jnp.sum(p, axis=0, keepdims=True) + pc  # [1, H]
            pex = jax.lax.dot_general(
                p.astype(jnp.bfloat16), g32.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [S, D] per-head prob broadcast to its lanes
            ctx = jax.lax.dot_general(
                jnp.ones((1, s), jnp.float32), pex * vc.astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, D]
            vb = jax.lax.slice(v, (b, 0), (b + 1, d)).astype(jnp.float32)
            pc_e = jax.lax.dot_general(
                pc, g32, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            den_e = jax.lax.dot_general(
                den, g32, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append((ctx + pc_e * vb) / den_e)
        attn = jnp.concatenate(outs, axis=0).astype(jnp.bfloat16)  # [B, D]

        ao = o.gemv(attn, d)
        gu.start(0)
        gu.start(1)
        o_sc = o_s_ref[pl.ds(l, 1), :]
        h = h + (ao * o_sc).astype(jnp.bfloat16)

        ln2 = ln2_ref[pl.ds(l, 1), :]
        x2 = _rms(h, ln2, eps)
        gu_acc = gu.gemv(x2, 2 * f)
        down.start(0)
        down.start(1)
        gu_sc = gu_s_ref[pl.ds(l, 1), :]
        gu_acc = gu_acc * gu_sc
        gate = jax.lax.slice(gu_acc, (0, 0), (batch, f))
        up = jax.lax.slice(gu_acc, (0, f), (batch, 2 * f))
        x_mlp = (jax.nn.silu(gate) * up).astype(jnp.bfloat16)

        mo = down.gemv(x_mlp, d)
        down_sc = down_s_ref[pl.ds(l, 1), :]
        h = h + (mo * down_sc).astype(jnp.bfloat16)

        knew_ref[pl.ds(l, 1), :, :] = kr[None]
        vnew_ref[pl.ds(l, 1), :, :] = v[None]
        return h

    h = jax.lax.fori_loop(0, layers, layer_body, h_ref[...])
    hout_ref[...] = h


@functools.partial(
    jax.jit,
    static_argnames=("layers", "batch", "d", "f", "heads", "head_dim", "s", "eps", "interpret"),
)
def _fused_call(
    seq_info, h0, cos_e, sin_e, rot, gmat, ln1, ln2,
    qkv_s, o_s, gu_s, down_s, qkv_q, o_q, gu_q, down_q, k_cache, v_cache,
    *, layers, batch, d, f, heads, head_dim, s, eps, interpret,
):
    ck_d = 512
    ck_f = min(f, 1024)
    kernel = functools.partial(
        _kernel,
        layers=layers, batch=batch, d=d, f=f, heads=heads,
        head_dim=head_dim, s=s, eps=eps,
    )
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = lambda: pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem(),
            vmem(), vmem(), vmem(), vmem(),
            any_(), any_(), any_(), any_(), any_(), any_(),
        ],
        out_specs=[vmem(), vmem(), vmem()],
        out_shape=[
            jax.ShapeDtypeStruct((batch, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((layers, batch, heads * head_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((layers, batch, heads * head_dim), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ck_d, 3 * d), jnp.int8),
            pltpu.VMEM((2, ck_d, d), jnp.int8),
            pltpu.VMEM((2, ck_d, 2 * f), jnp.int8),
            pltpu.VMEM((2, ck_f, d), jnp.int8),
            pltpu.VMEM((2, s, heads * head_dim), jnp.bfloat16),
            pltpu.VMEM((2, s, heads * head_dim), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        seq_info, h0, cos_e, sin_e, rot, gmat, ln1, ln2,
        qkv_s, o_s, gu_s, down_s, qkv_q, o_q, gu_q, down_q, k_cache, v_cache,
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


def fused_eligible(lm_params, cfg) -> bool:
    """The kernel serves the int8 fused-projection llama-family decode."""
    if cfg.model_family != "llama":
        return False
    if cfg.num_attention_heads != cfg.kv_heads or cfg.head_dim != 128:
        return False
    if cfg.hidden_size % 512 or cfg.intermediate_size % 128:
        return False
    layers = lm_params.get("layers", {})
    attn = layers.get("attn", {})
    mlp = layers.get("mlp", {})
    if "qkv" not in attn or "gateup" not in mlp:
        return False
    for leaf in (attn["qkv"], attn["o"], mlp["gateup"], mlp["down"]):
        k = leaf.get("kernel")
        if not (isinstance(k, dict) and "q" in k and k["q"].dtype == jnp.int8):
            return False
        if "lora_a" in k:
            return False
    return True


def fused_decode_hidden(lm_params, cfg, h0, cache_k, cache_v, lengths0,
                        start2, end2, write_pos, positions, *, interpret=False):
    """Run the full decoder stack for one decode step.

    h0: [B, D] bf16 embedded tokens. cache_k/v: [L, B, S, Hkv, Dh].
    lengths0/start2/end2: per-sample attendable ranges [0,len0) ∪
    [start2,end2) over cache slots (the current token is always attended).
    write_pos: cache slot for the new k/v. positions: [B] true positions
    for RoPE. Returns (hidden [B, D] — pre-final-norm, new cache_k/v).
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
    seq_info = jnp.stack(
        [lengths0, start2, end2, write_pos]
    ).astype(jnp.int32)  # [4, B]

    qkv = layers_p["attn"]["qkv"]["kernel"]
    o = layers_p["attn"]["o"]["kernel"]
    gu = layers_p["mlp"]["gateup"]["kernel"]
    down = layers_p["mlp"]["down"]["kernel"]

    hidden, k_new, v_new = _fused_call(
        seq_info,
        h0.astype(jnp.bfloat16),
        cos_e, sin_e, rot, gmat,
        layers_p["input_ln"]["scale"].astype(jnp.bfloat16),
        layers_p["post_ln"]["scale"].astype(jnp.bfloat16),
        jnp.squeeze(qkv["scale"], -2).astype(jnp.float32),
        jnp.squeeze(o["scale"], -2).astype(jnp.float32),
        jnp.squeeze(gu["scale"], -2).astype(jnp.float32),
        jnp.squeeze(down["scale"], -2).astype(jnp.float32),
        qkv["q"], o["q"], gu["q"], down["q"],
        cache_k.reshape(l, b2, s, hkv * dh),
        cache_v.reshape(l, b2, s, hkv * dh),
        layers=l, batch=b, d=d, f=f, heads=heads, head_dim=dh, s=s,
        eps=cfg.rms_norm_eps, interpret=interpret,
    )

    rows = jnp.arange(b)
    new_k = cache_k.at[:, rows, write_pos].set(
        k_new.reshape(l, b, hkv, dh).astype(cache_k.dtype)
    )
    new_v = cache_v.at[:, rows, write_pos].set(
        v_new.reshape(l, b, hkv, dh).astype(cache_v.dtype)
    )
    return hidden, new_k, new_v
