"""Pallas flash attention for TPU (forward + backward, additive bias).

TPU-native replacement for the reference's accelerator kernels
(SURVEY.md §2.6): the in-repo Triton flash-attention kernel
(llava/model/language_model/mpt/flash_attn_triton.py:51-483, used for MPT
attn_impl='triton' with ALiBi bias) and the external flash-attn CUDA library
patched into LLaMA training (llava/train/llama_flash_attn_monkey_patch.py).

Design:
- online-softmax forward over KV blocks held in VMEM; one grid step per
  (batch*head, q_block); runs the two matmuls per block on the MXU in fp32
  accumulation;
- supports causal masking (block-skipped: KV blocks fully above the diagonal
  are never visited via a masked accumulation) and an optional additive bias
  (ALiBi / padding) broadcast [1|N, 1|H, Tq, Tk];
- backward via recomputation (flash-attention-2 style): dQ, dK, dV computed
  in a second Pallas kernel pass using the saved softmax statistics;
- block sizes default to (128, 128) — MXU-aligned; head_dim padded to 128.

The jnp reference path (`attention_reference`) defines the semantics; the
kernel is property-tested against it (tests/test_flash_attention.py), and
interpret mode makes it runnable on CPU.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; interpret mode is used in tests
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

NEG_INF = -1e30


def attention_reference(q, k, v, bias=None, causal=False, scale=None):
    """Semantics oracle: q [N,Tq,H,D], k/v [N,Tk,H,D], bias [N|1,H|1,Tq,Tk].
    fp32 softmax; returns [N,Tq,H,D] in q.dtype."""
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5
    logits = jnp.einsum("nqhd,nkhd->nhqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        tq, tk = logits.shape[-2], logits.shape[-1]
        qpos = jnp.arange(tq)[:, None] + (tk - tq)
        kpos = jnp.arange(tk)[None, :]
        logits = jnp.where(kpos <= qpos, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("nhqk,nkhd->nqhd", probs.astype(q.dtype), v)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, causal, scale,
                block_k, tk_valid, tq, tk):
    """Grid: (batch*heads, num_q_blocks). Blocks:
    q [1, bq, D], k/v [1, Tk_pad, D], bias [1, bq, Tk_pad] (optional),
    o [1, bq, D], lse [1, bq]."""
    q = q_ref[0].astype(jnp.float32) * scale  # [bq, D]
    bq = q.shape[0]
    qi = pl.program_id(1)
    q_start = qi * bq

    m = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, q.shape[1]), jnp.float32)

    num_kb = tk // block_k

    def body(kb, carry):
        m, l, acc = carry
        k_start = kb * block_k
        kblk = k_ref[0, pl.ds(k_start, block_k), :].astype(jnp.float32)  # [bk, D]
        vblk = v_ref[0, pl.ds(k_start, block_k), :].astype(jnp.float32)
        s = q @ kblk.T  # [bq, bk]
        if bias_ref is not None:
            s = s + bias_ref[0, :, pl.ds(k_start, block_k)].astype(jnp.float32)
        kpos = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        valid = kpos < tk_valid
        if causal:
            qpos = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0) + (
                tk_valid - tq
            )
            valid = valid & (kpos <= qpos)
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + p @ vblk
        return m_new, l_new, acc_new

    if causal:
        # skip KV blocks entirely above the causal diagonal
        q_hi = q_start + bq - 1 + (tk_valid - tq)
        num_kb_needed = jnp.minimum(num_kb, (q_hi // block_k) + 1)
        m, l, acc = jax.lax.fori_loop(0, num_kb_needed, body, (m, l, acc))
    else:
        m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m, l, acc))

    l_safe = jnp.where(l == 0, 1.0, l)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    # Sentinel fully-masked rows (zero valid keys, e.g. causal with Tq > Tk)
    # with +inf so both backwards get p = exp(s - lse) = 0 instead of
    # exp(s + 1e30) = inf → NaN grads.
    lse_ref[0] = jnp.where(l == 0, jnp.inf, m + jnp.log(l_safe))  # [bq, 1]


def _is_key_bias(bias) -> bool:
    """[1, H|1, 1, Tk]: a per-key additive bias (ALiBi's exact shape)."""
    return bias.shape[0] == 1 and bias.shape[-2] == 1


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.lru_cache(maxsize=None)
def _make_flash(causal, scale, block_q, block_k, interpret):
    """Build a custom_vjp flash attention for one static config."""

    @jax.custom_vjp
    def attn(q, k, v, bias):
        o, _ = _flash_fwd(q, k, v, bias, causal, scale, block_q, block_k, interpret)
        return o

    def fwd(q, k, v, bias):
        return _flash_fwd(q, k, v, bias, causal, scale, block_q, block_k, interpret)

    def bwd(res, do):
        q, k, v, bias, o, lse = res
        if bias is None:
            dq, dk, dv = _flash_bwd_pallas(
                q, k, v, o, lse, do, causal, scale, block_q, block_k, interpret
            )
            return dq, dk, dv, None
        if _is_key_bias(bias):
            # key-only bias ([1, H, 1, Tk] — the ALiBi shape): full Pallas
            # backward with the bias folded into the logit recompute. The
            # bias itself is treated as NON-TRAINABLE (ALiBi slopes are
            # constants; the zero cotangent is DCE'd) — every MPT training
            # step takes this path instead of the XLA recompute fallback.
            dq, dk, dv = _flash_bwd_pallas(
                q, k, v, o, lse, do, causal, scale, block_q, block_k, interpret,
                bias=bias,
            )
            return dq, dk, dv, jnp.zeros_like(bias)
        # full-bias path (trainable [.., Tq, Tk] biases): dbias needs the
        # full matrix anyway, so the XLA recompute backward is the right tool
        return _flash_bwd_reference(q, k, v, bias, o, lse, do, causal, scale)

    attn.defvjp(fwd, bwd)
    return attn


def flash_attention(q, k, v, bias=None, causal=False, scale=None,
                    block_q=128, block_k=128, interpret=False):
    """q [N,Tq,H,D], k/v [N,Tk,H,D], bias [N|1,H|1,Tq,Tk] → [N,Tq,H,D]."""
    return _make_flash(causal, scale, block_q, block_k, interpret)(q, k, v, bias)


def _flash_fwd(q, k, v, bias, causal, scale, block_q, block_k, interpret):
    n, tq, h, d = q.shape
    tk = k.shape[1]
    scale_v = scale if scale is not None else d**-0.5

    # layout: fold heads into batch; pad Tq/Tk/D to block multiples
    qf = _pad_to(_pad_to(q.transpose(0, 2, 1, 3).reshape(n * h, tq, d), 1, block_q), 2, 128)
    kf = _pad_to(_pad_to(k.transpose(0, 2, 1, 3).reshape(n * h, tk, d), 1, block_k), 2, 128)
    vf = _pad_to(_pad_to(v.transpose(0, 2, 1, 3).reshape(n * h, tk, d), 1, block_k), 2, 128)
    tq_p, tk_p, d_p = qf.shape[1], kf.shape[1], qf.shape[2]

    bias_f = None
    key_bias = bias is not None and _is_key_bias(bias)
    if key_bias:
        # [1, H, 1, Tk] → [H, 1, Tk_p]; the kernel's bias-slice broadcasts
        # the [1, bk] row over the q block, so no [Tq, Tk] materialization
        bias_f = _pad_to(
            jnp.broadcast_to(bias, (1, h, 1, tk)).reshape(h, 1, tk), 2, block_k
        )
    elif bias is not None:
        bias_b = jnp.broadcast_to(bias, (n, h, tq, tk)).reshape(n * h, tq, tk)
        bias_f = _pad_to(_pad_to(bias_b, 1, block_q), 2, block_k)

    grid = (n * h, tq_p // block_q)
    kernel = functools.partial(
        _fwd_kernel,
        causal=causal,
        scale=scale_v,
        block_k=block_k,
        tk_valid=tk,
        tq=tq,
        tk=tk_p,
    )
    in_specs = [
        pl.BlockSpec((1, block_q, d_p), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, tk_p, d_p), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, tk_p, d_p), lambda b, i: (b, 0, 0)),
    ]
    args = [qf, kf, vf]
    if bias_f is not None:
        if key_bias:
            in_specs.append(
                pl.BlockSpec((1, 1, tk_p), lambda b, i, h=h: (jax.lax.rem(b, h), 0, 0))
            )
        else:
            in_specs.append(pl.BlockSpec((1, block_q, tk_p), lambda b, i: (b, i, 0)))
        args.append(bias_f)
        wrapped = kernel
    else:
        wrapped = functools.partial(_bias_none_wrapper, kernel)

    o, lse = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, d_p), lambda b, i: (b, i, 0)),
            # lse carries a trailing singleton dim to satisfy TPU tiling
            # (last block dim must equal the array dim or divide 128)
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n * h, tq_p, d_p), q.dtype),
            jax.ShapeDtypeStruct((n * h, tq_p, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*args)

    o = o[:, :tq, :d].reshape(n, h, tq, d).transpose(0, 2, 1, 3)
    return o, (q, k, v, bias, o, lse[:, :tq, 0])


def _bias_none_wrapper(kernel, q_ref, k_ref, v_ref, o_ref, lse_ref):
    kernel(q_ref, k_ref, v_ref, None, o_ref, lse_ref)


def _dq_nobias_wrapper(kernel, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref):
    kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, None, dq_ref)


def _dkv_nobias_wrapper(kernel, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                        dk_ref, dv_ref):
    kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, None, dk_ref, dv_ref)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bias_ref, dq_ref, *,
               causal, scale, block_k, tk_valid, tq, tk):
    """dQ pass. Grid (BH, q_blocks). Blocks: q/do/dq [1, bq, D],
    k/v [1, Tk, D], lse/delta [1, bq, 1], bias (key-only) [1, 1, Tk]."""
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # [bq, 1]
    delta = delta_ref[0]
    bq = q.shape[0]
    qi = pl.program_id(1)
    q_start = qi * bq
    dq = jnp.zeros_like(q)
    num_kb = tk // block_k

    def body(kb, dq):
        k_start = kb * block_k
        kblk = k_ref[0, pl.ds(k_start, block_k), :].astype(jnp.float32)
        vblk = v_ref[0, pl.ds(k_start, block_k), :].astype(jnp.float32)
        s = (q @ kblk.T) * scale
        if bias_ref is not None:
            s = s + bias_ref[0, :, pl.ds(k_start, block_k)].astype(jnp.float32)
        kpos = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        valid = kpos < tk_valid
        if causal:
            qpos = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0) + (
                tk_valid - tq
            )
            valid = valid & (kpos <= qpos)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dp = do @ vblk.T
        ds = p * (dp - delta)
        return dq + (ds @ kblk) * scale

    if causal:
        q_hi = q_start + bq - 1 + (tk_valid - tq)
        num_needed = jnp.minimum(num_kb, (q_hi // block_k) + 1)
        dq = jax.lax.fori_loop(0, num_needed, body, dq)
    else:
        dq = jax.lax.fori_loop(0, num_kb, body, dq)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bias_ref,
                dk_ref, dv_ref, *,
                causal, scale, block_q, tk_valid, tq, tq_pad):
    """dK/dV pass. Grid (BH, kv_blocks). Blocks: k/v/dk/dv [1, bk, D],
    q/do [1, Tq, D], lse/delta [1, Tq, 1], bias (key-only) [1, 1, bk]."""
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bk = k.shape[0]
    ki = pl.program_id(1)
    k_start = ki * bk
    dk = jnp.zeros_like(k)
    dv = jnp.zeros_like(v)
    num_qb = tq_pad // block_q

    def body(qb, carry):
        dk, dv = carry
        q_start = qb * block_q
        qblk = q_ref[0, pl.ds(q_start, block_q), :].astype(jnp.float32)
        doblk = do_ref[0, pl.ds(q_start, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(q_start, block_q), :]
        delta = delta_ref[0, pl.ds(q_start, block_q), :]
        s = (qblk @ k.T) * scale  # [bq, bk]
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)  # [1, bk] broadcasts
        kpos = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 1)
        qpos_row = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 0)
        valid = (kpos < tk_valid) & (qpos_row < tq)
        if causal:
            valid = valid & (kpos <= qpos_row + (tk_valid - tq))
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dv = dv + p.T @ doblk
        dp = doblk @ v.T
        ds = p * (dp - delta)
        dk = dk + (ds.T @ qblk) * scale
        return dk, dv

    if causal:
        # q blocks strictly before this kv block's first visible query are skipped
        first_q = jnp.maximum((k_start - (tk_valid - tq)) // block_q, 0)
        dk, dv = jax.lax.fori_loop(first_q, num_qb, body, (dk, dv))
    else:
        dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk, dv))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd_pallas(q, k, v, o, lse, do, causal, scale, block_q, block_k, interpret,
                      bias=None):
    """Two-pass Pallas backward: dQ over KV blocks, dK/dV over Q blocks,
    probabilities recomputed from the saved LSE. bias, when given, must be
    key-only ([1, H|1, 1, Tk], e.g. ALiBi) and is treated as a constant."""
    n, tq, h, d = q.shape
    tk = k.shape[1]
    scale_v = scale if scale is not None else d**-0.5

    qf = _pad_to(_pad_to(q.transpose(0, 2, 1, 3).reshape(n * h, tq, d), 1, block_q), 2, 128)
    kf = _pad_to(_pad_to(k.transpose(0, 2, 1, 3).reshape(n * h, tk, d), 1, block_k), 2, 128)
    vf = _pad_to(_pad_to(v.transpose(0, 2, 1, 3).reshape(n * h, tk, d), 1, block_k), 2, 128)
    dof = _pad_to(_pad_to(do.transpose(0, 2, 1, 3).reshape(n * h, tq, d), 1, block_q), 2, 128)
    tq_p, tk_p, d_p = qf.shape[1], kf.shape[1], qf.shape[2]

    # delta = rowsum(dO * O); lse already [BH, Tq] — pad both with safe values
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1).reshape(n * h, tq)
    delta = _pad_to(delta[..., None], 1, block_q)  # [BH, Tq_p, 1]
    # pad lse with +inf so exp(s - lse) = 0 on pad query rows
    lse_p = jnp.pad(lse[..., None], ((0, 0), (0, tq_p - tq), (0, 0)),
                    constant_values=jnp.inf)

    bias_f = None
    if bias is not None:
        assert _is_key_bias(bias), "pallas bwd only supports key-only biases"
        bias_f = _pad_to(
            jnp.broadcast_to(bias, (1, h, 1, tk)).reshape(h, 1, tk), 2, block_k
        )

    dq_kernel = functools.partial(
        _dq_kernel, causal=causal, scale=scale_v, block_k=block_k,
        tk_valid=tk, tq=tq, tk=tk_p,
    )
    dq_in_specs = [
        pl.BlockSpec((1, block_q, d_p), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, tk_p, d_p), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, tk_p, d_p), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, block_q, d_p), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0)),
    ]
    dq_args = [qf, kf, vf, dof, lse_p, delta]
    if bias_f is not None:
        dq_in_specs.append(
            pl.BlockSpec((1, 1, tk_p), lambda b, i, h=h: (jax.lax.rem(b, h), 0, 0))
        )
        dq_args.append(bias_f)
        dq_wrapped = dq_kernel
    else:
        dq_wrapped = functools.partial(_dq_nobias_wrapper, dq_kernel)
    dq = pl.pallas_call(
        dq_wrapped,
        grid=(n * h, tq_p // block_q),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((1, block_q, d_p), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n * h, tq_p, d_p), q.dtype),
        interpret=interpret,
    )(*dq_args)

    dkv_kernel = functools.partial(
        _dkv_kernel, causal=causal, scale=scale_v, block_q=block_q,
        tk_valid=tk, tq=tq, tq_pad=tq_p,
    )
    dkv_in_specs = [
        pl.BlockSpec((1, tq_p, d_p), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, block_k, d_p), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, block_k, d_p), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, tq_p, d_p), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, tq_p, 1), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, tq_p, 1), lambda b, i: (b, 0, 0)),
    ]
    dkv_args = [qf, kf, vf, dof, lse_p, delta]
    if bias_f is not None:
        dkv_in_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda b, i, h=h: (jax.lax.rem(b, h), 0, i))
        )
        dkv_args.append(bias_f)
        dkv_wrapped = dkv_kernel
    else:
        dkv_wrapped = functools.partial(_dkv_nobias_wrapper, dkv_kernel)
    dk, dv = pl.pallas_call(
        dkv_wrapped,
        grid=(n * h, tk_p // block_k),
        in_specs=dkv_in_specs,
        out_specs=[
            pl.BlockSpec((1, block_k, d_p), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d_p), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n * h, tk_p, d_p), k.dtype),
            jax.ShapeDtypeStruct((n * h, tk_p, d_p), v.dtype),
        ],
        interpret=interpret,
    )(*dkv_args)

    def unfold(x, t):
        return x[:, :t, :d].reshape(n, h, t, d).transpose(0, 2, 1, 3)

    return unfold(dq, tq), unfold(dk, tk), unfold(dv, tk)


def _flash_bwd_reference(q, k, v, bias, o, lse, do, causal, scale):
    """Backward by recomputation from saved LSE, in fp32 (XLA fuses this
    well on TPU; a hand-written Pallas bwd kernel is a further optimization).

    dS = P * (dP - rowsum(dO * O)); dQ = dS K; dK = dS^T Q; dV = P^T dO.
    """
    n, tq, h, d = q.shape
    tk = k.shape[1]
    scale_v = scale if scale is not None else d**-0.5
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dof = do.astype(jnp.float32)

    logits = jnp.einsum("nqhd,nkhd->nhqk", qf, kf) * scale_v
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        qpos = jnp.arange(tq)[:, None] + (tk - tq)
        kpos = jnp.arange(tk)[None, :]
        logits = jnp.where(kpos <= qpos, logits, NEG_INF)
    # rebuild probabilities from saved LSE: p = exp(logits - lse)
    lse_b = lse.reshape(n, h, tq, 1)
    p = jnp.exp(logits - lse_b)

    dp = jnp.einsum("nqhd,nkhd->nhqk", dof, vf)
    delta = jnp.sum(dof * o.astype(jnp.float32), axis=-1)  # [N,Tq,H]
    ds = p * (dp - delta.transpose(0, 2, 1)[..., None])
    dq = jnp.einsum("nhqk,nkhd->nqhd", ds, kf) * scale_v
    dk = jnp.einsum("nhqk,nqhd->nkhd", ds, qf) * scale_v
    dv = jnp.einsum("nhqk,nqhd->nkhd", p, dof)
    dbias = None
    if bias is not None:
        db = ds
        # reduce over broadcast dims of the original bias shape
        target = bias.shape
        if target[0] == 1:
            db = db.sum(axis=0, keepdims=True)
        if target[1] == 1:
            db = db.sum(axis=1, keepdims=True)
        dbias = db.astype(bias.dtype)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dbias


def mha_flash(q, k, v, bias=None, causal=True, interpret=False):
    """Convenience wrapper with GQA support: repeats kv heads if needed."""
    hq, hkv = q.shape[2], k.shape[2]
    if hq != hkv:
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    return flash_attention(q, k, v, bias, causal, None, 128, 128, interpret)
