"""Pallas TPU flash attention (forward) with optional key-validity masking.

Used for the large-sequence attentions where unfused SDPA materializes huge
logit tensors in HBM:

- Hiera global-attention blocks (q = kv = 4096 tokens) — reference
  hieradet.py:39-81 runs SDPA there;
- memory attention self (4096 x 4096) and cross (4096 q x up to ~28.8k kv)
  layers — reference memory_attention.py / transformer.py:297-424. The kv
  validity mask replaces the reference's two dynamic-shape TRT graphs.

Online-softmax blockwise algorithm (Dao et al.), fp32 accumulation, bf16
matmul inputs. Head dim is padded to a lane multiple (128) by the wrapper.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sam2_opt_tpu.ops.posenc import apply_rotary_split

NEG_INF = -1e30


# --------------------------------------------------------------------------- #
# Shared online-softmax accumulator (traced Python — zero runtime cost to
# share across the kernel variants; only the score prologue differs).
# --------------------------------------------------------------------------- #


def _ns_init(m_scr, l_scr, acc_scr):
    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)


def _ns_update(s, v, m_scr, l_scr, acc_scr, fast_exp: bool):
    """One blockwise update: fold score block s [bq, bk] and value block
    v [bk, d] into the running (m, l, acc) scratch."""
    m_prev = m_scr[:, :1]                       # [bq, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)   # [bq, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)             # [bq, 1]
    if fast_exp:
        # bf16 probabilities (the Pallas analogue of SAM2_TPU_FAST_SOFTMAX):
        # bf16 shares fp32's exponent range so max-subtraction stays safe;
        # the pv matmul still accumulates fp32 on the MXU
        p = jnp.exp((s - m_new).astype(jnp.bfloat16))
        l_new = l_scr[:, :1] * alpha + jnp.sum(
            p, axis=1, keepdims=True
        ).astype(jnp.float32)
    else:
        p = jnp.exp(s - m_new)                  # [bq, bk]
        l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)


def _ns_finish(o_ref, m_scr, l_scr, acc_scr, lse_ref=None):
    """Final normalize + store.

    A row with EVERY kv position masked keeps m == NEG_INF, and its
    p = exp(s - m) = exp(0) = 1 at the masked positions — l ends at Skv
    (never 0), acc at sum(V), so an l==0 guard would be dead code. Gate on m
    instead: the correct output for such a row is zeros. (A fully-masked
    BLOCK in an otherwise valid row is already exact: exp(NEG_INF - m_real)
    underflows to 0, and a poisoned prefix is rescaled away by
    alpha = exp(NEG_INF - m_real) = 0.)

    `lse_ref` (broadcast across lanes) receives the row log-sum-exp of the
    SCALED-and-masked scores — the Pallas backward reconstructs
    p = exp(s - lse) from it without a second max pass. Fully-masked rows
    keep lse ~ NEG_INF, which the backward uses as its zero-gradient gate.
    """
    l = l_scr[:, :1]
    seen_valid = m_scr[:, :1] > NEG_INF * 0.5
    l = jnp.where(seen_valid, l, 1.0)
    o_ref[0] = jnp.where(seen_valid, acc_scr[:] / l, 0.0).astype(o_ref.dtype)
    if lse_ref is not None:
        lse_ref[0] = jnp.where(
            m_scr[:] > NEG_INF * 0.5, m_scr[:] + jnp.log(l_scr[:]), NEG_INF
        )


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, m_scr, l_scr,
            acc_scr, *, scale: float, num_kv_blocks: int,
            fast_exp: bool = False):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        _ns_init(m_scr, l_scr, acc_scr)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    mask = mask_ref[0]  # [1, bk] int32 (1 = valid)
    s = jnp.where(mask > 0, s, NEG_INF)
    _ns_update(s, v_ref[0], m_scr, l_scr, acc_scr, fast_exp)

    @pl.when(ik == num_kv_blocks - 1)
    def _finish():
        _ns_finish(o_ref, m_scr, l_scr, acc_scr, lse_ref)


def _kernel_rope(q_ref, k_ref, v_ref, mask_ref, cos_ref, sin_ref, o_ref,
                 lse_ref, m_scr, l_scr, acc_scr, *, scale: float,
                 num_kv_blocks: int, fast_exp: bool = False):
    """Flash attention with partial RoPE applied to K IN-KERNEL, in the
    de-interleaved split channel layout (see ops/posenc.py split_perm): the
    kv stream is rotated as it is loaded, so K never makes an extra HBM
    round trip through an XLA rotary op (reference applies RoPE to keys
    before SDPA every layer, transformer.py:392-418). Identity rows
    (cos=1, sin=0) in the tables express the reference's
    `num_k_exclude_rope` obj-ptr exclusion with zero control flow."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        _ns_init(m_scr, l_scr, acc_scr)

    q = q_ref[0]  # [bq, d] (already rotated by the wrapper)
    k = k_ref[0]  # [bk, d] unrotated, split layout
    kr = apply_rotary_split(k, cos_ref[...], sin_ref[...])  # [bk, d_half] tbls

    s = jax.lax.dot_general(
        q, kr, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    mask = mask_ref[0]  # [1, bk]
    s = jnp.where(mask > 0, s, NEG_INF)
    _ns_update(s, v_ref[0], m_scr, l_scr, acc_scr, fast_exp)

    @pl.when(ik == num_kv_blocks - 1)
    def _finish():
        _ns_finish(o_ref, m_scr, l_scr, acc_scr, lse_ref)


def _kernel_rope_kvproj(q_ref, k_ref, v_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                        mask_ref, cos_ref, sin_ref, o_ref, lse_ref,
                        m_scr, l_scr, acc_scr, *, scale: float,
                        num_kv_blocks: int):
    """Flash attention with the per-layer K/V PROJECTIONS (mem_dim -> d_model,
    reference memory_attention.py cross_attn kv_in_dim=64) fused in-kernel on
    top of the RoPE fusion: the kv stream stays mem_dim wide in HBM (4x less
    kv traffic at d=256/mem_dim=64) and the projected K/V tensors never
    materialize. Biases ride along; K is rotated after projection exactly as
    the unfused path does."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        _ns_init(m_scr, l_scr, acc_scr)

    q = q_ref[0]    # [bq, d] (already projected + rotated by the wrapper)
    k64 = k_ref[0]  # [bk, dm_pad] pos-added memory tokens
    v64 = v_ref[0]
    kp = jax.lax.dot_general(
        k64, wk_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bk_ref[...]
    kp = kp.astype(q.dtype)  # match the unfused path's bf16 projection output
    kr = apply_rotary_split(kp, cos_ref[...], sin_ref[...])

    s = jax.lax.dot_general(
        q, kr, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    mask = mask_ref[0]
    s = jnp.where(mask > 0, s, NEG_INF)

    vp = jax.lax.dot_general(
        v64, wv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bv_ref[...]
    vp = vp.astype(q.dtype)
    _ns_update(s, vp, m_scr, l_scr, acc_scr, fast_exp=False)

    @pl.when(ik == num_kv_blocks - 1)
    def _finish():
        _ns_finish(o_ref, m_scr, l_scr, acc_scr, lse_ref)


def _pad_to(x, size, axis, value=0.0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _forward_impl(scale, bq, bk, interpret, fast, qf, kf, vf, maskf):
    """Padded-layout pallas forward. qf/kf/vf [N, S*, d_pad], maskf [N,1,skv].
    Returns (out, lse[N, sq_pad, 128] f32 — row log-sum-exp, lane-broadcast,
    consumed by the Pallas backward)."""
    N, sq_pad, d_pad = qf.shape
    skv_pad = kf.shape[1]
    nq = sq_pad // bq
    nk = skv_pad // bk
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, num_kv_blocks=nk,
                          fast_exp=fast),
        grid=(N, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, bk, d_pad), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, bk, d_pad), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, iq, ik: (b, 0, ik)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, bq, 128), lambda b, iq, ik: (b, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, sq_pad, d_pad), qf.dtype),
            jax.ShapeDtypeStruct((N, sq_pad, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, maskf)


def _forward_impl_rope(scale, bq, bk, interpret, d_half, fast, qf, kf, vf,
                       maskf, cosf, sinf):
    """Rope-fused padded-layout forward. cosf/sinf: [skv_pad, d_half]."""
    N, sq_pad, d_pad = qf.shape
    skv_pad = kf.shape[1]
    nq = sq_pad // bq
    nk = skv_pad // bk
    return pl.pallas_call(
        functools.partial(_kernel_rope, scale=scale, num_kv_blocks=nk,
                          fast_exp=fast),
        grid=(N, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, bk, d_pad), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, bk, d_pad), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, iq, ik: (b, 0, ik)),
            pl.BlockSpec((bk, d_half), lambda b, iq, ik: (ik, 0)),
            pl.BlockSpec((bk, d_half), lambda b, iq, ik: (ik, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, bq, 128), lambda b, iq, ik: (b, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, sq_pad, d_pad), qf.dtype),
            jax.ShapeDtypeStruct((N, sq_pad, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, maskf, cosf, sinf)


# --------------------------------------------------------------------------- #
# Shared exact softmax-recompute backward, chunked over query rows.
#
# The one-shot backward materializes TWO [n, sq, skv] fp32 logit tensors
# (p and dp) in HBM — 4 GB each for the hiera-b+ @1024² stage-3 global
# attention at T=8 frames (n = 8 frames x 8 heads, 4096 x 4096), which alone
# OOMs a 16 GB v5e during the production MOSE-recipe train step. Chunking the
# query axis bounds the live logit temps to SAM2_TPU_BWD_LOGIT_MB (combined,
# default 512 MB) while keeping every matmul MXU-sized; dk/dv accumulate
# across chunks in a lax.scan carry. Exact (recompute) gradients either way.
# --------------------------------------------------------------------------- #


def _bwd_chunk_rows(n: int, sq: int, skv: int) -> int:
    """Query rows per backward chunk: an even divisor of sq (>= 128 rows,
    sq is 128-padded by the wrappers) chosen so the two [n, rows, skv] fp32
    logit temps fit the SAM2_TPU_BWD_LOGIT_MB budget (default 512)."""
    import os

    try:
        budget = int(os.environ.get("SAM2_TPU_BWD_LOGIT_MB", "512")) << 20
    except ValueError:
        budget = 512 << 20
    rows = budget // max(2 * n * skv * 4, 1)
    if rows >= sq:
        return sq
    rows = max(rows, 128)
    nch = -(-sq // rows)
    # sq is padded to a 128 multiple by the wrappers, so a divisor exists
    while sq % nch and nch < sq:
        nch += 1
    return max(sq // nch, 1)


def _softmax_bwd_core(scale, q, k, v, maskf, do):
    """dq, dk, dv (fp32) of sum(do * softmax(mask(q k^T * scale)) v).

    q/do [n, sq, d] and k/v [n, skv, d] stay in their source dtype so bf16
    training gets bf16 MXU-rate matmuls (fp32 accumulation via
    preferred_element_type, like the forward kernel); the softmax recompute
    and the probability/ds normalizations are fp32, with p/ds rounded to the
    source dtype only as matmul INPUTS — the standard flash-attention
    backward precision contract. maskf [n or 1, 1, skv]."""
    n, sq, _ = q.shape
    skv = k.shape[1]
    f32 = jnp.float32

    def chunk_grads(qc, doc):
        s = jnp.einsum("nqd,nkd->nqk", qc, k, preferred_element_type=f32)
        s = jnp.where(maskf > 0, s * scale, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        # zero fully-masked rows (m == NEG_INF -> p would be uniform over
        # the MASKED tokens); l is never 0 for rows with any valid key
        p = jnp.where(m > NEG_INF * 0.5, p / jnp.where(l == 0.0, 1.0, l), 0.0)
        dv = jnp.einsum("nqk,nqd->nkd", p.astype(v.dtype), doc,
                        preferred_element_type=f32)
        dp = jnp.einsum("nqd,nkd->nqk", doc, v, preferred_element_type=f32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsl = ds.astype(k.dtype)
        dq = jnp.einsum("nqk,nkd->nqd", dsl, k,
                        preferred_element_type=f32) * scale
        dk = jnp.einsum("nqk,nqd->nkd", dsl, qc,
                        preferred_element_type=f32) * scale
        return dq, dk, dv

    cq = _bwd_chunk_rows(n, sq, skv)
    if cq >= sq:
        return chunk_grads(q, do)
    nch = sq // cq
    qs = q.reshape(n, nch, cq, -1).swapaxes(0, 1)
    dos = do.reshape(n, nch, cq, -1).swapaxes(0, 1)

    def body(carry, x):
        dk_acc, dv_acc = carry
        dqc, dkc, dvc = chunk_grads(*x)
        return (dk_acc + dkc, dv_acc + dvc), dqc

    zeros = lambda r: jnp.zeros(r.shape, f32)
    (dk, dv), dqs = jax.lax.scan(body, (zeros(k), zeros(v)), (qs, dos))
    dq = dqs.swapaxes(0, 1).reshape(n, sq, -1)
    return dq, dk, dv


# --------------------------------------------------------------------------- #
# Pallas flash backward (Dao et al. two-kernel scheme). The XLA recompute
# backward above materializes the [n, rows, skv] fp32 probability/ds temps
# in HBM every chunk; at the memory-attention training shape (4096 q x
# ~28.7k kv x 4 layers x 8 frames) that made the backward 8x the forward
# (109 ms vs 13.5 ms for the 4-layer stack, tools/bench_track_grad.py).
# These kernels keep the logits in VMEM: p is reconstructed from the
# forward's saved row log-sum-exp (p = exp(s - lse)), delta = rowsum(do*o)
# is precomputed in XLA, and dk/dv (kv-block grid, q streamed) and dq
# (q-block grid, kv streamed) accumulate in fp32 VMEM scratch. Matmul
# inputs stay in the source dtype with fp32 accumulation — the same
# precision contract as the XLA path. Fallback: SAM2_TPU_XLA_ATTN_BWD=1.
# --------------------------------------------------------------------------- #


def _bwd_dkdv_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                     mask_ref, dk_ref, dv_ref, dk_scr, dv_scr, *,
                     scale: float, num_q_blocks: int):
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]                  # [bq, d]
    do = do_ref[0]                # [bq, d]
    lse = lse_ref[0][:, :1]       # [bq, 1] (lane-broadcast input)
    delta = delta_ref[0][:, :1]   # [bq, 1]
    k = k_ref[0]                  # [bk, d]
    v = v_ref[0]
    mask = mask_ref[0]            # [1, bk]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    live = (mask > 0) & (lse > NEG_INF * 0.5)   # [bq, bk] via broadcast
    p = jnp.where(live, jnp.exp(s - lse), 0.0)
    pd = p.astype(do.dtype)
    dv_scr[:] += jax.lax.dot_general(
        pd, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta)).astype(q.dtype)
    dk_scr[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    @pl.when(iq == num_q_blocks - 1)
    def _finish():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                   mask_ref, dq_ref, dq_scr, *, scale: float,
                   num_kv_blocks: int):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]
    k = k_ref[0]
    v = v_ref[0]
    mask = mask_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    live = (mask > 0) & (lse > NEG_INF * 0.5)
    p = jnp.where(live, jnp.exp(s - lse), 0.0)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta)).astype(q.dtype)
    dq_scr[:] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    @pl.when(ik == num_kv_blocks - 1)
    def _finish():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _divisor_block(size: int, target: int) -> int:
    """Largest multiple of 128 that divides `size` and is <= target.
    (All padded seq lengths are 128-multiples.)"""
    best = 128
    b = 128
    while b <= min(size, target):
        if size % b == 0:
            best = b
        b += 128
    return best


def _use_xla_attn_bwd() -> bool:
    import os

    return os.environ.get("SAM2_TPU_XLA_ATTN_BWD", "0") == "1"


def _flash_bwd(scale, interpret, q, k, v, maskf, do, out, lse):
    """Pallas flash backward: (dq, dk, dv) fp32 for the padded-layout core.

    q/do [n, sq, d], k/v [n, skv, d] in the source dtype; maskf [n or 1, 1,
    skv] f32; out = forward output (same dtype as q); lse [n, sq, 128] f32
    lane-broadcast. Falls back to the chunked XLA recompute backward when
    SAM2_TPU_XLA_ATTN_BWD=1.
    """
    if _use_xla_attn_bwd():
        return _softmax_bwd_core(scale, q, k, v, maskf, do.astype(q.dtype))
    n, sq, d_pad = q.shape
    skv = k.shape[1]
    do = do.astype(q.dtype)
    if maskf.shape[0] != n:
        maskf = jnp.broadcast_to(maskf, (n,) + maskf.shape[1:])
    # delta_i = rowsum(do * o) (one cheap fused elementwise pass in XLA)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None], (n, sq, 128)) + 0.0

    import os

    bq = _divisor_block(sq, int(os.environ.get("SAM2_TPU_BWD_BLOCK_Q", "512")))
    bk = _divisor_block(skv, int(os.environ.get("SAM2_TPU_BWD_BLOCK_K", "512")))
    nq = sq // bq
    nk = skv // bk

    row_specs = [
        pl.BlockSpec((1, bq, d_pad), lambda b, ik, iq: (b, iq, 0)),   # q
        pl.BlockSpec((1, bq, d_pad), lambda b, ik, iq: (b, iq, 0)),   # do
        pl.BlockSpec((1, bq, 128), lambda b, ik, iq: (b, iq, 0)),     # lse
        pl.BlockSpec((1, bq, 128), lambda b, ik, iq: (b, iq, 0)),     # delta
        pl.BlockSpec((1, bk, d_pad), lambda b, ik, iq: (b, ik, 0)),   # k
        pl.BlockSpec((1, bk, d_pad), lambda b, ik, iq: (b, ik, 0)),   # v
        pl.BlockSpec((1, 1, bk), lambda b, ik, iq: (b, 0, ik)),       # mask
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel, scale=scale, num_q_blocks=nq),
        grid=(n, nk, nq),
        in_specs=row_specs,
        out_specs=[
            pl.BlockSpec((1, bk, d_pad), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, bk, d_pad), lambda b, ik, iq: (b, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, skv, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, skv, d_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d_pad), jnp.float32),
            pltpu.VMEM((bk, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(q, do, lse, delta, k, v, maskf)

    col_specs = [
        pl.BlockSpec((1, bq, d_pad), lambda b, iq, ik: (b, iq, 0)),   # q
        pl.BlockSpec((1, bq, d_pad), lambda b, iq, ik: (b, iq, 0)),   # do
        pl.BlockSpec((1, bq, 128), lambda b, iq, ik: (b, iq, 0)),     # lse
        pl.BlockSpec((1, bq, 128), lambda b, iq, ik: (b, iq, 0)),     # delta
        pl.BlockSpec((1, bk, d_pad), lambda b, iq, ik: (b, ik, 0)),   # k
        pl.BlockSpec((1, bk, d_pad), lambda b, iq, ik: (b, ik, 0)),   # v
        pl.BlockSpec((1, 1, bk), lambda b, iq, ik: (b, 0, ik)),       # mask
    ]
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, num_kv_blocks=nk),
        grid=(n, nq, nk),
        in_specs=col_specs,
        out_specs=pl.BlockSpec((1, bq, d_pad), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((n, sq, d_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bq, d_pad), jnp.float32)],
        interpret=interpret,
    )(q, do, lse, delta, k, v, maskf)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _attn_core_rope(scale, bq, bk, interpret, d_half, fast, qf, kf, vf, maskf,
                    cosf, sinf):
    """Differentiable seam for the rope-fused kernel (Pallas flash backward;
    rotation is linear, so dK is the transpose rotation of dK_rot)."""
    return _forward_impl_rope(scale, bq, bk, interpret, d_half, fast, qf, kf,
                              vf, maskf, cosf, sinf)[0]


def _attn_rope_fwd(scale, bq, bk, interpret, d_half, fast, qf, kf, vf, maskf,
                   cosf, sinf):
    out, lse = _forward_impl_rope(scale, bq, bk, interpret, d_half, fast, qf,
                                  kf, vf, maskf, cosf, sinf)
    return out, (qf, kf, vf, maskf, cosf, sinf, out, lse)


def _attn_rope_bwd(scale, bq, bk, interpret, d_half, fast, res, do):
    qf, kf, vf, maskf, cosf, sinf, out, lse = res
    c32 = cosf.astype(jnp.float32)[None]  # [1, skv, d_half]
    s32 = sinf.astype(jnp.float32)[None]
    # rotate K in its source dtype, exactly like the forward kernel does
    kr = apply_rotary_split(kf, cosf[None].astype(kf.dtype),
                            sinf[None].astype(kf.dtype))
    dq, dkr, dv = _flash_bwd(scale, interpret, qf, kr, vf, maskf, do, out,
                             lse)
    # transpose of the forward rotation = rotation by -theta (fp32 cotangent)
    dk = apply_rotary_split(dkr, c32, -s32)
    return (
        dq.astype(qf.dtype),
        dk.astype(kf.dtype),
        dv.astype(vf.dtype),
        jnp.zeros_like(maskf),
        jnp.zeros_like(cosf),
        jnp.zeros_like(sinf),
    )


_attn_core_rope.defvjp(_attn_rope_fwd, _attn_rope_bwd)


def _forward_impl_rope_kvproj(scale, bq, bk, interpret, d_half,
                              qf, kf, vf, wk, bkb, wv, bvb, maskf, cosf, sinf):
    """kv-projection-fused padded-layout forward. kf/vf [N, skv_pad, dm_pad];
    wk/wv [dm_pad, d_pad]; bkb/bvb [1, d_pad]; cosf/sinf [skv_pad, d_half]."""
    N, sq_pad, d_pad = qf.shape
    skv_pad = kf.shape[1]
    dm_pad = kf.shape[2]
    nq = sq_pad // bq
    nk = skv_pad // bk
    return pl.pallas_call(
        functools.partial(_kernel_rope_kvproj, scale=scale, num_kv_blocks=nk),
        grid=(N, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, bk, dm_pad), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, bk, dm_pad), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((dm_pad, d_pad), lambda b, iq, ik: (0, 0)),
            pl.BlockSpec((1, d_pad), lambda b, iq, ik: (0, 0)),
            pl.BlockSpec((dm_pad, d_pad), lambda b, iq, ik: (0, 0)),
            pl.BlockSpec((1, d_pad), lambda b, iq, ik: (0, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, iq, ik: (b, 0, ik)),
            pl.BlockSpec((bk, d_half), lambda b, iq, ik: (ik, 0)),
            pl.BlockSpec((bk, d_half), lambda b, iq, ik: (ik, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, bq, 128), lambda b, iq, ik: (b, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, sq_pad, d_pad), qf.dtype),
            jax.ShapeDtypeStruct((N, sq_pad, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, wk, bkb, wv, bvb, maskf, cosf, sinf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _attn_core_rope_kvproj(scale, bq, bk, interpret, d_half, qf, kf, vf,
                           wk, bkb, wv, bvb, maskf, cosf, sinf):
    """Differentiable seam for the kv-projection-fused kernel: Pallas flash
    backward with the projection/rotation chain rules."""
    return _forward_impl_rope_kvproj(scale, bq, bk, interpret, d_half,
                                     qf, kf, vf, wk, bkb, wv, bvb,
                                     maskf, cosf, sinf)[0]


def _attn_rope_kvproj_fwd(scale, bq, bk, interpret, d_half, qf, kf, vf,
                          wk, bkb, wv, bvb, maskf, cosf, sinf):
    out, lse = _forward_impl_rope_kvproj(scale, bq, bk, interpret, d_half,
                                         qf, kf, vf, wk, bkb, wv, bvb,
                                         maskf, cosf, sinf)
    return out, (qf, kf, vf, wk, bkb, wv, bvb, maskf, cosf, sinf, out, lse)


def _attn_rope_kvproj_bwd(scale, bq, bk, interpret, d_half, res, do):
    qf, kf, vf, wk, bkb, wv, bvb, maskf, cosf, sinf, out, lse = res
    in_dt = qf.dtype
    f32 = jnp.float32
    c32 = cosf.astype(f32)[None]
    s32 = sinf.astype(f32)[None]
    # recompute the projected K/V in the kernel's precision (source-dtype
    # matmul inputs, fp32 accumulation, projection output rounded to the
    # source dtype) — the standard flash-attention backward tradeoff
    kp = (jnp.einsum("nsm,md->nsd", kf, wk, preferred_element_type=f32)
          + bkb.astype(f32)[None]).astype(in_dt)
    krot = apply_rotary_split(kp, cosf[None].astype(in_dt),
                              sinf[None].astype(in_dt))
    vp = (jnp.einsum("nsm,md->nsd", vf, wv, preferred_element_type=f32)
          + bvb.astype(f32)[None]).astype(in_dt)
    dq, dkrot, dvp = _flash_bwd(scale, interpret, qf, krot, vp, maskf, do,
                                out, lse)
    # inverse rotation (= rotation by -theta), then the projection chain rule
    dkp = apply_rotary_split(dkrot, c32, -s32)
    dkp_l = dkp.astype(in_dt)
    dvp_l = dvp.astype(in_dt)
    dwk = jnp.einsum("nsm,nsd->md", kf, dkp_l, preferred_element_type=f32)
    dbk = jnp.sum(dkp, axis=(0, 1), keepdims=False)[None]
    dkf = jnp.einsum("nsd,md->nsm", dkp_l, wk, preferred_element_type=f32)
    dwv = jnp.einsum("nsm,nsd->md", vf, dvp_l, preferred_element_type=f32)
    dbv = jnp.sum(dvp, axis=(0, 1), keepdims=False)[None]
    dvf = jnp.einsum("nsd,md->nsm", dvp_l, wv, preferred_element_type=f32)
    return (
        dq.astype(in_dt),
        dkf.astype(kf.dtype),
        dvf.astype(vf.dtype),
        dwk.astype(wk.dtype),
        dbk.astype(bkb.dtype),
        dwv.astype(wv.dtype),
        dbv.astype(bvb.dtype),
        jnp.zeros_like(maskf),
        jnp.zeros_like(cosf),
        jnp.zeros_like(sinf),
    )


_attn_core_rope_kvproj.defvjp(_attn_rope_kvproj_fwd, _attn_rope_kvproj_bwd)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention_kv_proj(
    q, mem_k, mem_v, wk, bk_bias, wv, bv_bias, kv_mask=None,
    rope_cos_k=None, rope_sin_k=None, *,
    block_q: Optional[int] = None, block_k: Optional[int] = None,
    interpret: bool = False,
):
    """Memory-attention cross layer with the per-layer K/V projections fused
    into the flash kernel. q [B, 1, Sq, D] is already projected (and
    RoPE-rotated, in the split layout); mem_k/mem_v [B, Skv, Dm] are the
    mem_dim-wide memory tokens (mem_k with positions pre-added); wk/wv
    [Dm, D], biases [D]. rope tables are REQUIRED (this kernel exists for the
    memory-attention shape, reference memory_attention.py:263-349).

    Returns [B, 1, Sq, D].
    """
    B, H, Sq, D = q.shape
    assert H == 1, "kv-proj fusion implemented for single-head cross-attn"
    Skv, Dm = mem_k.shape[1], mem_k.shape[2]
    scale = 1.0 / math.sqrt(D)
    d_half = D // 2
    assert rope_cos_k is not None and rope_cos_k.shape == (Skv, d_half)

    d_pad = max(128, ((D + 127) // 128) * 128)
    dm_pad = max(128, ((Dm + 127) // 128) * 128)
    # (2048, 1024) overflows the 16M scoped VMEM here (the in-flight fp32
    # logit block is bq*bk*4 bytes and the fused projections add ~2M);
    # (1024, 1024) is the v5e sweet spot for this kernel
    if block_q is None:
        block_q = 1024 if q.dtype.itemsize <= 2 else 512
    if block_k is None:
        block_k = 1024
    bq = min(block_q, max(128, ((Sq + 127) // 128) * 128))
    bk = min(block_k, max(128, ((Skv + 127) // 128) * 128))
    sq_pad = ((Sq + bq - 1) // bq) * bq
    skv_pad = ((Skv + bk - 1) // bk) * bk

    if kv_mask is None:
        kv_mask = jnp.ones((B, Skv), jnp.bool_)
    maskf = _pad_to(kv_mask.astype(jnp.float32), skv_pad, 1)[:, None, :]

    qf = _pad_to(_pad_to(q[:, 0], sq_pad, 1), d_pad, 2)
    kf = _pad_to(_pad_to(mem_k, skv_pad, 1), dm_pad, 2)
    vf = _pad_to(_pad_to(mem_v, skv_pad, 1), dm_pad, 2)
    wkp = _pad_to(_pad_to(wk, dm_pad, 0), d_pad, 1).astype(q.dtype)
    wvp = _pad_to(_pad_to(wv, dm_pad, 0), d_pad, 1).astype(q.dtype)
    bkp = _pad_to(bk_bias[None], d_pad, 1).astype(jnp.float32)
    bvp = _pad_to(bv_bias[None], d_pad, 1).astype(jnp.float32)
    cosf = _pad_to(rope_cos_k.astype(q.dtype), skv_pad, 0, value=1.0)
    sinf = _pad_to(rope_sin_k.astype(q.dtype), skv_pad, 0, value=0.0)

    out = _attn_core_rope_kvproj(
        scale, bq, bk, interpret, d_half, qf, kf, vf, wkp, bkp, wvp, bvp,
        maskf, cosf, sinf,
    )
    return out[:, None, :Sq, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _attn_core(scale, bq, bk, interpret, fast, qf, kf, vf, maskf):
    """Differentiable seam: Pallas kernel forward, Pallas flash backward
    (pallas_call has no autodiff rule — without this, any training
    path that routes through the flash kernel fails to differentiate)."""
    return _forward_impl(scale, bq, bk, interpret, fast, qf, kf, vf, maskf)[0]


def _attn_fwd(scale, bq, bk, interpret, fast, qf, kf, vf, maskf):
    out, lse = _forward_impl(scale, bq, bk, interpret, fast, qf, kf, vf,
                             maskf)
    return out, (qf, kf, vf, maskf, out, lse)


def _attn_bwd(scale, bq, bk, interpret, fast, res, do):
    qf, kf, vf, maskf, out, lse = res
    dq, dk, dv = _flash_bwd(scale, interpret, qf, kf, vf, maskf, do, out, lse)
    return (
        dq.astype(qf.dtype),
        dk.astype(kf.dtype),
        dv.astype(vf.dtype),
        jnp.zeros_like(maskf),
    )


_attn_core.defvjp(_attn_fwd, _attn_bwd)


def _use_fast_exp(dtype) -> bool:
    """bf16 in-kernel softmax probabilities (SAM2_TPU_KERNEL_FAST_EXP,
    default OFF; bf16 inputs only, env-resolved at trace time).

    Measured on v5e: SLOWER than the fp32 softmax (memory-attention stack
    4.57 ms vs 4.0 ms) — the [bq, bk] bf16 cast costs more VPU time than the
    narrower exp saves, unlike the XLA fast-softmax path where bf16 logits
    also halve HBM traffic. Kept as an opt-in for other generations."""
    import os

    return (
        dtype == jnp.bfloat16
        and os.environ.get("SAM2_TPU_KERNEL_FAST_EXP", "0") == "1"
    )


def _is_batch_traced(x) -> bool:
    """True when x is being traced by jax.vmap: the visible shape then hides
    a physical batch dimension, so shape-based block heuristics must assume
    the batched (VMEM-heavier) case."""
    try:
        from jax._src.interpreters.batching import BatchTracer
    except Exception:  # pragma: no cover - private-API guard
        try:
            from jax.interpreters.batching import BatchTracer
        except Exception:
            # Fail CLOSED: if a jax upgrade moves BatchTracer, assume the
            # call might be batched so the narrow (VMEM-safe) blocks apply.
            # The cost of a wrong True is ~0.2 ms; a wrong False is a
            # scoped-VMEM compile failure in training.
            return True
    return isinstance(x, BatchTracer)


def _wide_q_opt_in() -> bool:
    import os

    return os.environ.get("SAM2_TPU_WIDE_Q_BLOCK", "0") == "1"


def _default_blocks(q, k, rope: bool, block_q, block_k):
    """Pick (block_q, block_k) defaults. MUST run OUTSIDE any jax.jit
    wrapper: under jax.vmap the jitted body is re-traced with element-shaped
    avals, so only a non-jitted caller can see the BatchTracer that marks a
    physically batched call.

    Defaults autotuned on v5e (tools/tune_flash_blocks.py):
    - (1024, 1024): streams kv from HBM 4x instead of 16x for the
      memory-attention shapes -> 5.5 ms vs 7.7 ms for the 4-layer stack
      pre-fusion, and fits scoped VMEM for every shape/graph combination
      measured.
    - `SAM2_TPU_WIDE_Q_BLOCK=1` (opt-in): double-width (2048, 1024) q blocks
      on the single-sequence long-kv rope CROSS shape — 3.86 ms vs 4.07 ms
      for the 4-layer stack in isolation. NOT the default because whether it
      fits depends on XLA's operand placement AROUND the kernel: when the
      surrounding graph stages an operand in scoped VMEM the call overflows
      the 16M limit (observed 19.13M in the full video step, 17.96M at B=8),
      and that placement shifts with unrelated graph edits. A ~0.2 ms win is
      not worth a graph-dependent compile failure.
    Larger blocks always overflow at d_pad=256, as do these sizes for
    4-byte (fp32) inputs — those get half-size q blocks.
    """
    if block_q is None:
        if (rope and k.shape[-2] >= 8192
                and q.shape[0] * q.shape[1] == 1
                and not _is_batch_traced(q)
                and _wide_q_opt_in()):
            # A vmapped call (the trainer's video-batch rollout) is batched
            # physically even though its traced shape reads B=H=1, hence the
            # BatchTracer guard.
            block_q = 2048 if q.dtype.itemsize <= 2 else 512
        else:
            block_q = 1024 if q.dtype.itemsize <= 2 else 512
    if block_k is None:
        block_k = 1024
    return block_q, block_k


def flash_attention(
    q, k, v, kv_mask=None, rope_cos_k=None, rope_sin_k=None, *,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None, interpret: bool = False,
    fast_exp: Optional[bool] = None,
):
    """q [B,H,Sq,D], k/v [B,H,Skv,D], kv_mask optional [B,Skv] bool.

    `rope_cos_k`/`rope_sin_k` (optional, [Skv, D//2]): per-pair rotation
    tables in the SPLIT channel layout (ops/posenc.py). When given, K is
    rotated inside the kernel as each kv block streams from HBM — q must
    already be rotated (and projected with split_perm-permuted weights).
    Rows where (cos, sin) = (1, 0) pass through unrotated, expressing the
    reference's partial-RoPE obj-ptr exclusion (transformer.py:392-418).

    Returns [B,H,Sq,D] with torch-SDPA semantics (scale 1/sqrt(D)).
    """
    block_q, block_k = _default_blocks(
        q, k, rope_cos_k is not None, block_q, block_k
    )
    return _flash_attention_jit(
        q, k, v, kv_mask, rope_cos_k, rope_sin_k, block_q=block_q,
        block_k=block_k, interpret=interpret, fast_exp=fast_exp,
    )


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret", "fast_exp")
)
def _flash_attention_jit(
    q, k, v, kv_mask=None, rope_cos_k=None, rope_sin_k=None, *,
    block_q: int, block_k: int, interpret: bool = False,
    fast_exp: Optional[bool] = None,
):
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    scale = 1.0 / math.sqrt(D)

    d_pad = max(128, ((D + 127) // 128) * 128)
    bq = min(block_q, max(128, ((Sq + 127) // 128) * 128))
    bk = min(block_k, max(128, ((Skv + 127) // 128) * 128))
    sq_pad = ((Sq + bq - 1) // bq) * bq
    skv_pad = ((Skv + bk - 1) // bk) * bk

    if kv_mask is None:
        kv_mask = jnp.ones((B, Skv), jnp.bool_)
    # float mask (not int) so the custom-vjp seam has an ordinary zero
    # cotangent for it
    maskf = kv_mask.astype(jnp.float32)
    maskf = _pad_to(maskf, skv_pad, 1)[:, None, :]  # [B, 1, skv_pad]
    maskf = jnp.broadcast_to(maskf, (B, H, skv_pad)).reshape(B * H, 1, skv_pad)

    qf = _pad_to(_pad_to(q, sq_pad, 2), d_pad, 3).reshape(B * H, sq_pad, d_pad)
    kf = _pad_to(_pad_to(k, skv_pad, 2), d_pad, 3).reshape(B * H, skv_pad, d_pad)
    vf = _pad_to(_pad_to(v, skv_pad, 2), d_pad, 3).reshape(B * H, skv_pad, d_pad)

    fast = _use_fast_exp(q.dtype) if fast_exp is None else fast_exp
    if rope_cos_k is not None:
        d_half = D // 2
        assert rope_cos_k.shape == (Skv, d_half), (
            f"rope tables {rope_cos_k.shape} != ({Skv}, {d_half})"
        )
        # pad rows with the identity rotation so padding slots stay inert
        cosf = _pad_to(rope_cos_k.astype(q.dtype), skv_pad, 0, value=1.0)
        sinf = _pad_to(rope_sin_k.astype(q.dtype), skv_pad, 0, value=0.0)
        out = _attn_core_rope(scale, bq, bk, interpret, d_half, fast, qf, kf,
                              vf, maskf, cosf, sinf)
    else:
        out = _attn_core(scale, bq, bk, interpret, fast, qf, kf, vf, maskf)
    out = out.reshape(B, H, sq_pad, d_pad)[:, :, :Sq, :D]
    return out
