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

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, m_scr, l_scr, acc_scr, *,
            scale: float, num_kv_blocks: int):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    mask = mask_ref[0]  # [1, bk] int32 (1 = valid)
    s = jnp.where(mask > 0, s, NEG_INF)

    m_prev = m_scr[:, :1]                       # [bq, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)   # [bq, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)             # [bq, 1]
    p = jnp.exp(s - m_new)                      # [bq, bk]

    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == num_kv_blocks - 1)
    def _finish():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


def _pad_to(x, size, axis, value=0.0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _forward_impl(scale, bq, bk, interpret, qf, kf, vf, maskf):
    """Padded-layout pallas forward. qf/kf/vf [N, S*, d_pad], maskf [N,1,skv]."""
    N, sq_pad, d_pad = qf.shape
    skv_pad = kf.shape[1]
    nq = sq_pad // bq
    nk = skv_pad // bk
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, num_kv_blocks=nk),
        grid=(N, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, bk, d_pad), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, bk, d_pad), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, iq, ik: (b, 0, ik)),
        ],
        out_specs=pl.BlockSpec((1, bq, d_pad), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((N, sq_pad, d_pad), qf.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, maskf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _attn_core(scale, bq, bk, interpret, qf, kf, vf, maskf):
    """Differentiable seam: Pallas kernel forward, exact softmax-recompute
    backward (pallas_call has no autodiff rule — without this, any training
    path that routes through the flash kernel fails to differentiate)."""
    return _forward_impl(scale, bq, bk, interpret, qf, kf, vf, maskf)


def _attn_fwd(scale, bq, bk, interpret, qf, kf, vf, maskf):
    out = _forward_impl(scale, bq, bk, interpret, qf, kf, vf, maskf)
    return out, (qf, kf, vf, maskf)


def _attn_bwd(scale, bq, bk, interpret, res, do):
    qf, kf, vf, maskf = res
    q32 = qf.astype(jnp.float32)
    k32 = kf.astype(jnp.float32)
    v32 = vf.astype(jnp.float32)
    do32 = do.astype(jnp.float32)
    s = jnp.einsum("nqd,nkd->nqk", q32, k32) * scale
    s = jnp.where(maskf > 0, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.where(l == 0.0, 1.0, l)
    dv = jnp.einsum("nqk,nqd->nkd", p, do32)
    dp = jnp.einsum("nqd,nkd->nqk", do32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("nqk,nkd->nqd", ds, k32) * scale
    dk = jnp.einsum("nqk,nqd->nkd", ds, q32) * scale
    return (
        dq.astype(qf.dtype),
        dk.astype(kf.dtype),
        dv.astype(vf.dtype),
        jnp.zeros_like(maskf),
    )


_attn_core.defvjp(_attn_fwd, _attn_bwd)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention(
    q, k, v, kv_mask=None, *, block_q: Optional[int] = None,
    block_k: Optional[int] = None, interpret: bool = False,
):
    # Default blocks autotuned on v5e for the memory-attention cross shape
    # (4096 q x 28.8k kv, d 256): (1024, 1024) streams kv from HBM 4x
    # instead of 16x -> 5.5 ms vs 7.7 ms for the 4-layer stack. Larger
    # blocks (2048+) overflow the 16M scoped VMEM at d_pad=256, and so do
    # the (1024, 1024) blocks for 4-byte (fp32) inputs — those get half-size
    # q blocks.
    if block_q is None:
        block_q = 1024 if q.dtype.itemsize <= 2 else 512
    if block_k is None:
        block_k = 1024
    """q [B,H,Sq,D], k/v [B,H,Skv,D], kv_mask optional [B,Skv] bool.

    Returns [B,H,Sq,D] with torch-SDPA semantics (scale 1/sqrt(D)).
    """
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

    out = _attn_core(scale, bq, bk, interpret, qf, kf, vf, maskf)
    out = out.reshape(B, H, sq_pad, d_pad)[:, :, :Sq, :D]
    return out
