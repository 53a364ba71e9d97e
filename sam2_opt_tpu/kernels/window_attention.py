"""Pallas TPU fused window attention.

Hiera's windowed attention (reference hieradet.py:39-81) runs thousands of
small independent attentions (window sizes 8/16 -> 64/256 tokens). XLA
materializes their fp32 logits in HBM (~0.3 GB per stage-3 block); this kernel
batches many windows per grid cell and keeps logits entirely in VMEM.

Layout: q/k/v [N, S, D] where N = batch * num_windows * heads. Full kv per
window fits in VMEM, so plain (not online) softmax suffices.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def window_attention(q, k, v, *, block_n: int = 16, interpret: bool = False):
    """q/k/v [N, S, D] -> [N, S, D]; torch-SDPA scaling (1/sqrt(D))."""
    N, S, D = q.shape
    scale = 1.0 / math.sqrt(D)
    d_pad = max(128, ((D + 127) // 128) * 128)
    bn = min(block_n, N)
    while N % bn:
        bn -= 1

    def pad_d(x):
        if d_pad == D:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, d_pad - D)))

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((bn, S, d_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((bn, S, d_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((bn, S, d_pad), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, S, d_pad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, S, d_pad), q.dtype),
        interpret=interpret,
    )(pad_d(q), pad_d(k), pad_d(v))
    return out[:, :, :D]


def _kernel_3d(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[...] = o.astype(o_ref.dtype)


def window_flash_3d(q, k, v, *, block_n: int = 32, interpret: bool = False):
    """Fused per-window attention on the natural split-qkv layout
    [N windows, S tokens, heads, head_dim]; the S x S logits never touch HBM.

    The (window, head) pairs are flattened to the kernel batch via XLA
    transposes (whose o(q+k+v+o) traffic is far below the logits'
    o(heads*S²)); head_dim stays un-padded — the block's last dim equals the
    array's, which Mosaic accepts, and the in-VMEM tile padding costs no HBM.
    Measured on v5e (tools/bench_window_flash.py, hiera-L stage-3 shape
    [16, 256, 8, 72]): 27 us vs 40 us for the einsum path, logits bf16.

    Differentiable: the backward is the exact softmax-recompute in plain XLA
    (shared with packed_window_attention) so routing windows through this
    kernel under jax.grad — e.g. SAM2_TPU_FLASH_WINDOW_MIN set while
    training — works rather than failing on an undifferentiable pallas_call."""
    return _window_flash_3d_vjp(q, k, v, block_n, interpret)


def _window_flash_3d_impl(q, k, v, block_n: int, interpret: bool):
    N, S, H, D = q.shape
    NB = N * H
    bn = min(block_n, NB)
    while NB % bn:
        bn -= 1
    scale = 1.0 / math.sqrt(D)
    to3 = lambda x: x.transpose(0, 2, 1, 3).reshape(NB, S, D)
    spec = pl.BlockSpec((bn, S, D), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel_3d, scale=scale),
        grid=(NB // bn,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NB, S, D), q.dtype),
        interpret=interpret,
    )(to3(q), to3(k), to3(v))
    return out.reshape(N, H, S, D).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _window_flash_3d_vjp(q, k, v, block_n, interpret):
    return _window_flash_3d_impl(q, k, v, block_n, interpret)


def _window_flash_3d_fwd(q, k, v, block_n, interpret):
    return _window_flash_3d_impl(q, k, v, block_n, interpret), (q, k, v)


def _window_flash_3d_bwd(block_n, interpret, res, do):
    return _packed_vjp_bwd(res, do)


_window_flash_3d_vjp.defvjp(_window_flash_3d_fwd, _window_flash_3d_bwd)


# --------------------------------------------------------------------------- #
# Packed block-diagonal window attention
# --------------------------------------------------------------------------- #
#
# Hiera's early stages run thousands of tiny windows (16 / 64 tokens, head
# dim 72). Dispatching them as batched SDPA leaves the 128x128 MXU almost
# idle: each logit matmul is at most 64x72x64. This kernel instead PACKS g
# windows into one (g*S) x (g*S) matmul with a block-diagonal mask — the
# off-diagonal logits are wasted FLOPs (trivial at these sizes) but every
# matmul is now MXU-shaped, the softmax stays in VMEM, and q/k/v are consumed
# in their natural [windows, tokens, heads, head_dim] layout (no SDPA
# transposes). Scaling matches torch SDPA (1/sqrt(true head dim)).


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, sq: int,
                   skv: int, heads: int):
    g = q_ref.shape[0]
    dpad = q_ref.shape[-1]
    nq, nk = g * sq, g * skv
    row_w = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0) // sq
    col_w = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1) // skv
    same = row_w == col_w
    for h in range(heads):
        q = q_ref[:, :, h, :].reshape(nq, dpad)
        k = k_ref[:, :, h, :].reshape(nk, dpad)
        v = v_ref[:, :, h, :].reshape(nk, dpad)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = jnp.where(same, s * scale, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(v.dtype)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[:, :, h, :] = o.reshape(g, sq, dpad).astype(o_ref.dtype)


def _packed_fwd_impl(q, k, v):
    """q [N, Sq, h, d], k/v [N, Skv, h, d] -> [N, Sq, h, d]."""
    N, Sq, H, D = q.shape
    Skv = k.shape[1]
    scale = 1.0 / math.sqrt(D)
    dpad = ((D + 127) // 128) * 128
    # pack enough windows for ~512 matmul rows (256 for wide/4-byte blocks,
    # keeping the block + its fp32 logits comfortably inside scoped VMEM)
    target = 256 if (H >= 16 or q.dtype.itemsize > 2) else 512
    g = max(1, target // max(Sq, Skv))
    while N % g:
        g -= 1

    def pad_d(x):
        if dpad == D:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, dpad - D)))

    out = pl.pallas_call(
        functools.partial(
            _packed_kernel, scale=scale, sq=Sq, skv=Skv, heads=H
        ),
        interpret=jax.default_backend() not in ("tpu", "axon"),
        grid=(N // g,),
        in_specs=[
            pl.BlockSpec((g, Sq, H, dpad), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((g, Skv, H, dpad), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((g, Skv, H, dpad), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, Sq, H, dpad), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, Sq, H, dpad), q.dtype),
    )(pad_d(q), pad_d(k), pad_d(v))
    return out[..., :D]


@jax.custom_vjp
def packed_window_attention(q, k, v):
    """Fused per-window attention, [N, Sq, h, d] x [N, Skv, h, d] layouts."""
    return _packed_fwd_impl(q, k, v)


def _packed_vjp_fwd(q, k, v):
    return _packed_fwd_impl(q, k, v), (q, k, v)


def _packed_vjp_bwd(res, do):
    # Exact softmax-recompute backward in plain XLA: per-window attention is
    # independent, so batched (window, head) einsums need no mask.
    q, k, v = res
    D = q.shape[-1]
    scale = 1.0 / math.sqrt(D)
    qf, kf, vf, dof = (x.astype(jnp.float32) for x in (q, k, v, do))
    s = jnp.einsum("nqhd,nkhd->nhqk", qf, kf) * scale
    p = jax.nn.softmax(s, axis=-1)
    dp = jnp.einsum("nqhd,nkhd->nhqk", dof, vf)
    dv = jnp.einsum("nhqk,nqhd->nkhd", p, dof)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("nhqk,nkhd->nqhd", ds, kf) * scale
    dk = jnp.einsum("nhqk,nqhd->nkhd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


packed_window_attention.defvjp(_packed_vjp_fwd, _packed_vjp_bwd)
