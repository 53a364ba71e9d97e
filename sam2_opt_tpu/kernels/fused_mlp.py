"""Pallas TPU fused transformer MLP: y = gelu(x @ w1 + b1) @ w2 + b2.

XLA cannot fuse two matmuls — the 4x-wide hidden activation always round
trips HBM between them. For the Hiera trunk that traffic dominates the early
(bandwidth-bound) stages: at stage 1 the hidden tensor is 65536x576 bf16 =
75 MB written + read per block (~92 us of pure HBM time per direction at
819 GB/s), and the MLP measures at its *unfused* roofline under XLA. This
kernel tiles tokens, keeps the hidden block in VMEM, and streams only x and
y through HBM; weights stay VMEM-resident across token tiles.

The hidden dimension is optionally split into grid-blocks (w1/w2 column/row
panels) so large layers (hiera stage 4: 1152->4608) fit the ~16 MB VMEM
budget; partial products accumulate into an fp32 scratch.

Numerics: both matmuls accumulate fp32 on the MXU; GELU (tanh form — the
bf16 compute path's activation, ops/common.py:gelu) is applied in fp32
before the cast back to bf16 for the second matmul, so the fused path is at
least as accurate as the unfused bf16 graph it replaces. The backward pass
is the standard XLA recompute form via custom_vjp (pallas_call has no
autodiff rule), matching kernels/flash_attention.py's approach.

Wired into models/hiera.py trunk block MLPs only (reference hieradet.py
MultiScaleBlock mlp). Route gate: SAM2_TPU_FUSED_MLP=1 — **default OFF**:
measured 15-55% SLOWER than XLA's unfused bf16 MLP on v5e across the hiera
block shapes (doc/benchmark.md "fused MLP"), kept as an opt-in for other TPU
generations. The gate is read at jit-trace time, so flipping the env var
after a shape has compiled has no effect until the jit cache is cleared.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc_scr, *,
            num_hid_blocks: int, fast_act: bool = False):
    ih = pl.program_id(1)

    @pl.when(ih == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    h = jax.lax.dot_general(
        x_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = h + b1_ref[:].astype(jnp.float32)
    if fast_act:
        # bf16 tanh halves the VPU time that serializes between the two
        # MXU matmuls (matches the unfused bf16 graph's activation dtype)
        g = jax.nn.gelu(h.astype(x_ref.dtype), approximate=True)
    else:
        g = jax.nn.gelu(h, approximate=True).astype(x_ref.dtype)
    acc_scr[:] += jax.lax.dot_general(
        g, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ih == num_hid_blocks - 1)
    def _finish():
        o_ref[:] = (acc_scr[:] + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_tokens", "block_hidden", "interpret", "fast_act"),
)
def _fused_mlp_2d(x, w1, b1, w2, b2, block_tokens, block_hidden, interpret,
                  fast_act=False):
    n, c = x.shape
    hid = w1.shape[1]
    c_out = w2.shape[1]
    bt = min(block_tokens, n)
    bh = min(block_hidden, hid)
    pad_n = (-n) % bt
    if pad_n:
        x = jnp.pad(x, ((0, pad_n), (0, 0)))
    pad_h = (-hid) % bh
    if pad_h:
        w1 = jnp.pad(w1, ((0, 0), (0, pad_h)))
        b1 = jnp.pad(b1, ((0, pad_h),))
        w2 = jnp.pad(w2, ((0, pad_h), (0, 0)))
    n_tok = (n + pad_n) // bt
    n_hid = (hid + pad_h) // bh
    out = pl.pallas_call(
        functools.partial(_kernel, num_hid_blocks=n_hid, fast_act=fast_act),
        grid=(n_tok, n_hid),
        in_specs=[
            pl.BlockSpec((bt, c), lambda it, ih: (it, 0)),
            pl.BlockSpec((c, bh), lambda it, ih: (0, ih)),
            pl.BlockSpec((1, bh), lambda it, ih: (0, ih)),
            pl.BlockSpec((bh, c_out), lambda it, ih: (ih, 0)),
            pl.BlockSpec((1, c_out), lambda it, ih: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, c_out), lambda it, ih: (it, 0)),
        out_shape=jax.ShapeDtypeStruct((n + pad_n, c_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((bt, c_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w1, b1[None], w2, b2[None])
    return out[:n] if pad_n else out


def _reference_mlp(x, w1, b1, w2, b2):
    """Unfused XLA form (the exact graph the kernel replaces)."""
    h = jax.lax.dot_general(
        x, w1, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1
    g = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    return (
        jax.lax.dot_general(
            g, w2, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2
    ).astype(x.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8)
)
def _fused_mlp_core(x2d, w1, b1, w2, b2, block_tokens, block_hidden, interpret,
                    fast_act):
    return _fused_mlp_2d(x2d, w1, b1, w2, b2, block_tokens, block_hidden,
                         interpret, fast_act)


def _fwd(x2d, w1, b1, w2, b2, block_tokens, block_hidden, interpret, fast_act):
    out = _fused_mlp_core(x2d, w1, b1, w2, b2, block_tokens, block_hidden,
                          interpret, fast_act)
    return out, (x2d, w1, b1, w2, b2)


def _bwd(block_tokens, block_hidden, interpret, fast_act, res, dy):
    x, w1, b1, w2, b2 = res
    h = jax.lax.dot_general(
        x, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1
    g32 = jax.nn.gelu(h, approximate=True)
    g = g32.astype(x.dtype)
    dy32 = dy.astype(jnp.float32)
    dg = jax.lax.dot_general(
        dy, w2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dh = dg * jax.grad(lambda t: jnp.sum(jax.nn.gelu(t, approximate=True)))(h)
    dhc = dh.astype(x.dtype)
    dx = jax.lax.dot_general(
        dhc, w1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    dw1 = jax.lax.dot_general(
        x, dhc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w1.dtype)
    db1 = jnp.sum(dh, axis=0).astype(b1.dtype)
    dw2 = jax.lax.dot_general(
        g, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w2.dtype)
    db2 = jnp.sum(dy32, axis=0).astype(b2.dtype)
    return dx, dw1, db1, dw2, db2


_fused_mlp_core.defvjp(_fwd, _bwd)


def fused_mlp(x, w1, b1, w2, b2, *, block_tokens: int = 512,
              block_hidden: int = 0, interpret: bool = False,
              fast_act: bool = False):
    """gelu-tanh MLP with the hidden activation kept in VMEM.

    x: [..., C]; w1 [C, H]; w2 [H, C_out]. Any number of leading dims.
    block_hidden=0 picks the largest hidden panel that keeps the weight
    panels + fp32 hidden tile within the VMEM budget.
    """
    c = x.shape[-1]
    hid = w1.shape[1]
    c_out = w2.shape[1]
    if block_hidden == 0:
        # weight panels (bf16) + fp32 hidden tile + fp32 acc + io tiles
        budget = 11 * 1024 * 1024
        bh = hid
        while bh > 128:
            bytes_needed = (
                2 * (c * bh + bh * c_out)          # w1/w2 panels bf16
                + 4 * block_tokens * bh            # fp32 hidden tile
                + 4 * block_tokens * c_out         # fp32 acc scratch
                + 2 * 2 * block_tokens * (c + c_out)  # double-buffered io
            )
            if bytes_needed <= budget:
                break
            bh //= 2
        if bh < hid:
            # hidden panels must be lane-aligned (Mosaic: last block dim a
            # multiple of 128 unless it spans the array)
            bh = max(128, (bh // 128) * 128)
        block_hidden = bh
    lead = x.shape[:-1]
    x2d = x.reshape(-1, c)
    out = _fused_mlp_core(x2d, w1, b1, w2, b2, block_tokens, block_hidden,
                          interpret, fast_act)
    return out.reshape(*lead, c_out)
