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
