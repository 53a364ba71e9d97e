"""Isolated benchmark: fused window-attention kernel candidates vs the
shipping einsum path, at each hiera-L stage's window shapes.

The einsum path materializes per-window attention logits in HBM (bf16:
~17 MB per stage-3 block, written + read twice across softmax) — the one
algorithmically unavoidable traffic XLA cannot fuse away. These kernels keep
logits in VMEM. Layouts are the NATURAL split-qkv projection outputs
[N windows, S tokens, heads, head_dim] — no SDPA transposes on either side.

variants:
  einsum   — shipping path (models/hiera.py _split_window_attention core)
  kern_h   — Pallas, grid over window blocks, python loop over heads
  kern_gh  — Pallas, grid over (window blocks, heads), squeezed head dim
"""
import sys, time, json, functools, math, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from jax.experimental import pallas as pl
from sam2_opt_tpu.core.executor import enable_persistent_cache

enable_persistent_cache()

# hiera-L @1024 window-attention shapes: (label, N windows, S tokens, heads, d)
SHAPES = [
    ("s1", 1024, 64, 2, 72),
    ("s2", 1024, 16, 4, 72),
    ("s3", 16, 256, 8, 72),
    ("s4", 16, 64, 16, 72),
]


def einsum_attn(q, k, v):
    acc = q.dtype  # fast-softmax default on the bf16 path
    s = jnp.einsum("nqhd,nkhd->nhqk", q, k, preferred_element_type=acc)
    s = s * jnp.asarray(1.0 / math.sqrt(q.shape[-1]), acc)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nhqk,nkhd->nqhd", p.astype(v.dtype), v,
                      preferred_element_type=q.dtype)


def _attn_batched(q, k, v, scale):
    """Batched single-shot attention on [b, S, d] VMEM values."""
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v.dtype)
    return jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _kern_h(q_ref, k_ref, v_ref, o_ref, *, scale, heads):
    # full-block load, head indexing as VALUE ops (sublane ref-slicing is
    # what Mosaic rejected)
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    outs = []
    for h in range(heads):
        outs.append(
            _attn_batched(q[:, :, h, :], k[:, :, h, :], v[:, :, h, :], scale)
        )
    o_ref[...] = jnp.stack(outs, axis=2).astype(o_ref.dtype)


def kern_h(q, k, v, bn):
    N, S, H, D = q.shape
    while N % bn:
        bn -= 1
    spec = pl.BlockSpec((bn, S, H, D), lambda i: (i, 0, 0, 0))
    return pl.pallas_call(
        functools.partial(_kern_h, scale=1.0 / math.sqrt(D), heads=H),
        grid=(N // bn,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((N, S, H, D), q.dtype),
    )(q, k, v)


def _kern_3d(q_ref, k_ref, v_ref, o_ref, *, scale):
    o = _attn_batched(q_ref[...], k_ref[...], v_ref[...], scale)
    o_ref[...] = o.astype(o_ref.dtype)


def kern_3d(q, k, v, bn):
    """[N, S, h, d] -> XLA transpose to [N*h, S, d] -> 3D-batched kernel ->
    transpose back. The logits never touch HBM; the transposes do (q+k+v+o
    once each — far smaller than the logits traffic)."""
    N, S, H, D = q.shape
    NB = N * H
    while NB % bn:
        bn -= 1
    to3 = lambda x: x.transpose(0, 2, 1, 3).reshape(NB, S, D)
    spec = pl.BlockSpec((bn, S, D), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kern_3d, scale=1.0 / math.sqrt(D)),
        grid=(NB // bn,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NB, S, D), q.dtype),
    )(to3(q), to3(k), to3(v))
    return out.reshape(N, H, S, D).transpose(0, 2, 1, 3)


def timer(fn, q, k, v):
    @partial(jax.jit, static_argnames=("reps",))
    def f(q, k, v, reps):
        def body(i, acc):
            qq = q + (acc * 1e-6).astype(q.dtype)
            o = fn(qq, k, v)
            return jnp.mean(o.astype(jnp.float32))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(f(q, k, v, 2)); float(f(q, k, v, 202))
    def t(reps, n=7):
        ts = []
        for _ in range(n):
            t0 = time.time(); float(f(q, k, v, reps)); ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]
    return (t(202) - t(2)) / 200


rng = np.random.default_rng(0)
for label, N, S, H, D in SHAPES:
    q, k, v = (jnp.asarray(rng.standard_normal((N, S, H, D)), jnp.bfloat16)
               for _ in range(3))
    row = {"shape": label, "N": N, "S": S, "H": H}
    ref = np.asarray(einsum_attn(q, k, v), np.float32)
    for name, fn in (("kern_h", kern_h), ("kern_3d", kern_3d)):
        try:
            err = float(np.abs(np.asarray(
                jax.jit(lambda a, b, c: fn(a, b, c, 4))(q, k, v), np.float32
            ) - ref).max())
            row[f"{name}_err"] = round(err, 4)
        except Exception as e:
            row[f"{name}_err"] = f"ERR {type(e).__name__}"
    row["einsum_us"] = round(timer(einsum_attn, q, k, v) * 1e6, 1)
    for bn in (2, 4, 8, 16, 32):
        if bn <= N:
            try:
                row[f"kern_h_bn{bn}_us"] = round(timer(
                    lambda a, b, c: kern_h(a, b, c, bn), q, k, v) * 1e6, 1)
            except Exception as e:
                row[f"kern_h_bn{bn}_us"] = f"ERR {type(e).__name__}"
        if bn <= N * H:
            try:
                row[f"kern_3d_bn{bn}_us"] = round(timer(
                    lambda a, b, c: kern_3d(a, b, c, bn), q, k, v) * 1e6, 1)
            except Exception as e:
                row[f"kern_3d_bn{bn}_us"] = f"ERR {type(e).__name__}"
    print(json.dumps(row), flush=True)
