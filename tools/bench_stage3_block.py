"""Per-op isolation of ONE hiera-L stage-3 windowed block on v5e.

Stage 3 is 12.35/19.4 ms of the encode (33 windowed + 3 global blocks,
~343 us per windowed block — tools/bench_hiera_stages.py). This times each
piece of the block in the production window layout ([16, 16, 16, 576]) to
find where the per-block time goes: qkv projection, attention einsum, out
proj, LN+residual, MLP.
"""
import sys, time, json, math, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from sam2_opt_tpu.core.executor import enable_persistent_cache
from sam2_opt_tpu.ops import common as ops

enable_persistent_cache()

N, WS, C, H = 16, 16, 576, 8   # stage-3 window layout
S = WS * WS
D = C // H
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N, WS, WS, C)), jnp.bfloat16)
wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02, jnp.bfloat16)
bqkv = jnp.zeros((3 * C,), jnp.bfloat16)
wproj = jnp.asarray(rng.standard_normal((C, C)) * 0.02, jnp.bfloat16)
bproj = jnp.zeros((C,), jnp.bfloat16)
w1 = jnp.asarray(rng.standard_normal((C, 4 * C)) * 0.02, jnp.bfloat16)
b1 = jnp.zeros((4 * C,), jnp.bfloat16)
w2 = jnp.asarray(rng.standard_normal((4 * C, C)) * 0.02, jnp.bfloat16)
b2 = jnp.zeros((C,), jnp.bfloat16)
ln_w = jnp.ones((C,), jnp.float32)
ln_b = jnp.zeros((C,), jnp.float32)
lnp = {"weight": ln_w, "bias": ln_b}

qkv_f = lambda t: (t.reshape(N, S, C) @ wqkv + bqkv)


def split_qkv(t):
    xf = t.reshape(N, S, C)
    proj = lambda lo, hi: (xf @ wqkv[:, lo:hi] + bqkv[lo:hi]).reshape(N, S, H, D)
    return proj(0, C), proj(C, 2 * C), proj(2 * C, 3 * C)


def attn_einsum(t):
    q, k, v = split_qkv(t)
    acc = t.dtype
    s = jnp.einsum("nqhd,nkhd->nhqk", q, k, preferred_element_type=acc)
    s = s * jnp.asarray(1.0 / math.sqrt(D), acc)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nhqk,nkhd->nqhd", p.astype(v.dtype), v,
                      preferred_element_type=t.dtype)


PIECES = {
    "ln": lambda t: ops.layer_norm(lnp, t, eps=1e-6),
    "qkv_matmul": lambda t: qkv_f(t),
    "split_qkv_matmuls": lambda t: jnp.stack(split_qkv(t), 0),
    "attn_einsum_only": lambda t: attn_einsum(t),
    "proj": lambda t: t.reshape(N, S, C) @ wproj + bproj,
    "mlp": lambda t: (jax.nn.gelu(t.reshape(N, S, C) @ w1 + b1) @ w2 + b2),
    "full_block_attn_part": lambda t: (
        t + (attn_einsum(ops.layer_norm(lnp, t, eps=1e-6).reshape(N, WS, WS, C)
                         .reshape(N, WS, WS, C)).reshape(N, WS, WS, C) @ wproj
             + bproj)),
    "full_block_mlp_part": lambda t: t + (
        jax.nn.gelu(ops.layer_norm(lnp, t, eps=1e-6).reshape(N, S, C) @ w1
                    + b1) @ w2 + b2).reshape(N, WS, WS, C),
}


def timer(fn):
    @partial(jax.jit, static_argnames=("reps",))
    def f(t, reps):
        def body(i, acc):
            tt = t + (acc * 1e-6).astype(t.dtype)
            o = fn(tt)
            return jnp.mean(o.astype(jnp.float32))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(f(x, 2)); float(f(x, 202))
    def t(reps, n=7):
        ts = []
        for _ in range(n):
            t0 = time.time(); float(f(x, reps)); ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]
    return (t(202) - t(2)) / 200


row = {}
for name, fn in PIECES.items():
    row[name + "_us"] = round(timer(fn) * 1e6, 1)
    print(json.dumps(row), flush=True)
