"""Per-op isolation of hiera-L stage-1 and stage-2 windowed blocks on v5e,
plus a channel-padding ablation.

Stage 1 measures ~970 us/block and stage 2 ~550 us/block in the trunk
(tools/bench_hiera_stages.py) — both far above their max(compute, traffic)
rooflines. Hypothesis: C=144 / C=288 are not multiples of the 128-lane tile,
so every materialized [.., C] buffer is lane-padded (144 -> 256 physical,
x1.78 traffic; 288 -> 384, x1.33). The `cpad` rows time the SAME ops at the
next 128-multiple channel count: if padding is the cost, C=256 should run
FASTER than C=144 despite 78% more math.
"""
import sys, time, json, math, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from sam2_opt_tpu.core.executor import enable_persistent_cache
from sam2_opt_tpu.ops import common as ops

enable_persistent_cache()

# (label, windows, window tokens, C, heads)
CASES = [
    ("s1", 1024, 64, 144, 2),
    ("s1_cpad", 1024, 64, 256, 2),
    ("s2", 1024, 16, 288, 4),
    ("s2_cpad", 1024, 16, 384, 4),
]


def timer(fn, x):
    @partial(jax.jit, static_argnames=("reps",))
    def f(t, reps):
        def body(i, acc):
            tt = t + (acc * 1e-6).astype(t.dtype)
            return jnp.mean(fn(tt).astype(jnp.float32))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(f(x, 2)); float(f(x, 102))
    def t(reps, n=7):
        ts = []
        for _ in range(n):
            t0 = time.time(); float(f(x, reps)); ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]
    return (t(102) - t(2)) / 100


for label, N, S, C, H in CASES:
    D = C // H
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, S, C)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02, jnp.bfloat16)
    bqkv = jnp.zeros((3 * C,), jnp.bfloat16)
    wproj = jnp.asarray(rng.standard_normal((C, C)) * 0.02, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((C, 4 * C)) * 0.02, jnp.bfloat16)
    b1 = jnp.zeros((4 * C,), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((4 * C, C)) * 0.02, jnp.bfloat16)
    b2 = jnp.zeros((C,), jnp.bfloat16)
    lnp = {"weight": jnp.ones((C,), jnp.float32),
           "bias": jnp.zeros((C,), jnp.float32)}

    def attn(t):
        qkv = (t @ wqkv + bqkv).reshape(N, S, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        acc = t.dtype
        s = jnp.einsum("nqhd,nkhd->nhqk", q, k, preferred_element_type=acc)
        s = s * jnp.asarray(1.0 / math.sqrt(D), acc)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("nhqk,nkhd->nqhd", p.astype(v.dtype), v,
                          preferred_element_type=t.dtype).reshape(N, S, C)

    pieces = {
        "ln": lambda t: ops.layer_norm(lnp, t, eps=1e-6),
        "qkv_matmul": lambda t: t @ wqkv + bqkv,
        "attn_full": attn,
        "proj": lambda t: t @ wproj,
        "mlp": lambda t: jax.nn.gelu(t @ w1 + b1) @ w2 + b2,
        "residual_add": lambda t: t + t * 0.5,
    }
    row = {"case": label, "N": N, "S": S, "C": C}
    total = 0.0
    for name, fn in pieces.items():
        us = timer(fn, x) * 1e6
        row[name + "_us"] = round(us, 1)
        total += us
    row["sum_us"] = round(total, 1)
    print(json.dumps(row), flush=True)
