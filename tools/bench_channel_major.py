"""Channel-major layout probe for hiera-L stage-1/2 ops on v5e.

Stage-1/2 blocks measure ~4x above their compute rooflines
(tools/bench_stage12_block.py). The earlier `cpad` ablation refuted
*logical* channel padding (C=144 -> 256 math: slower, +78% FLOPs), but it
never tested the layout question directly: in token-major [T, C] every
materialized buffer puts C on the 128-lane minor dim, so C=144 pads to 256
physical lanes (x1.78 HBM traffic) and C=288 to 384 (x1.33). In
channel-major [C, T] the token count (a 128-multiple) fills the lanes and
C=144 = 9 x 16 sublanes pads to nothing.

This probe times the SAME ops (LN, qkv matmul, MLP, residual) in both
orientations at stage-1 (C=144, T=65536) and stage-2 (C=288, T=16384)
shapes. If channel-major wins big, the trunk's window-run persistence can
carry stages 1-2 channel-major between attentions.

Caveat: each op is timed in isolation with a jnp.mean reduction and a
dependency-add to defeat DCE, which inflates the cheap ops (resid/LN) by a
constant overhead — it cancels between orientations, which is the only
comparison this probe makes.
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from sam2_opt_tpu.core.executor import enable_persistent_cache

enable_persistent_cache()

# (label, tokens, C)
CASES = [
    ("s1", 65536, 144),
    ("s2", 16384, 288),
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


for label, T, C in CASES:
    rng = np.random.default_rng(0)
    x_tc = jnp.asarray(rng.standard_normal((T, C)), jnp.bfloat16)
    x_ct = jnp.asarray(np.asarray(x_tc, np.float32).T, jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((C, 4 * C)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((4 * C, C)) * 0.02, jnp.bfloat16)
    g = jnp.ones((C,), jnp.float32)
    b = jnp.zeros((C,), jnp.float32)

    def ln_tc(t):
        tf = t.astype(jnp.float32)
        mu = tf.mean(-1, keepdims=True)
        var = ((tf - mu) ** 2).mean(-1, keepdims=True)
        return ((tf - mu) * jax.lax.rsqrt(var + 1e-6) * g + b).astype(t.dtype)

    def ln_ct(t):
        tf = t.astype(jnp.float32)
        mu = tf.mean(0, keepdims=True)
        var = ((tf - mu) ** 2).mean(0, keepdims=True)
        return ((tf - mu) * jax.lax.rsqrt(var + 1e-6) * g[:, None]
                + b[:, None]).astype(t.dtype)

    pieces_tc = {
        "ln": ln_tc,
        "qkv": lambda t: t @ wqkv,
        "mlp": lambda t: jax.nn.gelu(t @ w1) @ w2,
        "resid": lambda t: t + t * 0.5,
    }
    pieces_ct = {
        "ln": ln_ct,
        "qkv": lambda t: wqkv.T @ t,
        "mlp": lambda t: w2.T @ jax.nn.gelu(w1.T @ t),
        "resid": lambda t: t + t * 0.5,
    }
    row = {"case": label, "T": T, "C": C}
    for name, fn in pieces_tc.items():
        row[f"tc_{name}_us"] = round(timer(fn, x_tc) * 1e6, 1)
    for name, fn in pieces_ct.items():
        row[f"ct_{name}_us"] = round(timer(fn, x_ct) * 1e6, 1)
    row["tc_sum_us"] = round(sum(v for k, v in row.items()
                                 if isinstance(v, float) and k.startswith("tc_")), 1)
    row["ct_sum_us"] = round(sum(v for k, v in row.items()
                                 if isinstance(v, float) and k.startswith("ct_")), 1)
    print(json.dumps(row))
