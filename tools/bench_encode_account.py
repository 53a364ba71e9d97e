"""Complete per-op account of the hiera-L 1024² encode on v5e (VERDICT r4 #7).

Extends the stage-3 per-op roofline (tools/bench_stage3_block.py) to every
stage, the patch embed, the pos embed, and the FPN neck, so each of the
~19 ms has an (op, measured, floor) attribution. Floors are
max(FLOP-time at 197 TFLOP/s bf16, HBM-time at 819 GB/s) per op in
isolation — the usual caveat applies that neighboring ops fuse in the real
trunk, so the sum of isolated ops UPPER-bounds the real stage cost while
the floor sum LOWER-bounds it.

Block shapes are the production layouts (window-run persistence,
token-flat only for >=256-token windows — models/hiera.py):

  stage 1: 1024 windows x 64 tok x C=144 (2 blocks, square layout)
  stage 2: 1024 windows x 16 tok x C=288 (6 blocks, square layout)
  stage 3: 16 windows x 256 tok x C=576 (33 windowed flat + 3 global 4096)
  stage 4: 16 windows x 64 tok x C=1152 (4 blocks)

    python tools/bench_encode_account.py
"""
import sys, time, json, math, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from sam2_opt_tpu.core.executor import enable_persistent_cache
from sam2_opt_tpu.ops import common as ops

enable_persistent_cache()

PEAK_FLOPS = 197e12   # v5e bf16
PEAK_HBM = 819e9      # v5e HBM BW


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


def floor_us(flops, bytes_):
    return max(flops / PEAK_FLOPS, bytes_ / PEAK_HBM) * 1e6


# (stage, windows N, tokens S, C, heads, windowed blocks, global blocks)
STAGES = [
    ("s1", 1024, 64, 144, 2, 2, 0),
    ("s2", 1024, 16, 288, 4, 6, 0),
    ("s3", 16, 256, 576, 8, 33, 3),
    ("s4", 16, 64, 1152, 16, 4, 0),
]


def block_ops(N, S, C, H):
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

    T = N * S  # total tokens
    # (fn, flops, hbm bytes) — bytes = inputs+outputs at bf16, weights once
    return x, {
        "ln": (lambda t: ops.layer_norm(lnp, t, eps=1e-6),
               8 * T * C, 4 * T * C),
        "qkv_matmul": (lambda t: t @ wqkv + bqkv,
                       2 * T * C * 3 * C, 2 * T * C + 2 * T * 3 * C + 6 * C * C),
        "attn_core": (attn,
                      2 * T * C * 3 * C + 4 * T * S * C,
                      2 * T * C + 2 * T * C + 6 * C * C),
        "proj": (lambda t: t @ wproj,
                 2 * T * C * C, 4 * T * C + 2 * C * C),
        "mlp": (lambda t: jax.nn.gelu(t @ w1 + b1) @ w2 + b2,
                16 * T * C * C, 4 * T * C + 16 * C * C),
        "residual_add": (lambda t: t + t * 0.5, T * C, 6 * T * C),
    }


def main():
    rows = []
    grand_measured = grand_floor = 0.0
    for stage, N, S, C, H, nblk, nglob in STAGES:
        x, pieces = block_ops(N, S, C, H)
        per_block_meas = per_block_floor = 0.0
        for name, (fn, fl, by) in pieces.items():
            if name == "qkv_matmul":
                continue  # folded into attn_core
            us = timer(fn, x) * 1e6
            f_us = floor_us(fl, by)
            rows.append({"stage": stage, "op": name,
                         "measured_us": round(us, 1),
                         "floor_us": round(f_us, 1)})
            per_block_meas += us
            per_block_floor += f_us
        stage_meas = per_block_meas * nblk
        stage_floor = per_block_floor * nblk
        if nglob:
            xg, gpieces = block_ops(1, N * S, C, H)
            g_meas = g_floor = 0.0
            for name, (fn, fl, by) in gpieces.items():
                if name == "qkv_matmul":
                    continue
                us = timer(fn, xg) * 1e6
                f_us = floor_us(fl, by)
                g_meas += us
                g_floor += f_us
            rows.append({"stage": stage + "_global", "op": "block_sum",
                         "measured_us": round(g_meas, 1),
                         "floor_us": round(g_floor, 1)})
            stage_meas += g_meas * nglob
            stage_floor += g_floor * nglob
        rows.append({"stage": stage, "op": f"STAGE x{nblk}+{nglob}g",
                     "measured_us": round(stage_meas, 1),
                     "floor_us": round(stage_floor, 1)})
        grand_measured += stage_meas
        grand_floor += stage_floor

    # patch embed: conv 7x7 stride 4, 1024^2 x3 -> 144 (+ pos embed add)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((1, 1024, 1024, 3)), jnp.bfloat16)
    wconv = jnp.asarray(rng.standard_normal((7, 7, 3, 144)) * 0.02,
                        jnp.bfloat16)

    def patch(t):
        return jax.lax.conv_general_dilated(
            t, wconv, (4, 4), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    us = timer(patch, img) * 1e6
    f_us = floor_us(2 * 256 * 256 * 144 * 7 * 7 * 3,
                    2 * (1024 * 1024 * 3 + 256 * 256 * 144))
    rows.append({"stage": "patch", "op": "conv7x7s4",
                 "measured_us": round(us, 1), "floor_us": round(f_us, 1)})
    grand_measured += us
    grand_floor += f_us

    pos = jnp.asarray(rng.standard_normal((1, 7, 7, 144)), jnp.float32)

    def pos_embed(t):
        # bicubic background interp + tiled window embed + add (hiera.py)
        pe = jax.image.resize(pos, (1, 256, 256, 144), "bicubic")
        return t + pe.astype(t.dtype)

    x0 = jnp.asarray(rng.standard_normal((1, 256, 256, 144)), jnp.bfloat16)
    us = timer(pos_embed, x0) * 1e6
    f_us = floor_us(0, 6 * 256 * 256 * 144)
    rows.append({"stage": "patch", "op": "pos_embed",
                 "measured_us": round(us, 1), "floor_us": round(f_us, 1)})
    grand_measured += us
    grand_floor += f_us

    # FPN neck: 1x1 convs (C_i -> 256) on the 4 pyramid levels + top-down
    neck_meas = neck_floor = 0.0
    for C_i, G in ((144, 256), (288, 128), (576, 64), (1152, 32)):
        xi = jnp.asarray(rng.standard_normal((1, G, G, C_i)), jnp.bfloat16)
        wi = jnp.asarray(rng.standard_normal((C_i, 256)) * 0.02, jnp.bfloat16)
        us = timer(lambda t, w=wi: t @ w, xi) * 1e6
        f_us = floor_us(2 * G * G * C_i * 256,
                        2 * G * G * (C_i + 256) + 2 * C_i * 256)
        neck_meas += us
        neck_floor += f_us
    rows.append({"stage": "neck", "op": "lateral_convs_sum",
                 "measured_us": round(neck_meas, 1),
                 "floor_us": round(neck_floor, 1)})
    grand_measured += neck_meas
    grand_floor += neck_floor

    for r in rows:
        print(json.dumps(r), flush=True)
    print(json.dumps({
        "stage": "TOTAL-of-isolated-ops", "op": "encode",
        "measured_us": round(grand_measured, 1),
        "floor_us": round(grand_floor, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
