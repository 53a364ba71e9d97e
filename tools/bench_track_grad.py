"""Isolate the TRACK-STEP backward cost at the production training shape.

tools/bench_train_mfu.py measured the rollout (non-encoder) backward at
~1.2 s for a 112 ms forward — an 11x bwd/fwd ratio, triple the healthy
~3.5x. This tool grads each track-step subgraph in isolation at the
b+ @1024 MOSE shapes (B=3 objects, bf16, 7-slot memory) to find which one
carries the pathology:

  memattn  — condition_features (4-layer memory attention, kv=7*4096+64)
  heads    — forward_sam_heads (prompt encoder + mask decoder + upscale)
  memenc   — encode_new_memory (mask downsample 1024^2 -> 64^2 + fuser)
  losses   — multistep mask/iou/occlusion losses at 1024^2

Per-rollout multipliers (T=8, n_init=1, 2 extra corrected frames,
2 clicks): memattn x7, heads x13 (3 frames x 3 steps + 5 x 1 on an
8-frame rollout with 2-click correction), memenc x8, losses x13.

    python tools/bench_track_grad.py [fwd|grad] ...
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from sam2_opt_tpu.core.executor import enable_persistent_cache
from sam2_opt_tpu.config import model_config
from sam2_opt_tpu.models.init import init_params
from sam2_opt_tpu.models.model import _cast_tree
from sam2_opt_tpu.models import sam2_base as base
from sam2_opt_tpu.ops import posenc

enable_persistent_cache()

B = 3
DT = jnp.bfloat16
cfg = model_config("hiera_b+")
G = cfg.image_embedding_size          # 64
S_mem = (cfg.num_maskmem) * G * G + cfg.max_obj_ptr_tokens  # 7*4096+64
params = _cast_tree(init_params(cfg, jax.random.PRNGKey(0)), DT)
rng = np.random.default_rng(0)


def mk(shape, dtype=DT):
    return jnp.asarray(rng.standard_normal(shape), dtype)


CURR = mk((B, G, G, 256))
CURR_POS = jnp.broadcast_to(
    posenc.sine_pos_embed_2d(G, G, 256).astype(DT)[None], (B, G, G, 256))
MEM = mk((B, S_mem, cfg.mem_dim))
MEM_POS = mk((B, S_mem, cfg.mem_dim))
KV_MASK = jnp.ones((B, S_mem), bool)
HRF0 = mk((B, 4 * G, 4 * G, 32))
HRF1 = mk((B, 2 * G, 2 * G, 64))
COORDS = jnp.asarray(rng.random((B, 3, 2)) * 1024, jnp.float32)
LABELS = jnp.ones((B, 3), jnp.int32)
HIGH_RES = mk((B, 1, 1024, 1024), jnp.float32)
OBJ_SCORE = jnp.ones((B, 1), jnp.float32)
GT = jnp.asarray(rng.random((B, 1, 1024, 1024)) > 0.7)


def timer(make_fn, tag, k_lo=2, k_hi=10):
    @partial(jax.jit, static_argnames=("k",))
    def run(p, k):
        def body(i, acc):
            return acc + make_fn(p, acc)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    for attempt in range(3):
        try:
            t0 = time.time()
            float(run(params, k_lo)); float(run(params, k_hi))
            print(f"[track] {tag} compile+first: {time.time()-t0:.1f}s",
                  flush=True)
            break
        except Exception as e:
            if attempt == 2 or "remote_compile" not in repr(e):
                print(f"[track] {tag} FAILED: {repr(e)[:200]}", flush=True)
                return None
            time.sleep(10)

    def t(k, n=5):
        ts = []
        for _ in range(n):
            t0 = time.time(); float(run(params, k)); ts.append(time.time()-t0)
        return sorted(ts)[len(ts)//2]
    per = max((t(k_hi) - t(k_lo)) / (k_hi - k_lo), 1e-6)
    print(f"[track] {tag}: {per*1000:.2f} ms/iter", flush=True)
    return per


def consume(tree):
    return sum(jnp.sum(x.astype(jnp.float32))
               for x in jax.tree_util.tree_leaves(tree))


# ---- subgraph definitions; `dep` keeps them loop-variant ---- #

def memattn(p, dep):
    curr = CURR + (dep * 1e-30).astype(DT)
    out = base.condition_features(p, cfg, curr, CURR_POS, MEM, MEM_POS,
                                  KV_MASK, cfg.num_maskmem * G * G)
    return jnp.sum(out.astype(jnp.float32))


def heads(p, dep):
    feat = CURR + (dep * 1e-30).astype(DT)
    outs = base.forward_sam_heads(
        p, cfg, feat, COORDS, LABELS, mask_inputs=None,
        high_res_features=(HRF0, HRF1), multimask_output=True)
    return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)


def memenc(p, dep):
    feat = CURR + (dep * 1e-30).astype(DT)
    mm, _ = base.encode_new_memory(p, cfg, feat,
                                   HIGH_RES + dep * 1e-30, OBJ_SCORE,
                                   is_mask_from_pts=True)
    return jnp.sum(mm.astype(jnp.float32))


def losses(p, dep):
    from sam2_opt_tpu.training import losses as L

    multimasks = HIGH_RES.astype(jnp.float32) + dep * 1e-30
    mm3 = jnp.concatenate([multimasks] * 3, axis=1)
    ious = jnp.ones((B, 3), jnp.float32) * 0.5
    out = L.multistep_multimasks_and_ious(
        [mm3], [ious], [OBJ_SCORE], GT.astype(jnp.float32),
        num_objects=float(B), obj_valid=jnp.ones((B,), bool),
    )
    return out["core_loss"] if "core_loss" in out else sum(
        v for k, v in out.items() if k.startswith("loss_"))


def memenc_down(p, dep):
    from sam2_opt_tpu.models import memory_encoder as me

    # [B,1,1024,1024] logits -> NHWC [B,1024,1024,1] mask input
    masks = HIGH_RES.transpose(0, 2, 3, 1).astype(DT) + (dep * 1e-30).astype(DT)
    m = me.mask_downsampler_packed(
        p["memory_encoder"]["mask_downsampler"], masks, cfg.memory_encoder)
    return jnp.sum(m.astype(jnp.float32))


def memenc_fuser(p, dep):
    from sam2_opt_tpu.models import memory_encoder as me

    x = CURR + (dep * 1e-30).astype(DT)
    for i in range(cfg.memory_encoder.fuser_num_layers):
        x = me.cx_block(p["memory_encoder"]["fuser"]["layers"][i], x,
                        cfg.memory_encoder)
    return jnp.sum(x.astype(jnp.float32))


SUBGRAPHS = {"memattn": (memattn, 7), "heads": (heads, 13),
             "memenc": (memenc, 8), "losses": (losses, 13),
             "memenc_down": (memenc_down, 8), "memenc_fuser": (memenc_fuser, 8)}


def main():
    args = sys.argv[1:]
    want = [a for a in args if a in ("fwd", "grad")] or ["fwd", "grad"]
    only = [a for a in args if a in SUBGRAPHS]
    rows = {}
    for name, (fn, mult) in SUBGRAPHS.items():
        if only and name not in only:
            continue
        if "fwd" in want:
            per = timer(lambda p, dep, f=fn: f(p, dep), f"{name}_fwd")
            if per is not None:
                rows[f"{name}_fwd"] = per * 1000
        if "grad" in want:
            def gbody(p, dep, f=fn):
                val, grads = jax.value_and_grad(f)(p, dep)
                return val + consume(grads)
            per = timer(gbody, f"{name}_grad", k_lo=1, k_hi=5)
            if per is not None:
                rows[f"{name}_grad"] = per * 1000
    print("[track] summary (ms/call, rollout multiplier):", flush=True)
    for name, (fn, mult) in SUBGRAPHS.items():
        f = rows.get(f"{name}_fwd"); g = rows.get(f"{name}_grad")
        print(f"  {name}: fwd {f and round(f,2)} grad {g and round(g,2)} "
              f"x{mult}/rollout -> grad {g and round(g*mult,1)} ms/rollout",
              flush=True)
    print(json.dumps({k: round(v, 2) for k, v in rows.items()}), flush=True)


if __name__ == "__main__":
    main()
