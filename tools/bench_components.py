"""Component timing: track-step pieces in isolation (in-graph loops)."""
import sys, time, json
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from sam2_opt_tpu.config import model_config
from sam2_opt_tpu.models import sam2_base as base
from sam2_opt_tpu.models import video_core as vc
from sam2_opt_tpu.models.init import init_params
from sam2_opt_tpu.models.model import _cast_tree
from sam2_opt_tpu.core.executor import enable_persistent_cache

enable_persistent_cache()
cfg = model_config("hiera_l")
params = _cast_tree(init_params(cfg, jax.random.PRNGKey(0)), jnp.bfloat16)
S, P = cfg.num_maskmem, cfg.max_obj_ptrs_in_encoder
g, D, C = cfg.image_embedding_size, cfg.mem_dim, cfg.hidden_dim
tpos_idx = jnp.arange(S, dtype=jnp.int32)[None]
valid = jnp.ones((1, S), bool)
ptr_pos = (jnp.arange(P, dtype=jnp.float32) / max(P-1,1))[None]
ptr_valid = jnp.ones((1, P), bool)
multimask = True

def mem_of(mem_feats, ptrs):
    return vc.MemoryInput(
        feats=tuple(mem_feats[j] for j in range(S)), tpos_idx=tpos_idx, valid=valid,
        ptrs=tuple(ptrs[j] for j in range(P)), ptr_pos=ptr_pos, ptr_valid=ptr_valid)

rng = np.random.default_rng(0)
hrf0 = jnp.asarray(rng.random((1, 256, 256, 32)), jnp.bfloat16)
hrf1 = jnp.asarray(rng.random((1, 128, 128, 64)), jnp.bfloat16)
embed = jnp.asarray(rng.random((1, 64, 64, 256)), jnp.bfloat16)

def rate(fn, label, k_lo=2, k_hi=16):
    t0=time.time(); float(fn(k_lo)); float(fn(k_hi))
    def timed(k, reps=5):
        ts=[]
        for _ in range(reps):
            t0=time.time(); float(fn(k)); ts.append(time.time()-t0)
        return sorted(ts)[len(ts)//2]
    per = max((timed(k_hi)-timed(k_lo))/(k_hi-k_lo), 1e-6)
    print(json.dumps({"label": label, "ms": round(per*1000,2)}))

# full track step (cond + memenc), no encode
@partial(jax.jit, static_argnames=("k",))
def track_k(p, k):
    def body(i, carry):
        mem_feats, ptrs, acc = carry
        e = embed + (acc*1e-6).astype(embed.dtype)
        o = vc.track_step_conditioned(p, cfg, (hrf0, hrf1, e), mem_of(mem_feats, ptrs),
            multimask_output=multimask, run_mem_encoder=True)
        nm = jnp.concatenate([o["maskmem_features"][None], mem_feats[:-1]], axis=0)
        np_ = jnp.concatenate([o["obj_ptr"][None], ptrs[:-1]], axis=0)
        return nm, np_, jnp.mean(o["pred_masks"].astype(jnp.float32))
    m0 = jnp.zeros((S,1,g,g,D), jnp.bfloat16); p0 = jnp.zeros((P,1,C), jnp.float32)
    return jax.lax.fori_loop(0, k, body, (m0, p0, jnp.float32(0.0)))[2]

# memory attention only
@partial(jax.jit, static_argnames=("k",))
def memattn_k(p, k):
    m0 = jnp.ones((S,1,g,g,D), jnp.bfloat16)*0.1; p0 = jnp.ones((P,1,C), jnp.float32)*0.1
    def body(i, acc):
        e = embed + (acc*1e-6).astype(embed.dtype)
        out = vc.condition_on_memory(p, cfg, e, mem_of(m0, p0))
        return jnp.mean(out.astype(jnp.float32))
    return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

# SAM heads only
@partial(jax.jit, static_argnames=("k",))
def heads_k(p, k):
    def body(i, acc):
        e = embed + (acc*1e-6).astype(embed.dtype)
        outs = base.forward_sam_heads(p, cfg, e, jnp.zeros((1,1,2), jnp.float32),
            -jnp.ones((1,1), jnp.int32), high_res_features=(hrf0, hrf1), multimask_output=True)
        # consume low-res, the SELECTED high-res mask and the obj ptr (what
        # the track step consumes) so XLA cannot dead-code the upsample
        return (jnp.mean(outs[3].astype(jnp.float32))
                + jnp.mean(outs[4].astype(jnp.float32)) * 1e-3
                + jnp.mean(outs[5].astype(jnp.float32)) * 1e-3)
    return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

# memory encoder only
@partial(jax.jit, static_argnames=("k",))
def memenc_k(p, k):
    hi = jnp.asarray(rng.random((1,1,1024,1024)) * 8 - 4, jnp.float32)
    def body(i, acc):
        # vary BOTH inputs per iteration — a loop-invariant mask lets XLA
        # hoist the whole downsampler out of the fori_loop
        e = embed + (acc*1e-6).astype(embed.dtype)
        hm = hi + acc.astype(hi.dtype) * 1e-6
        mm, _ = base.encode_new_memory(p, cfg, e, hm, jnp.asarray([[3.0]]), is_mask_from_pts=False)
        return jnp.mean(mm.astype(jnp.float32))
    return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

rate(lambda k: track_k(params, k), "track_step_full(no encode)")
rate(lambda k: memattn_k(params, k), "memory_attention")
rate(lambda k: heads_k(params, k), "sam_heads")
rate(lambda k: memenc_k(params, k), "memory_encoder")
