"""8-object per-frame tracking cost: shared encode + object-batched step."""
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
B = 8
tpos_idx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
valid = jnp.ones((B, S), bool)
ptr_pos = jnp.broadcast_to((jnp.arange(P, dtype=jnp.float32)/max(P-1,1))[None], (B, P))
ptr_valid = jnp.ones((B, P), bool)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((1, 1024, 1024, 3), np.float32), jnp.bfloat16)

@partial(jax.jit, static_argnames=("k",))
def video8_k(p, x, k):
    def body(i, carry):
        mem_feats, ptrs, acc = carry
        y = x + (acc*1e-6).astype(x.dtype)
        out = base.forward_image(p, cfg, base.image_normalize(y))
        f0, f1, f2 = out["backbone_fpn"]
        f0 = jnp.repeat(f0, B, axis=0); f1 = jnp.repeat(f1, B, axis=0); f2 = jnp.repeat(f2, B, axis=0)
        mem = vc.MemoryInput(
            feats=tuple(mem_feats[j] for j in range(S)), tpos_idx=tpos_idx, valid=valid,
            ptrs=tuple(ptrs[j] for j in range(P)), ptr_pos=ptr_pos, ptr_valid=ptr_valid)
        o = vc.track_step_conditioned(p, cfg, (f0, f1, f2), mem,
            multimask_output=True, run_mem_encoder=True)
        nm = jnp.concatenate([o["maskmem_features"][None], mem_feats[:-1]], axis=0)
        npp = jnp.concatenate([o["obj_ptr"][None], ptrs[:-1]], axis=0)
        return nm, npp, jnp.mean(o["pred_masks"].astype(jnp.float32))
    m0 = jnp.zeros((S, B, g, g, D), jnp.bfloat16)
    p0 = jnp.zeros((P, B, C), jnp.float32)
    return jax.lax.fori_loop(0, k, body, (m0, p0, jnp.float32(0.0)))[2]

def rate(fn, k_lo=2, k_hi=8):
    float(fn(k_lo)); float(fn(k_hi))
    def timed(k, reps=5):
        ts=[]
        for _ in range(reps):
            t0=time.time(); float(fn(k)); ts.append(time.time()-t0)
        return sorted(ts)[len(ts)//2]
    return max((timed(k_hi)-timed(k_lo))/(k_hi-k_lo), 1e-6)*1000

ms = rate(lambda k: video8_k(params, img, k))
print(json.dumps({"label": "video_8obj_per_frame", "ms": round(ms,2), "ms_per_obj": round(ms/8,2)}))
