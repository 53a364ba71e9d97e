import sys, time, json
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from sam2_opt_tpu.config import model_config
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
rng = np.random.default_rng(0)
embed = jnp.asarray(rng.random((1, 64, 64, 256)), jnp.bfloat16)

def mem_of(mem_feats, ptrs):
    return vc.MemoryInput(
        feats=tuple(mem_feats[j] for j in range(S)), tpos_idx=tpos_idx, valid=valid,
        ptrs=tuple(ptrs[j] for j in range(P)), ptr_pos=ptr_pos, ptr_valid=ptr_valid)

@partial(jax.jit, static_argnames=("k",))
def memattn_k(p, k):
    m0 = jnp.ones((S,1,g,g,D), jnp.bfloat16)*0.1; p0 = jnp.ones((P,1,C), jnp.float32)*0.1
    def body(i, acc):
        e = embed + (acc*1e-6).astype(embed.dtype)
        out = vc.condition_on_memory(p, cfg, e, mem_of(m0, p0))
        return jnp.mean(out.astype(jnp.float32))
    return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

t0=time.time(); float(memattn_k(params, 2)); float(memattn_k(params, 16))
print("compile", round(time.time()-t0,1), "s", file=sys.stderr)
def timed(k, reps=5):
    ts=[]
    for _ in range(reps):
        t0=time.time(); float(memattn_k(params, k)); ts.append(time.time()-t0)
    return sorted(ts)[len(ts)//2]
per = max((timed(16)-timed(2))/14, 1e-6)
print(json.dumps({"label": "memory_attention", "ms": round(per*1000,3)}))
