"""Autotune flash block sizes for the memory-attention shape on this chip."""
import sys, time, json
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from sam2_opt_tpu.config import model_config
from sam2_opt_tpu.models import video_core as vc
from sam2_opt_tpu.models.init import init_params
from sam2_opt_tpu.models.model import _cast_tree
from sam2_opt_tpu.core.executor import enable_persistent_cache
import sam2_opt_tpu.ops.common as opsc
from sam2_opt_tpu.kernels.flash_attention import flash_attention

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
m0 = jnp.ones((S,1,g,g,D), jnp.bfloat16)*0.1
p0 = jnp.ones((P,1,C), jnp.float32)*0.1
mem = vc.MemoryInput(feats=tuple(m0[j] for j in range(S)), tpos_idx=tpos_idx,
    valid=valid, ptrs=tuple(p0[j] for j in range(P)), ptr_pos=ptr_pos, ptr_valid=ptr_valid)

# patch at the kernel module: both flash_or_sdpa AND the fused-RoPE branch in
# models/memory_attention.py resolve flash_attention from this module per call
import sam2_opt_tpu.kernels.flash_attention as fa
orig = fa.flash_attention
orig_kv = fa.flash_attention_kv_proj
WHICH = __import__("os").environ.get("SWEEP_WHICH", "both")  # plain|kvproj|both
def set_blocks(bq, bk):
    def f(q, k, v, kv_mask=None, rope_cos_k=None, rope_sin_k=None, **kw):
        kw.pop("block_q", None); kw.pop("block_k", None)
        if WHICH == "kvproj":
            return orig(q, k, v, kv_mask=kv_mask, rope_cos_k=rope_cos_k,
                        rope_sin_k=rope_sin_k, **kw)
        return orig(q, k, v, kv_mask=kv_mask, rope_cos_k=rope_cos_k,
                    rope_sin_k=rope_sin_k, block_q=bq, block_k=bk, **kw)
    def fkv(*a, **kw):
        kw.pop("block_q", None); kw.pop("block_k", None)
        if WHICH == "plain":
            return orig_kv(*a, **kw)
        return orig_kv(*a, block_q=bq, block_k=bk, **kw)
    fa.flash_attention = f
    fa.flash_attention_kv_proj = fkv

def memattn_k_fn(bq, bk):
    @partial(jax.jit, static_argnames=("k",))
    def memattn_k(p, k):
        def body(i, acc):
            e = embed + (acc*1e-6).astype(embed.dtype)
            out = vc.condition_on_memory(p, cfg, e, mem)
            return jnp.mean(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
    return memattn_k

def rate(fn, k_lo=2, k_hi=24):
    float(fn(params, k_lo)); float(fn(params, k_hi))
    def timed(k, reps=5):
        ts=[]
        for _ in range(reps):
            t0=time.time(); float(fn(params, k)); ts.append(time.time()-t0)
        return sorted(ts)[len(ts)//2]
    return max((timed(k_hi)-timed(k_lo))/(k_hi-k_lo), 1e-6)*1000

import os
SWEEP = os.environ.get("SWEEP")
cands = ([tuple(int(x) for x in p.split("x")) for p in SWEEP.split(",")]
         if SWEEP else
         [(256,512),(512,512),(512,1024),(1024,1024),(1024,512),(2048,1024),(1024,2048),(4096,1024)])
for bq, bk in cands:
    set_blocks(bq, bk)
    try:
        ms = rate(memattn_k_fn(bq, bk))
        print(json.dumps({"bq": bq, "bk": bk, "ms": round(ms,2)}), flush=True)
    except Exception as e:
        print(json.dumps({"bq": bq, "bk": bk, "error": str(e)[:120]}), flush=True)
fa.flash_attention = orig
fa.flash_attention_kv_proj = orig_kv
