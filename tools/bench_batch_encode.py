"""Batched image-encode throughput (BASELINE config #2 shape, batch 8).

The reference pins its TRT engine profile to batch 1 (quant_image_encoder.py
batch opt=1) and encodes batches by looping; on TPU the encoder is partially
bandwidth-bound at batch 1, so batching raises MXU occupancy and aggregate
throughput. Prints ms/img and img/s at each batch size (in-graph loop
timing, see doc/benchmark.md methodology)."""
import sys, time, json
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from sam2_opt_tpu.config import model_config
from sam2_opt_tpu.models import sam2_base as base
from sam2_opt_tpu.models.init import init_params
from sam2_opt_tpu.models.model import _cast_tree
from sam2_opt_tpu.core.executor import enable_persistent_cache

enable_persistent_cache()
cfg = model_config("hiera_l")
params = _cast_tree(init_params(cfg, jax.random.PRNGKey(0)), jnp.bfloat16)
s = cfg.image_size
rng = np.random.default_rng(0)

def bench(batch, k_lo=2, k_hi=8):
    img = jnp.asarray(rng.random((batch, s, s, 3), np.float32), jnp.bfloat16)

    @partial(jax.jit, static_argnames=("k",))
    def encode_k(p, x, k):
        def body(i, carry):
            y = x + (carry * 1e-6).astype(x.dtype)
            out = base.forward_image(p, cfg, base.image_normalize(y))
            return jnp.mean(out["backbone_fpn"][2].astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t0 = time.time()
    float(encode_k(params, img, k_lo)); float(encode_k(params, img, k_hi))
    print(f"[batch {batch}] compile {time.time()-t0:.0f}s", file=sys.stderr)

    def timed(k, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.time(); float(encode_k(params, img, k)); ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    per = max((timed(k_hi) - timed(k_lo)) / (k_hi - k_lo), 1e-6)
    print(json.dumps({
        "batch": batch,
        "ms_per_batch": round(per * 1000, 2),
        "ms_per_img": round(per * 1000 / batch, 2),
        "img_per_s": round(batch / per, 2),
    }))

for b in (1, 2, 4, 8):
    bench(b)
