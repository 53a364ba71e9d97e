"""Per-stage hiera-L encode timing on TPU: patch embed, each trunk stage.
Times the PRODUCTION trunk truncated after block i (models/hiera.py
`hiera(..., max_blocks=...)` — same block routing, window-run persistence,
and patch-embed fast path as real encodes) with in-graph loops, differenced.
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from sam2_opt_tpu.config import model_config
from sam2_opt_tpu.models import hiera as hi
from sam2_opt_tpu.models.init import init_params
from sam2_opt_tpu.models.model import _cast_tree
from sam2_opt_tpu.core.executor import enable_persistent_cache

enable_persistent_cache()
cfg = model_config("hiera_l")
params = _cast_tree(init_params(cfg, jax.random.PRNGKey(0)), jnp.bfloat16)
tp = params["image_encoder"]["trunk"]
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.random((1, 1024, 1024, 3)), jnp.bfloat16)
hcfg = cfg.trunk  # HieraConfig
print("stage_ends", hcfg.stage_ends, "n_blocks", len(hcfg.block_plan()))


def make_timer(n_blocks):
    @partial(jax.jit, static_argnames=("k",))
    def f(p, x, k):
        def body(i, acc):
            y = x + (acc * 1e-6).astype(x.dtype)
            out = hi.hiera(p, y, hcfg, max_blocks=n_blocks)[-1]
            return jnp.mean(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
    return f


def rate(fn, k_lo=2, k_hi=14, reps=5):
    float(fn(tp, x0, k_lo)); float(fn(tp, x0, k_hi))
    def timed(k):
        ts = []
        for _ in range(reps):
            t0 = time.time(); float(fn(tp, x0, k)); ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]
    return (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo)

marks = [0] + [e + 1 for e in hcfg.stage_ends]
prev = 0.0
for nb in marks:
    t = rate(make_timer(nb))
    label = "patch+pos" if nb == 0 else f"thru block {nb-1}"
    print(f"{label:>16}: cum {t*1e3:7.2f} ms  (+{(t-prev)*1e3:6.2f} ms)", flush=True)
    prev = t
