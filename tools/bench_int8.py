"""Int8 encoder perf measurement on the real chip (doc/benchmark.md int8 row)."""
import sys, time, json
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from sam2_opt_tpu.config import model_config
from sam2_opt_tpu.models import sam2_base as base
from sam2_opt_tpu.models.init import init_params
from sam2_opt_tpu.models.model import _cast_tree
from sam2_opt_tpu.core.executor import enable_persistent_cache
from sam2_opt_tpu.quant.int8 import quantize_params
from sam2_opt_tpu.quant.calibrate import collect_activation_scales

enable_persistent_cache()
cfg = model_config("hiera_l")
params = init_params(cfg, jax.random.PRNGKey(0))
s = cfg.image_size
rng = np.random.default_rng(0)
img_np = rng.random((1, s, s, 3), np.float32)

def bench(p, img, label, k_lo=2, k_hi=10):
    @partial(jax.jit, static_argnames=("k",))
    def encode_k(p, x, k):
        def body(i, carry):
            y = x + (carry * 1e-6).astype(x.dtype)
            out = base.forward_image(p, cfg, base.image_normalize(y))
            return jnp.mean(out["backbone_fpn"][2].astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
    t0=time.time(); float(encode_k(p, img, k_lo)); float(encode_k(p, img, k_hi))
    print(f"[{label}] compile {time.time()-t0:.0f}s", file=sys.stderr)
    def timed(k, reps=5):
        ts=[]
        for _ in range(reps):
            t0=time.time(); float(encode_k(p, img, k)); ts.append(time.time()-t0)
        return sorted(ts)[len(ts)//2]
    per = max((timed(k_hi)-timed(k_lo))/(k_hi-k_lo), 1e-6)
    print(json.dumps({"label": label, "ms_per_img": round(per*1000,2), "fps": round(1/per,2)}))

img_bf16 = jnp.asarray(img_np, jnp.bfloat16)
p_bf16 = _cast_tree(params, jnp.bfloat16)
bench(p_bf16, img_bf16, "bf16")

q_w = quantize_params(_cast_tree(params, jnp.bfloat16))
bench(q_w, img_bf16, "int8-weight-only")

print("collecting act scales (cpu-ish eager on device)...", file=sys.stderr)
scales = collect_activation_scales(params, cfg, [img_np[..., :]], percentile=100.0)
q_a = quantize_params(_cast_tree(params, jnp.bfloat16), act_scales=scales)
bench(q_a, img_bf16, "int8-act-quant")
