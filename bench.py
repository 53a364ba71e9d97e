"""Headline benchmark: hiera-L 1024² image-encode throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference TensorRT-fp16 e2e image encode on A100 = 0.030 s/image
(BASELINE.md, doc/benchmark.md:12) -> 33.33 FPS. vs_baseline = our_fps / 33.33.

Methodology: on remote-attached TPUs, `block_until_ready` does not reflect
device completion and every host call pays a ~25 ms relay round trip. We
therefore run K data-dependent encodes inside ONE compiled loop, force
completion with a scalar fetch, and difference K=K_hi vs K=K_lo to cancel the
fixed per-call overhead — yielding pure per-image device latency.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 1.0 / 0.030  # TRT-fp16 hiera-L image encode, A100


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from sam2_opt_tpu.config import model_config
    from sam2_opt_tpu.models import sam2_base as base
    from sam2_opt_tpu.models.init import init_params
    from sam2_opt_tpu.models.model import _cast_tree
    from sam2_opt_tpu.core.executor import enable_persistent_cache

    enable_persistent_cache()
    variant = os.environ.get("BENCH_VARIANT", "hiera_l")
    cfg = model_config(variant)
    print(f"[bench] building {variant} ...", file=sys.stderr)
    params = _cast_tree(
        init_params(cfg, jax.random.PRNGKey(0)), jnp.bfloat16
    )

    @partial(jax.jit, static_argnames=("k",))
    def encode_k(p, img, k):
        def body(i, carry):
            x = img + (carry * 1e-6).astype(img.dtype)
            out = base.forward_image(p, cfg, base.image_normalize(x))
            return jnp.mean(out["backbone_fpn"][2].astype(jnp.float32))

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    s = cfg.image_size
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, s, s, 3), np.float32), jnp.bfloat16)

    k_lo, k_hi = 2, 18
    t0 = time.time()
    float(encode_k(params, img, k_lo))
    float(encode_k(params, img, k_hi))
    print(f"[bench] compile+first runs: {time.time()-t0:.1f}s", file=sys.stderr)

    def timed(k, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(encode_k(params, img, k))
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    t_lo = timed(k_lo)
    t_hi = timed(k_hi)
    per_image = max((t_hi - t_lo) / (k_hi - k_lo), 1e-6)
    fps = 1.0 / per_image
    print(
        f"[bench] image encode {variant}: {per_image*1000:.2f} ms/img "
        f"({fps:.2f} FPS); call overhead ~{(t_lo - k_lo*per_image)*1000:.1f} ms",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": f"image_encode_{variant}_1024px_fps",
        "value": round(fps, 3),
        "unit": "images/s/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
