"""Prove the persistent-compilation-cache cold-start story (VERDICT r4 #4).

The reference's TRT path caches built engines on disk so a second process
loads them instead of re-building (`use_cache=True`,
sam2/sam2/sam2_image_predictor.py:94-138). The XLA analogue is the
persistent compilation cache (core/executor.enable_persistent_cache). This
tool measures the SAME hiera-L encode compile in two fresh processes
sharing one cache dir:

  process 1 (cold dir): full XLA compile, minutes over the axon relay;
  process 2 (warm dir): must load the cached executable in far under 60 s.

    python tools/bench_cold_start.py [cache_dir]

Writes COLDSTART_r05.json at the repo root when run from the repo.
"""

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
from sam2_opt_tpu.core.executor import enable_persistent_cache
enable_persistent_cache(%(cache)r)
import jax, jax.numpy as jnp
from sam2_opt_tpu.config import model_config
from sam2_opt_tpu.models import sam2_base as base
from sam2_opt_tpu.models.init import init_params

cfg = model_config("hiera_l")
t_init = time.time()
params = init_params(cfg, jax.random.PRNGKey(0))
params = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16)
    if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

@jax.jit
def encode(p, img):
    out = base.forward_image(p, cfg, base.image_normalize(img))
    return out["backbone_fpn"][2].astype(jnp.float32).mean()

img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.bfloat16)
t0 = time.time()
float(encode(params, img))
print("COMPILE_FIRST_S", round(time.time() - t0, 1),
      "INIT_S", round(t0 - t_init, 1), flush=True)
"""


def run_once(cache_dir: str, tag: str) -> float:
    script = CHILD % {"repo": REPO, "cache": cache_dir}
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=1200)
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("COMPILE_FIRST_S")]
    if not line:
        raise RuntimeError(
            f"{tag}: no result line\n{out.stdout[-500:]}\n{out.stderr[-1500:]}"
        )
    secs = float(line[0].split()[1])
    print(f"[cold_start] {tag}: compile+first {secs:.1f}s", flush=True)
    return secs


def main():
    cache_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="coldstart_cache_")
    cold = run_once(cache_dir, "process 1 (cold cache)")
    warm = run_once(cache_dir, "process 2 (warm cache)")
    rec = {
        "workload": "hiera_l 1024px bf16 image encode, axon TPU relay",
        "cold_compile_first_s": cold,
        "warm_compile_first_s": warm,
        "speedup": round(cold / max(warm, 1e-9), 1),
        "cache_dir_entries": len(os.listdir(cache_dir)),
    }
    print(json.dumps(rec))
    out_path = os.path.join(REPO, "COLDSTART_r05.json")
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"[cold_start] wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
