"""Multi-object per-frame tracking scaling sweep: shared encode +
object-batched step at 1/2/4/8/16 objects (the reference loops objects at
batch 1 — 44 ms/object on its TRT-A100 baseline). Also the VMEM-safety
check at 16 objects (known hazard: batched operands around the flash
kernel, doc/benchmark.md multi-object note).

`make_step_for` is the single definition of the multi-object benchmark
graph — bench.py imports it for its 8-object driver metric so the two
cannot drift."""
import sys, time, json, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from functools import partial
from sam2_opt_tpu.models import sam2_base as base
from sam2_opt_tpu.models import video_core as vc


def make_step_for(cfg, B, *, multimask_output=True):
    """Jitted k-frame rollout: ONE shared frame encode + the object-batched
    conditioned track step at batch B, steady-state memory bank rolling in
    the fori carry. Returns f(params, img, k) -> scalar."""
    S, P = cfg.num_maskmem, cfg.max_obj_ptrs_in_encoder
    g, D, C = cfg.image_embedding_size, cfg.mem_dim, cfg.hidden_dim
    tpos_idx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    valid = jnp.ones((B, S), bool)
    ptr_pos = jnp.broadcast_to(
        (jnp.arange(P, dtype=jnp.float32) / max(P - 1, 1))[None], (B, P)
    )
    ptr_valid = jnp.ones((B, P), bool)

    @partial(jax.jit, static_argnames=("k",))
    def video_k(p, x, k):
        def body(i, carry):
            mem_feats, ptrs, acc = carry
            y = x + (acc * 1e-6).astype(x.dtype)
            out = base.forward_image(p, cfg, base.image_normalize(y))
            f0, f1, f2 = out["backbone_fpn"]
            if B > 1:
                f0 = jnp.repeat(f0, B, axis=0)
                f1 = jnp.repeat(f1, B, axis=0)
                f2 = jnp.repeat(f2, B, axis=0)
            mem = vc.MemoryInput(
                feats=tuple(mem_feats[j] for j in range(S)),
                tpos_idx=tpos_idx, valid=valid,
                ptrs=tuple(ptrs[j] for j in range(P)),
                ptr_pos=ptr_pos, ptr_valid=ptr_valid,
            )
            o = vc.track_step_conditioned(
                p, cfg, (f0, f1, f2), mem,
                multimask_output=multimask_output, run_mem_encoder=True,
            )
            nm = jnp.concatenate(
                [o["maskmem_features"][None], mem_feats[:-1]], axis=0
            )
            npp = jnp.concatenate([o["obj_ptr"][None], ptrs[:-1]], axis=0)
            return nm, npp, jnp.mean(o["pred_masks"].astype(jnp.float32))

        m0 = jnp.zeros((S, B, g, g, D), jnp.bfloat16)
        p0 = jnp.zeros((P, B, C), jnp.float32)
        return jax.lax.fori_loop(0, k, body, (m0, p0, jnp.float32(0.0)))[2]

    return video_k


def _rate(fn, k_lo=2, k_hi=8):
    float(fn(k_lo)); float(fn(k_hi))
    def timed(k, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.time(); float(fn(k)); ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]
    return max((timed(k_hi) - timed(k_lo)) / (k_hi - k_lo), 1e-6) * 1000


def main():
    import numpy as np
    from sam2_opt_tpu.config import model_config
    from sam2_opt_tpu.models.init import init_params
    from sam2_opt_tpu.models.model import _cast_tree
    from sam2_opt_tpu.core.executor import enable_persistent_cache

    enable_persistent_cache()
    variant = os.environ.get("BENCH_VARIANT", "hiera_l")
    cfg = model_config(variant)
    params = _cast_tree(init_params(cfg, jax.random.PRNGKey(0)), jnp.bfloat16)
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.random((1, cfg.image_size, cfg.image_size, 3), np.float32),
        jnp.bfloat16,
    )

    for B in (1, 2, 4, 8, 16):
        try:
            fn = make_step_for(cfg, B)
            ms = _rate(lambda k: fn(params, img, k))
            print(json.dumps({
                "label": f"video_{B}obj_per_frame", "objects": B,
                "ms": round(ms, 2), "ms_per_obj": round(ms / B, 2),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "label": f"video_{B}obj_per_frame", "objects": B,
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }), flush=True)


if __name__ == "__main__":
    main()
