"""Decompose the production train step (hiera-b+ @1024^2 T=8 MOSE recipe)
to find where the 1.92 s/step goes and price each remat layout.

Round-4 accounting put the step at ~15% MFU with `remat="blocks"` (outer
encoder checkpoint + per-block checkpoint + per-frame checkpoint). The
nesting matters: `jax.checkpoint(encode)` AROUND a trunk whose blocks are
individually checkpointed makes the backward recompute every block TWICE
(once for the outer remat, once per-block) — 5x forward-FLOPs on the trunk
vs 4x for single-level remat and 3x for no remat. These modes measure each
layout on the real chip with the in-graph differencing methodology
(bench.py): OOM is reported as a result, not a crash.

    python tools/bench_train_mfu.py fwd_encode fwd_loss grad_base \
        grad_noouter grad_outer_only opt

Reference counterpart: the AMP/DDP step semantics the recipe trains under
(sam2/training/trainer.py:703-860).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sam2_opt_tpu.config import model_config
from sam2_opt_tpu.core.executor import enable_persistent_cache
from sam2_opt_tpu.models.init import init_params
from sam2_opt_tpu.models.model import _cast_tree
from sam2_opt_tpu.models import sam2_base as base
from sam2_opt_tpu.training import sam2_train
from sam2_opt_tpu.training.optimizer import build_optimizer

VARIANT = os.environ.get("MFU_VARIANT", "hiera_b+")
T = int(os.environ.get("MFU_FRAMES", "8"))
NOBJ = 3
DT = jnp.bfloat16


def _timed(fn, k):
    t0 = time.time()
    float(fn(k))
    return time.time() - t0


def diff_rate(fn, k_lo, k_hi, label, retries=2):
    # the axon relay's remote_compile flakes transiently ("response body
    # closed before all bytes were read"); retry the compile+first call
    for attempt in range(retries + 1):
        try:
            t0 = time.time()
            float(fn(k_lo))
            float(fn(k_hi))
            print(f"[mfu] {label} compile+first: {time.time()-t0:.1f}s",
                  flush=True)
            break
        except Exception as e:
            if attempt == retries or "remote_compile" not in repr(e):
                raise
            print(f"[mfu] {label} compile flaked (attempt {attempt+1}), "
                  f"retrying: {repr(e)[:120]}", flush=True)
            time.sleep(10)
    t_lo, t_hi = _timed(fn, k_lo), _timed(fn, k_hi)
    per = max((t_hi - t_lo) / (k_hi - k_lo), 1e-6)
    print(f"[mfu] {label}: {per*1000:.1f} ms/iter", flush=True)
    return per


def main():
    modes = sys.argv[1:] or ["fwd_encode", "fwd_loss", "grad_base",
                             "grad_noouter", "grad_outer_only", "opt"]
    enable_persistent_cache()
    cfg0 = model_config(VARIANT)
    S = cfg0.image_size
    rng = np.random.default_rng(0)
    params = init_params(cfg0, jax.random.PRNGKey(1))
    imgs = jnp.asarray(rng.random((T, S, S, 3), np.float32))
    gt_np = np.zeros((T, NOBJ, S, S), bool)
    for o in range(NOBJ):
        gt_np[:, o, 100 * o + 50: 100 * o + 350, 200:600] = True
    gt = jnp.asarray(gt_np)

    def loss_for(cfg, use_remat, remat_frames):
        def loss_fn(p, im, g, key):
            p = _cast_tree(p, DT)
            im = im.astype(DT)
            loss, _ = sam2_train.video_train_loss(
                p, cfg, im, g, key, num_correction_clicks=2,
                use_remat=use_remat, remat_frames=remat_frames,
            )
            return loss
        return loss_fn

    def k_loop(body):
        # the carry feeds back into the IMAGES (x 1e-30, numerically inert)
        # so no part of the computation is loop-invariant: without this, XLA
        # hoists every key-independent chunk (the whole encoder forward and
        # its remat recomputes) out of the fori_loop and the differencing
        # under-measures (fwd_encode measured 0.0 ms/iter before this fix)
        @partial(jax.jit, static_argnames=("k",))
        def run(p, im, g, k):
            def step(i, acc):
                key = jax.random.fold_in(jax.random.PRNGKey(2), i)
                im_i = im + (acc * 1e-30).astype(im.dtype)
                return acc + body(p, im_i, g, key)
            return jax.lax.fori_loop(0, k, step, jnp.float32(0.0))
        return lambda k: run(params, imgs, gt, k)

    def grad_body(loss_fn):
        def body(p, im, g, key):
            _, grads = jax.value_and_grad(loss_fn)(p, im, g, key)
            # consume EVERY gradient leaf: reducing a single leaf lets XLA
            # dead-code-eliminate most of the backward (measured: the
            # single-leaf version under-reported grad_base by ~45%)
            return sum(
                jnp.sum(x.astype(jnp.float32))
                for x in jax.tree_util.tree_leaves(grads)
            )
        return body

    results = {}
    for mode in modes:
        try:
            if mode == "fwd_encode":
                # batched backbone forward alone (bf16, the rollout's encode)
                def enc(p, im, g, key):
                    p = _cast_tree(p, DT)
                    out = base.forward_image(
                        p, cfg0, base.image_normalize(im.astype(DT)))
                    return jnp.mean(out["backbone_fpn"][2].astype(jnp.float32))
                results[mode] = diff_rate(k_loop(enc), 2, 6, mode)
            elif mode == "fwd_loss":
                loss_fn = loss_for(cfg0, use_remat=False, remat_frames=False)
                results[mode] = diff_rate(
                    k_loop(lambda p, im, g, key: loss_fn(p, im, g, key)),
                    2, 6, mode)
            elif mode == "grad_base":
                # round-4 production layout: outer + blocks + frames
                cfg = dataclasses.replace(cfg0, trunk=dataclasses.replace(
                    cfg0.trunk, remat_blocks=True))
                body = grad_body(loss_for(cfg, True, True))
                results[mode] = diff_rate(k_loop(body), 1, 3, mode)
            elif mode == "grad_noouter":
                # drop the outer encoder checkpoint; per-block checkpoints
                # already bound trunk memory to block-boundary activations
                cfg = dataclasses.replace(cfg0, trunk=dataclasses.replace(
                    cfg0.trunk, remat_blocks=True))
                body = grad_body(loss_for(cfg, False, True))
                results[mode] = diff_rate(k_loop(body), 1, 3, mode)
            elif mode == "grad_outer_only":
                # no per-block checkpoints (outer + frames only)
                body = grad_body(loss_for(cfg0, True, True))
                results[mode] = diff_rate(k_loop(body), 1, 3, mode)
            elif mode == "grad_noframes":
                cfg = dataclasses.replace(cfg0, trunk=dataclasses.replace(
                    cfg0.trunk, remat_blocks=True))
                body = grad_body(loss_for(cfg, False, False))
                results[mode] = diff_rate(k_loop(body), 1, 3, mode)
            elif mode in ("grad_encode", "grad_encode_noremat",
                          "grad_encode_noouter"):
                # encoder-only fwd+bwd: separates trunk backward cost from
                # the rollout (memory attention / SAM heads / mem encoder)
                # backward. "noremat" = no checkpoints anywhere; "noouter" =
                # per-block checkpoints without the outer encoder one.
                remat_blocks = mode != "grad_encode_noremat"
                outer = mode == "grad_encode"
                cfg = dataclasses.replace(cfg0, trunk=dataclasses.replace(
                    cfg0.trunk, remat_blocks=remat_blocks))

                def enc_loss(p, im, g, key):
                    p = _cast_tree(p, DT)

                    def enc(imm):
                        out = base.forward_image(
                            p, cfg, base.image_normalize(imm.astype(DT)))
                        return sum(
                            jnp.sum(f.astype(jnp.float32) ** 2)
                            for f in out["backbone_fpn"]
                        )
                    f = jax.checkpoint(enc) if outer else enc
                    return f(im)

                body = grad_body(enc_loss)
                results[mode] = diff_rate(k_loop(body), 1, 3, mode)
            elif mode == "opt":
                optimizer = build_optimizer(params,
                                            trunk_depth=cfg0.trunk.depth)
                opt_state = optimizer.init(params)
                import optax

                @partial(jax.jit, static_argnames=("k",))
                def run(p, s, k):
                    def step(i, carry):
                        p, s = carry
                        # grads derive from the evolving params so the
                        # update chain cannot be hoisted out of the loop
                        grads = jax.tree_util.tree_map(
                            lambda x: x * 1e-8 + 1e-6, p)
                        updates, s = optimizer.update(
                            grads, s, p, jnp.float32(3e-6))
                        return optax.apply_updates(p, updates), s
                    p, s = jax.lax.fori_loop(0, k, step, (p, s))
                    return jnp.mean(p["no_obj_ptr"].astype(jnp.float32))
                results[mode] = diff_rate(
                    lambda k: run(params, opt_state, k), 2, 8, mode)
            else:
                print(f"[mfu] unknown mode {mode}", flush=True)
        except Exception as e:
            msg = repr(e)[:300]
            print(f"[mfu] {mode} FAILED: {msg}", flush=True)
            results[mode] = f"failed: {msg}"

    print("[mfu] summary:", flush=True)
    for k, v in results.items():
        if isinstance(v, float):
            print(f"  {k}: {v*1000:.1f} ms", flush=True)
        else:
            print(f"  {k}: {v}", flush=True)


if __name__ == "__main__":
    main()
