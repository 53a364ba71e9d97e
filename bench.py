"""Headline benchmarks on one chip: hiera-L 1024² image encode + per-frame
video propagation.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"} per metric:
  - image_encode_hiera_l_1024px_fps     (baseline: TRT-fp16 A100 0.030 s/img,
    BASELINE.md / reference doc/benchmark.md:12 -> 33.33 FPS)
  - video_propagation_hiera_l_fps       (baseline: TRT-fp16 A100 0.044 s/frame,
    reference doc/benchmark.md:46 -> 22.73 FPS; single object, full step =
    image encode + 7-slot memory-conditioned track step + memory encode,
    matching the reference per-frame `propagate_in_video` step)

Methodology: on remote-attached TPUs, `block_until_ready` does not reflect
device completion and every host call pays a ~25 ms relay round trip. We
therefore run K data-dependent iterations inside ONE compiled loop, force
completion with a scalar fetch, and difference K=K_hi vs K=K_lo to cancel the
fixed per-call overhead — yielding pure per-iteration device latency.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_IMAGE_FPS = 1.0 / 0.030  # TRT-fp16 hiera-L image encode, A100
BASELINE_VIDEO_FPS = 1.0 / 0.044  # TRT-fp16 hiera-L per-frame propagation, A100


def _timed(fn, k, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(fn(k))
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


_LAST_COMPILE_S = 0.0  # compile+first-run wall of the most recent _diff_rate


def _diff_rate(fn, k_lo, k_hi, label):
    global _LAST_COMPILE_S
    t0 = time.time()
    float(fn(k_lo))
    float(fn(k_hi))
    _LAST_COMPILE_S = round(time.time() - t0, 1)
    print(f"[bench] {label} compile+first runs: {_LAST_COMPILE_S:.1f}s",
          file=sys.stderr)
    t_lo = _timed(fn, k_lo)
    t_hi = _timed(fn, k_hi)
    per_iter = max((t_hi - t_lo) / (k_hi - k_lo), 1e-6)
    print(
        f"[bench] {label}: {per_iter*1000:.2f} ms/iter "
        f"({1.0/per_iter:.2f} FPS); call overhead ~{(t_lo - k_lo*per_iter)*1000:.1f} ms",
        file=sys.stderr,
    )
    return per_iter


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from sam2_opt_tpu.config import model_config
    from sam2_opt_tpu.models import sam2_base as base
    from sam2_opt_tpu.models import video_core as vc
    from sam2_opt_tpu.models.init import init_params
    from sam2_opt_tpu.models.model import _cast_tree
    from sam2_opt_tpu.core.executor import enable_persistent_cache

    enable_persistent_cache()
    variant = os.environ.get("BENCH_VARIANT", "hiera_l")
    cfg = model_config(variant)
    print(f"[bench] building {variant} ...", file=sys.stderr)
    params = _cast_tree(init_params(cfg, jax.random.PRNGKey(0)), jnp.bfloat16)

    s = cfg.image_size
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, s, s, 3), np.float32), jnp.bfloat16)

    # ------------------------------------------------------------------ #
    # 1. image encode (SAM2ImagePredictor.set_image path)
    # ------------------------------------------------------------------ #
    @partial(jax.jit, static_argnames=("k",))
    def encode_k(p, x, k):
        def body(i, carry):
            y = x + (carry * 1e-6).astype(x.dtype)
            out = base.forward_image(p, cfg, base.image_normalize(y))
            return jnp.mean(out["backbone_fpn"][2].astype(jnp.float32))

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    def emit(metric, per_iter, unit, baseline_fps):
        # print each metric as soon as it is measured so a late failure
        # (e.g. a relay flake during the optional int8 section) cannot
        # lose the already-measured headline numbers. compile_s = the
        # compile+first-run wall of this metric's _diff_rate — with the
        # persistent compilation cache warm (enable_persistent_cache), a
        # second process re-compiles in seconds (tools/bench_cold_start.py)
        line = {
            "metric": metric,
            "value": round(1.0 / per_iter, 3),
            "unit": unit,
            "vs_baseline": round(1.0 / per_iter / baseline_fps, 3),
            "compile_s": _LAST_COMPILE_S,
        }
        print(json.dumps(line), flush=True)

    per_image = _diff_rate(lambda k: encode_k(params, img, k), 2, 18,
                           f"image encode {variant}")
    emit(f"image_encode_{variant}_1024px_fps", per_image,
         "images/s/chip", BASELINE_IMAGE_FPS)

    # ------------------------------------------------------------------ #
    # 2. per-frame video propagation, single object (the reference "Video"
    #    row): full step = encode 1024² + memory-conditioned track step with
    #    a FULL memory (7 spatial slots + 16 obj ptrs, the steady-state cost)
    #    + memory encode, with the new memory/pointer fed back into the bank
    #    so iterations are data-dependent.
    # ------------------------------------------------------------------ #
    S = cfg.num_maskmem
    P = cfg.max_obj_ptrs_in_encoder
    g = cfg.image_embedding_size
    D = cfg.mem_dim
    C = cfg.hidden_dim
    multimask = bool(
        cfg.multimask_output_in_sam
        and cfg.multimask_output_for_tracking
        and cfg.multimask_min_pt_num <= 0 <= cfg.multimask_max_pt_num
    )

    tpos_idx = jnp.arange(S, dtype=jnp.int32)[None]            # [1,S]
    valid = jnp.ones((1, S), bool)
    ptr_pos = (jnp.arange(P, dtype=jnp.float32) / max(P - 1, 1))[None]
    ptr_valid = jnp.ones((1, P), bool)

    @partial(jax.jit, static_argnames=("k",))
    def video_step_k(p, x, k):
        def body(i, carry):
            mem_feats, ptrs, acc = carry
            y = x + (acc * 1e-6).astype(x.dtype)
            out = base.forward_image(p, cfg, base.image_normalize(y))
            hrf0, hrf1, embed = out["backbone_fpn"]
            mem = vc.MemoryInput(
                feats=tuple(mem_feats[j] for j in range(S)),
                tpos_idx=tpos_idx,
                valid=valid,
                ptrs=tuple(ptrs[j] for j in range(P)),
                ptr_pos=ptr_pos,
                ptr_valid=ptr_valid,
            )
            o = vc.track_step_conditioned(
                p, cfg, (hrf0, hrf1, embed), mem,
                multimask_output=multimask, run_mem_encoder=True,
            )
            new_mem = jnp.concatenate(
                [o["maskmem_features"][None], mem_feats[:-1]], axis=0
            )
            new_ptrs = jnp.concatenate(
                [o["obj_ptr"][None], ptrs[:-1]], axis=0
            )
            return new_mem, new_ptrs, jnp.mean(
                o["pred_masks"].astype(jnp.float32)
            )

        mem0 = jnp.zeros((S, 1, g, g, D), jnp.bfloat16)
        ptrs0 = jnp.zeros((P, 1, C), jnp.float32)
        _, _, acc = jax.lax.fori_loop(
            0, k, body, (mem0, ptrs0, jnp.float32(0.0))
        )
        return acc

    per_frame = _diff_rate(lambda k: video_step_k(params, img, k), 2, 12,
                           f"video propagation {variant}")
    emit(f"video_propagation_{variant}_fps", per_frame,
         "frames/s/chip", BASELINE_VIDEO_FPS)

    # ------------------------------------------------------------------ #
    # 2b. 8-object tracking (BASELINE config #4, beyond-reference story:
    #     the reference loops objects at batch 1 — 8 x 44 ms on TRT-A100).
    #     Shared frame encode + object-batched track step. BENCH_MULTI_OBJ=0
    #     skips; the full 1/2/4/8/16 sweep is tools/bench_multi_object.py.
    # ------------------------------------------------------------------ #
    if os.environ.get("BENCH_MULTI_OBJ", "1") != "0":
        B8 = 8
        metric8 = f"video_propagation_8obj_{variant}_obj_fps"
        try:
            # single definition of the multi-object benchmark graph lives in
            # the sweep tool; import it so the two cannot drift
            sys.path.insert(
                0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tools"))
            from bench_multi_object import make_step_for

            video8_k = make_step_for(cfg, B8, multimask_output=multimask)
            per_frame8 = _diff_rate(lambda k: video8_k(params, img, k), 2, 8,
                                    f"8-object video propagation {variant}")
            # per-OBJECT rate vs the reference's per-object loop baseline
            emit(metric8, per_frame8 / B8, "objects/s/chip",
                 BASELINE_VIDEO_FPS)
        except Exception as e:
            print(f"[bench] multi-object section failed, skipping: {e!r}",
                  file=sys.stderr)
            print(json.dumps({"metric": metric8, "value": None,
                              "error": repr(e)[:300]}), flush=True)

    # ------------------------------------------------------------------ #
    # 2c. production-shape training step (the reference MOSE recipe shape:
    #     hiera-b+ @1024², 8-frame interactive rollout with 2 correction
    #     clicks — sam2/training/README.md:68). Full fwd+bwd+AdamW/LLRD
    #     update with per-block remat, measured with the same in-graph
    #     differencing. BENCH_TRAIN=0 skips. No reference per-step baseline
    #     exists (it publishes only the final J&F), so vs_baseline is null.
    # ------------------------------------------------------------------ #
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        tvariant = os.environ.get("BENCH_TRAIN_VARIANT", "hiera_b+")
        t_frames = int(os.environ.get("BENCH_TRAIN_FRAMES", "8"))
        # bf16 mixed-precision compute by default — the reference MOSE
        # recipe trains under `amp: bfloat16` (fp32 master weights, loss
        # math and optimizer; see TrainConfig.compute_dtype)
        t_dtype = os.environ.get("BENCH_TRAIN_DTYPE", "bfloat16")
        _ts = model_config(tvariant).image_size
        metric_t = (f"train_step_{tvariant}_{_ts}px_T{t_frames}"
                    f"_{'bf16' if t_dtype == 'bfloat16' else t_dtype}_sps")
        try:
            import dataclasses

            import optax

            from sam2_opt_tpu.models.model import _cast_tree as _ct
            from sam2_opt_tpu.training import sam2_train
            from sam2_opt_tpu.training.optimizer import build_optimizer

            tcfg_m = model_config(tvariant)
            tcfg_m = dataclasses.replace(
                tcfg_m,
                trunk=dataclasses.replace(tcfg_m.trunk, remat_blocks=True),
            )
            st = tcfg_m.image_size
            nobj = 3  # MOSE recipe max_num_objects
            params_t = init_params(tcfg_m, jax.random.PRNGKey(1))
            optimizer = build_optimizer(params_t,
                                        trunk_depth=tcfg_m.trunk.depth)
            opt_state0 = optimizer.init(params_t)
            imgs_t = jnp.asarray(
                rng.random((t_frames, st, st, 3), np.float32))
            gt_np = np.zeros((t_frames, nobj, st, st), bool)
            for o_i in range(nobj):
                gt_np[:, o_i, 100 * o_i + 50: 100 * o_i + 350,
                      200: 600] = True
            gt_t = jnp.asarray(gt_np)
            lr = jnp.float32(3e-6)

            def loss_fn(p, im, gt, key):
                if t_dtype != "float32":
                    p = _ct(p, jnp.dtype(t_dtype))
                    im = im.astype(jnp.dtype(t_dtype))
                # use_remat=False: no outer encoder checkpoint on top of the
                # per-block ones (remat_blocks above); remat_frames=False:
                # the Pallas flash backward removed the fp32 logit temps
                # that used to force per-frame checkpointing at this shape
                # (TrainConfig.remat="blocks" semantics; "blocks_frames"
                # restores it for tighter-memory shapes)
                loss, _ = sam2_train.video_train_loss(
                    p, tcfg_m, im, gt, key,
                    num_correction_clicks=2, use_remat=False,
                    remat_frames=False,
                )
                return loss

            # images/gt are ARGUMENTS, not closure constants: a baked-in
            # [T,1024,1024,3] literal gets a T(4,128) padded layout (3->128
            # channels, 21x expansion = 2 GB of the 15.75 GB chip; measured
            # OOM) while an argument keeps the dense default layout
            @partial(jax.jit, static_argnames=("k",), donate_argnums=())
            def train_k(p, opt_state, im, gt, k):
                def body(i, carry):
                    p, s = carry
                    key = jax.random.fold_in(jax.random.PRNGKey(2), i)
                    _, grads = jax.value_and_grad(loss_fn)(p, im, gt, key)
                    updates, s = optimizer.update(grads, s, p, lr)
                    return optax.apply_updates(p, updates), s

                p, _ = jax.lax.fori_loop(0, k, body, (p, opt_state))
                return jnp.mean(p["no_obj_ptr"].astype(jnp.float32))

            per_step = _diff_rate(
                lambda k: train_k(params_t, opt_state0, imgs_t, gt_t, k), 1, 3,
                f"train step {tvariant} @{st} T={t_frames}")
            line = {
                "metric": metric_t,
                "value": round(1.0 / per_step, 4),
                "unit": "steps/s/chip",
                "vs_baseline": None,
                "seconds_per_step": round(per_step, 3),
                "compile_s": _LAST_COMPILE_S,
            }
            print(json.dumps(line), flush=True)
            del params_t, opt_state0
        except Exception as e:
            print(f"[bench] train section failed, skipping: {e!r}",
                  file=sys.stderr)
            print(json.dumps({"metric": metric_t, "value": None,
                              "error": repr(e)[:300]}), flush=True)

    # ------------------------------------------------------------------ #
    # 3. int8 act-quant encoder (BASELINE config #5) — the counterpart of
    #    the reference's quantized TRT rows (doc/benchmark.md:25,37), with
    #    accuracy gated by tests/test_quant.py. On by default (BENCH_INT8=0
    #    skips); bf16 stays the accuracy-neutral predictor default.
    # ------------------------------------------------------------------ #
    if os.environ.get("BENCH_INT8", "1") != "0":
        int8_metrics = [
            f"image_encode_int8_{variant}_1024px_fps",
            f"video_propagation_int8_tracking_{variant}_fps",
            f"video_propagation_int8_{variant}_fps",
        ]
        emitted = set()
        try:
            from sam2_opt_tpu.quant.calibrate import (
                collect_activation_scales,
                collect_tracking_activation_scales,
            )
            from sam2_opt_tpu.quant.int8 import (
                TRACKING_QUANT_PATTERN,
                quantize_params,
            )

            params_f32 = init_params(cfg, jax.random.PRNGKey(0))
            scales = collect_activation_scales(
                params_f32, cfg, [np.asarray(img, np.float32)],
                percentile=100.0,
            )
            qparams = quantize_params(
                _cast_tree(params_f32, jnp.bfloat16), act_scales=scales
            )
            per_q = _diff_rate(lambda k: encode_k(qparams, img, k), 2, 18,
                               f"int8 image encode {variant}")
            emit(f"image_encode_int8_{variant}_1024px_fps", per_q,
                 "images/s/chip", BASELINE_IMAGE_FPS)
            emitted.add(int8_metrics[0])

            # tracking-scope int8 (beyond the reference's encoder-only int8):
            # memory-attention + SAM-transformer linears quantized too
            # (quant_scope="tracking"). MEASURED NEGATIVE on v5e — default
            # OFF (BENCH_INT8_TRACKING=1 re-measures): 37.0 ms/frame vs
            # 22.7 ms encoder-only int8 — the per-projection activation
            # quantize/dequantize passes on the 4096-token memattn
            # activations cost more than the (small, already fast) linears
            # save; the big attention matmuls stay bf16 either way. See
            # doc/benchmark.md int8 notes.
            if os.environ.get("BENCH_INT8_TRACKING", "0") != "0":
                try:
                    tscales = collect_tracking_activation_scales(
                        params_f32, cfg, [np.asarray(img, np.float32)],
                        pattern=TRACKING_QUANT_PATTERN, percentile=100.0,
                    )
                    tqparams = quantize_params(
                        _cast_tree(params_f32, jnp.bfloat16),
                        TRACKING_QUANT_PATTERN, tscales,
                    )
                    per_tqv = _diff_rate(
                        lambda k: video_step_k(tqparams, img, k), 2, 12,
                        f"int8-tracking video propagation {variant}")
                    emit(f"video_propagation_int8_tracking_{variant}_fps",
                         per_tqv, "frames/s/chip", BASELINE_VIDEO_FPS)
                    del tqparams
                except Exception as e:
                    print(f"[bench] int8-tracking section failed, "
                          f"skipping: {e!r}", file=sys.stderr)
                    print(json.dumps({"metric": int8_metrics[1],
                                      "value": None, "error": repr(e)[:300]}),
                          flush=True)
            emitted.add(int8_metrics[1])

            # int8-encoder video propagation (speedup("int8") on the video
            # predictor): tracking/memory stays bf16, like the reference's
            # encoder-only TRT int8 engines
            per_qv = _diff_rate(lambda k: video_step_k(qparams, img, k), 2, 12,
                                f"int8 video propagation {variant}")
            emit(f"video_propagation_int8_{variant}_fps", per_qv,
                 "frames/s/chip", BASELINE_VIDEO_FPS)
            emitted.add(int8_metrics[2])
        except Exception as e:  # headline bf16 metrics are already printed
            print(f"[bench] int8 section failed, skipping: {e!r}",
                  file=sys.stderr)
            # A positional consumer reads the LAST JSON line as the headline
            # (int8 video in the success case). Emit machine-readable error
            # records for the metrics that were not produced so a failure
            # here can never be mistaken for a (10% different) bf16 number.
            for m in int8_metrics:
                if m not in emitted:
                    print(json.dumps(
                        {"metric": m, "value": None, "error": repr(e)[:300]}
                    ), flush=True)


if __name__ == "__main__":
    main()
