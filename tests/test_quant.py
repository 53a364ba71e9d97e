"""Int8 quantization tests: weight roundtrip accuracy, tree rewrite, and the
quantized encoder forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam2_opt_tpu.config import model_config
from sam2_opt_tpu.models.init import init_params
from sam2_opt_tpu.ops.common import linear
from sam2_opt_tpu.quant.int8 import (
    is_quantized,
    quantize_params,
    quantize_weight,
    quantized_linear,
)


def test_weight_quant_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 128)).astype(np.float32)
    q, scale = quantize_weight(w)
    deq = q.astype(np.float32) * scale
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01  # 7-bit resolution


def test_quantized_linear_weight_only():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((32, 64)).astype(np.float32)
    b = rng.standard_normal(64).astype(np.float32)
    x = rng.standard_normal((4, 32)).astype(np.float32)
    q, s = quantize_weight(w)
    p = {"w_int8": jnp.asarray(q), "w_scale": jnp.asarray(s),
         "bias": jnp.asarray(b)}
    y_q = np.asarray(quantized_linear(p, jnp.asarray(x)))
    y_f = x @ w + b
    rel = np.abs(y_q - y_f).max() / np.abs(y_f).max()
    assert rel < 0.03, rel


def test_quantized_linear_int8_activations():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((32, 64)).astype(np.float32)
    x = rng.standard_normal((4, 32)).astype(np.float32)
    q, s = quantize_weight(w)
    p = {
        "w_int8": jnp.asarray(q),
        "w_scale": jnp.asarray(s),
        "act_scale": jnp.asarray(np.abs(x).max() / 127.0, jnp.float32),
    }
    y_q = np.asarray(quantized_linear(p, jnp.asarray(x)))
    y_f = x @ w
    rel = np.abs(y_q - y_f).max() / np.abs(y_f).max()
    assert rel < 0.05


def test_quantize_params_tree_and_forward(tiny128_cfg, tiny128_params):
    cfg = tiny128_cfg
    params = tiny128_params
    qparams = quantize_params(params)
    # trunk qkv quantized; decoder untouched
    blk = qparams["image_encoder"]["trunk"]["blocks"][0]["attn"]["qkv"]
    assert is_quantized(blk)
    assert not is_quantized(
        qparams["sam_mask_decoder"]["transformer"]["layers"][0]["self_attn"]["q_proj"]
    )

    # forward parity within int8 tolerance
    from sam2_opt_tpu.models import sam2_base as base

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((1, 128, 128, 3)), jnp.float32)
    out_f = base.forward_image(params, cfg, base.image_normalize(img))
    out_q = base.forward_image(qparams, cfg, base.image_normalize(img))
    a = np.asarray(out_f["backbone_fpn"][2])
    b = np.asarray(out_q["backbone_fpn"][2])
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.15, rel  # int8 weight noise through 12 blocks


def test_speedup_int8_one_liner(tmp_path, tiny128_cfg, tiny128_params):
    """VERDICT r2 #7: `predictor.speedup("int8", calib_dir=...)` is the
    one-line activation of the int8 act-quant path (mirroring the reference's
    `speedup("trt", model_root_path=...)`, benchmark.py:172-174) and passes
    the same mask-accuracy gate as the manual quantization path."""
    from PIL import Image

    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.image import SAM2ImagePredictor
    from sam2_opt_tpu.quant.int8 import is_quantized

    rng = np.random.default_rng(5)
    img = (rng.random((128, 128, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "calib0.jpg")

    model = SAM2Model(tiny128_params, tiny128_cfg)
    pred = SAM2ImagePredictor(model)
    pt = dict(point_coords=np.array([[40.0, 60.0]], np.float32),
              point_labels=np.array([1], np.int32))
    pred.set_image(img)  # eager fp32 parity path
    ref_masks, _, _ = pred.predict(**pt)

    # fp32-dtype int8 isolates quantization error -> the 0.98 gate
    pred.speedup("int8", calib_dir=str(tmp_path), dtype=jnp.float32)
    qkv = model._compute_params["image_encoder"]["trunk"]["blocks"][0]["attn"]["qkv"]
    assert is_quantized(qkv) and "act_scale" in qkv, "act-quant not active"
    # master params untouched (release() restores the parity path)
    assert not is_quantized(
        model.params["image_encoder"]["trunk"]["blocks"][0]["attn"]["qkv"]
    )
    pred.set_image(img)
    q_masks, _, _ = pred.predict(**pt)

    def miou(a_set, b_set):
        ious = []
        for m in range(a_set.shape[0]):
            a, b = a_set[m] > 0, b_set[m] > 0
            u = (a | b).sum()
            ious.append(1.0 if u == 0 else (a & b).sum() / u)
        return float(np.mean(ious))

    gate = miou(np.asarray(ref_masks), np.asarray(q_masks))
    assert gate >= 0.98, f"speedup-int8 mIoU {gate:.4f}"

    # the production bf16+int8 combination also activates in one line
    pred.speedup("int8", calib_dir=str(tmp_path))
    assert model.compute_dtype == jnp.bfloat16
    pred.set_image(img)
    bq_masks, _, _ = pred.predict(**pt)
    assert miou(np.asarray(ref_masks), np.asarray(bq_masks)) >= 0.95


def test_speedup_int8_empty_calib_dir_raises(tmp_path, tiny128_cfg,
                                             tiny128_params):
    """A calibration dir with no images must raise, not silently degrade to
    weight-only int8 (the reference's entropy calibrator likewise fails on an
    empty dataset, calibrator/image_encode.py:84-107)."""
    import pytest

    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.image import SAM2ImagePredictor

    (tmp_path / "engine.bin").write_bytes(b"\x00")  # non-image content only
    pred = SAM2ImagePredictor(SAM2Model(tiny128_params, tiny128_cfg))
    with pytest.raises(ValueError, match="no calibration images"):
        pred.speedup("int8", model_root_path=str(tmp_path))


def test_video_predictor_speedup_int8(tmp_path, tiny128_cfg, tiny128_params):
    """`speedup("int8")` on the VIDEO predictor quantizes the encoder and the
    predictor still tracks (encoder-only int8, tracking stays bf16 — the
    reference's TRT int8 engines are encoder-only too)."""
    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.video import SAM2VideoPredictor
    from sam2_opt_tpu.quant.int8 import is_quantized

    model = SAM2Model(jax.tree_util.tree_map(jnp.copy, tiny128_params),
                      tiny128_cfg)
    vp = SAM2VideoPredictor(model, fill_hole_area=0)
    vp.speedup("int8")  # weight-only without calib_dir
    assert is_quantized(
        model._compute_params["image_encoder"]["trunk"]["blocks"][0]["attn"]["qkv"]
    )
    # memory attention NOT quantized (encoder-only pattern)
    assert not is_quantized(
        model._compute_params["memory_attention"]["layers"][0]["self_attn"]["q_proj"]
    )

    rng = np.random.default_rng(6)
    frames = (rng.random((3, 128, 128, 3)) * 255).astype(np.uint8)
    st = vp.init_state(frames)
    vp.add_new_points_or_box(
        st, 0, 1, points=np.array([[40.0, 60.0]], np.float32),
        labels=np.array([1], np.int32),
    )
    outs = {f: np.asarray(m) for f, _, m in vp.propagate_in_video(st)}
    assert set(outs) == {0, 1, 2}
    assert all(np.isfinite(m).all() for m in outs.values())


def test_video_predictor_speedup_int8_tracking_scope(tmp_path, tiny128_cfg,
                                                     tiny128_params):
    """quant_scope="tracking" (beyond the reference's encoder-only int8,
    quant_image_encoder.py:8-75): memory-attention and SAM-transformer
    linears are act-quantized too — calibration drives the full track step —
    and per-frame tracking masks stay within the mIoU gate of the fp32
    parity path."""
    from PIL import Image

    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.video import SAM2VideoPredictor
    from sam2_opt_tpu.quant.int8 import is_quantized

    rng = np.random.default_rng(8)
    for i in range(2):
        img = (rng.random((128, 128, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / f"calib{i}.jpg")

    frames = (rng.random((3, 128, 128, 3)) * 255).astype(np.uint8)
    pt = dict(points=np.array([[40.0, 60.0]], np.float32),
              labels=np.array([1], np.int32))

    def track(vp):
        st = vp.init_state(frames)
        vp.add_new_points_or_box(st, 0, 1, **pt)
        return {f: np.asarray(m) for f, _, m in vp.propagate_in_video(st)}

    ref_vp = SAM2VideoPredictor(
        SAM2Model(jax.tree_util.tree_map(jnp.copy, tiny128_params),
                  tiny128_cfg),
        fill_hole_area=0,
    )
    ref = track(ref_vp)  # eager fp32 parity path

    model = SAM2Model(jax.tree_util.tree_map(jnp.copy, tiny128_params),
                      tiny128_cfg)
    vp = SAM2VideoPredictor(model, fill_hole_area=0)
    # fp32-dtype int8 isolates the quantization error from bf16 rounding
    vp.speedup("int8", calib_dir=str(tmp_path), dtype=jnp.float32,
               quant_scope="tracking")
    ma_q = model._compute_params["memory_attention"]["layers"][0]
    assert is_quantized(ma_q["self_attn"]["q_proj"])
    assert "act_scale" in ma_q["self_attn"]["q_proj"], (
        "tracking calibration did not reach memory attention"
    )
    assert is_quantized(ma_q["cross_attn_image"]["k_proj"])
    assert "act_scale" in ma_q["cross_attn_image"]["k_proj"]
    assert is_quantized(ma_q["linear1"]) and "act_scale" in ma_q["linear1"]
    tw = model._compute_params["sam_mask_decoder"]["transformer"]
    assert is_quantized(tw["layers"][0]["self_attn"]["q_proj"])
    assert "act_scale" in tw["layers"][0]["self_attn"]["q_proj"]
    # master tree untouched
    assert not is_quantized(
        model.params["memory_attention"]["layers"][0]["self_attn"]["q_proj"]
    )

    q = track(vp)
    assert set(q) == set(ref)
    for f in ref:
        a, b = ref[f][0, 0] > 0, q[f][0, 0] > 0
        u = (a | b).sum()
        iou = 1.0 if u == 0 else (a & b).sum() / u
        assert iou >= 0.97, f"frame {f}: tracking-int8 IoU {iou:.4f}"


def test_perm_proj_quantized_matches_permuted_output():
    """The fused-RoPE path permutes projection OUTPUT channels
    (memory_attention._perm_proj); for int8-quantized projections the
    permuted {w_int8, w_scale, bias} must produce exactly the permuted output
    of the unpermuted quantized projection."""
    from sam2_opt_tpu.models.memory_attention import _perm_proj
    from sam2_opt_tpu.quant.int8 import quantize_weight, quantized_linear

    rng = np.random.default_rng(9)
    w = rng.standard_normal((32, 64)).astype(np.float32) * 0.1
    b = rng.standard_normal((64,)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    qw, sc = quantize_weight(w)
    p = {"w_int8": jnp.asarray(qw), "w_scale": jnp.asarray(sc),
         "bias": jnp.asarray(b), "act_scale": jnp.float32(0.05)}
    perm = np.asarray(rng.permutation(64))
    y_ref = np.asarray(quantized_linear(p, x))[:, perm]
    y_perm = np.asarray(quantized_linear(_perm_proj(p, perm), x))
    np.testing.assert_allclose(y_perm, y_ref, rtol=1e-6, atol=1e-6)


def test_split_window_attention_matches_interleaved(monkeypatch):
    """Hiera's bf16 split-qkv einsum fast path (models/hiera.py) must match
    the interleaved-qkv + SDPA path for both plain and int8-quantized qkv
    weights — per-output-channel scales slice cleanly by column range, so the
    three split projections are exact."""
    from sam2_opt_tpu.models import hiera

    rng = np.random.default_rng(7)
    C, heads = 64, 2
    w = rng.standard_normal((C, 3 * C)).astype(np.float32) * 0.1
    b = rng.standard_normal(3 * C).astype(np.float32) * 0.01
    wp = rng.standard_normal((C, C)).astype(np.float32) * 0.1
    bp = rng.standard_normal(C).astype(np.float32) * 0.01
    x = jnp.asarray(rng.standard_normal((4, 8, 8, C)), jnp.bfloat16)
    proj = {"weight": jnp.asarray(wp), "bias": jnp.asarray(bp)}

    q8, s8 = quantize_weight(w)
    variants = {
        "plain": {"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
        "int8_weight_only": {"w_int8": jnp.asarray(q8),
                             "w_scale": jnp.asarray(s8),
                             "bias": jnp.asarray(b)},
        "int8_act": {"w_int8": jnp.asarray(q8), "w_scale": jnp.asarray(s8),
                     "bias": jnp.asarray(b),
                     "act_scale": jnp.asarray(3.0 / 127.0, jnp.float32)},
    }
    for name, qkv in variants.items():
        p = {"qkv": qkv, "proj": proj}
        monkeypatch.setenv("SAM2_TPU_FLASH", "1")  # fast path gate on
        fast = np.asarray(hiera.multiscale_attention(p, x, heads), np.float32)
        monkeypatch.setenv("SAM2_TPU_FLASH", "0")  # interleaved + SDPA
        ref = np.asarray(hiera.multiscale_attention(p, x, heads), np.float32)
        err = np.abs(fast - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 0.05, f"{name}: rel err {err}"


def test_int8_mask_accuracy_gate(tiny128_cfg, tiny128_params):
    """End-to-end int8 accuracy gate (BASELINE config #5): masks from the
    int8-quantized encoder (weight-only AND activation-quant) must match the
    fp32 masks at mIoU >= 0.98 — the XLA analogue of the reference's int8 TRT
    row keeping SA-V J&F within 0.1 (doc/benchmark.md:25,37)."""
    import jax

    from sam2_opt_tpu.models import sam2_base as base
    from sam2_opt_tpu.quant.calibrate import collect_activation_scales
    from sam2_opt_tpu.quant.int8 import quantize_params

    cfg = tiny128_cfg
    params = tiny128_params
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((1, 128, 128, 3)), jnp.float32)
    coords = jnp.asarray([[[40.0, 60.0]]], jnp.float32)
    labels = jnp.asarray([[1]], jnp.int32)

    def predict(p):
        out = base.forward_image(p, cfg, base.image_normalize(img))
        hrf0, hrf1, embed = out["backbone_fpn"]
        embed = base.no_mem_features(p, embed)
        outs = base.forward_sam_heads(
            p, cfg, embed, coords, labels,
            high_res_features=(hrf0, hrf1), multimask_output=True,
        )
        return np.asarray(outs[1])  # high-res multimasks

    ref = predict(params) > 0

    def miou(masks):
        ious = []
        for m in range(ref.shape[1]):
            a, b = ref[0, m], masks[0, m]
            u = (a | b).sum()
            ious.append(1.0 if u == 0 else (a & b).sum() / u)
        return float(np.mean(ious))

    q_w = quantize_params(params)
    miou_w = miou(predict(q_w) > 0)
    assert miou_w >= 0.98, f"weight-only int8 mIoU {miou_w:.4f}"

    scales = collect_activation_scales(
        params, cfg, [np.asarray(img)], percentile=100.0
    )
    assert scales, "calibration found no linears to quantize"
    q_a = quantize_params(params, act_scales=scales)
    miou_a = miou(predict(q_a) > 0)
    assert miou_a >= 0.98, f"act-quant int8 mIoU {miou_a:.4f}"
