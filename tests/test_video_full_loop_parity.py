"""Full-loop video parity vs the reference SAM2VideoPredictor (torch CPU).

Drives BOTH predictors over the same 14-frame synthetic video through the
complete interactive state machine — points on frame 0 (obj 1),
`add_new_mask` on frame 3 (obj 2), forward propagation with
memory_temporal_stride_for_eval=2 (exercising the stride-window branch),
reverse propagation, `remove_object`. This is the test that catches drift in
the host-side memory-selection arithmetic (predictors/video.py:575-678 vs
reference sam2_video_predictor_official.py:651-948): stride windows,
cond-frame selection, obj-ptr windows, reverse-time sign handling.

Gates: per-frame video-res LOGIT error <= 0.05 (the sharp check — selecting
a different memory frame moves logits by O(0.5) with these seeded weights;
the measured numeric floor from bf16 memory storage is ~0.02), plus binary
mask IoU (loose on random weights: near-zero logits over large areas flip
~3% of pixels at the 0.02 logit floor; trained weights would give >=0.99).
"""

import os

import numpy as np
import pytest

from reference_helper import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)

T, VH, VW = 14, 192, 256


def _write_video(tmp_dir) -> str:
    """Deterministic synthetic video: textured background + a bright square
    moving right, + a dark circle moving down."""
    from PIL import Image

    rng = np.random.default_rng(7)
    bg = (rng.random((VH, VW, 3)) * 80 + 60).astype(np.uint8)
    os.makedirs(tmp_dir, exist_ok=True)
    yy, xx = np.mgrid[0:VH, 0:VW]
    for t in range(T):
        frame = bg.copy()
        x0, y0 = 30 + 8 * t, 50
        frame[y0 : y0 + 48, x0 : x0 + 48] = (230, 210, 60)
        cx, cy = 190, 30 + 6 * t
        circ = (xx - cx) ** 2 + (yy - cy) ** 2 < 20 ** 2
        frame[circ] = (20, 40, 160)
        Image.fromarray(frame).save(os.path.join(tmp_dir, f"{t:05d}.jpg"))
    return tmp_dir


def _obj2_mask() -> np.ndarray:
    yy, xx = np.mgrid[0:VH, 0:VW]
    return ((xx - 190) ** 2 + (yy - (30 + 6 * 3)) ** 2 < 20 ** 2)


def _iou(a, b) -> float:
    a = np.asarray(a, bool)
    b = np.asarray(b, bool)
    union = (a | b).sum()
    if union == 0:
        return 1.0
    return (a & b).sum() / union


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    return _write_video(str(tmp_path_factory.mktemp("video") / "frames"))


@pytest.fixture(scope="module")
def predictors():
    from reference_helper import build_torch_video_predictor, state_dict_numpy

    from sam2_opt_tpu.config import model_config
    from sam2_opt_tpu.io.torch_convert import convert_state_dict
    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.video import SAM2VideoPredictor

    torch_vp = build_torch_video_predictor("hiera_t", seed=0)
    # stride > 1 exercises the strided non-cond memory selection
    # (reference :838-868), not just the t_rel==1 fast path
    torch_vp.memory_temporal_stride_for_eval = 2
    cfg = model_config("hiera_t", memory_temporal_stride_for_eval=2)
    params = convert_state_dict(state_dict_numpy(torch_vp))
    ours = SAM2VideoPredictor(SAM2Model(params, cfg), fill_hole_area=0)
    return torch_vp, ours


def _float_all_maskmem(state):
    """The reference stores maskmem as bfloat16 (:885-888) and consumes it
    under GPU autocast; on CPU the fp32 linears reject bf16 inputs. Upcasting
    the stored tensors to fp32 (keeping the bf16 rounding) matches both the
    GPU semantics and our side's bf16-storage/fp32-compute exactly."""
    import torch

    for obj_dict in state["output_dict_per_obj"].values():
        for frames in obj_dict.values():
            for out in frames.values():
                mm = out.get("maskmem_features")
                if mm is not None and mm.dtype == torch.bfloat16:
                    out["maskmem_features"] = mm.float()
    for obj_dict in state["temp_output_dict_per_obj"].values():
        for frames in obj_dict.values():
            for out in frames.values():
                mm = out.get("maskmem_features")
                if mm is not None and mm.dtype == torch.bfloat16:
                    out["maskmem_features"] = mm.float()


def test_full_loop_parity(predictors, video_dir):
    import torch

    torch_vp, ours = predictors
    points = np.array([[54, 74], [100, 74]], np.float32)  # inside the square
    labels = np.array([1, 1], np.int32)
    mask2 = _obj2_mask()

    # ---------------- reference (torch CPU) ----------------
    with torch.no_grad():
        st_t = torch_vp.init_state(video_dir)
        torch_vp.add_new_points_or_box(st_t, 0, 1, points=points, labels=labels)
        torch_vp.add_new_mask(st_t, 3, 2, torch.from_numpy(mask2))
        # preflight creates the clicked-frame memories (bf16) before the loop
        torch_vp.propagate_in_video_preflight(st_t)
        _float_all_maskmem(st_t)
        fwd_t = {}
        for f, ids, masks in torch_vp.propagate_in_video(st_t):
            fwd_t[f] = (list(ids), masks.numpy())
            _float_all_maskmem(st_t)
        rev_t = {}
        for f, ids, masks in torch_vp.propagate_in_video(
            st_t, start_frame_idx=3, reverse=True
        ):
            rev_t[f] = (list(ids), masks.numpy())
            _float_all_maskmem(st_t)
        ids_after_t, rem_masks_t = torch_vp.remove_object(
            st_t, 2, need_output=True
        )

    # ---------------- ours (jit XLA) ----------------
    st_j = ours.init_state(video_dir)
    ours.add_new_points_or_box(st_j, 0, 1, points=points, labels=labels)
    ours.add_new_mask(st_j, 3, 2, mask2)
    fwd_j = {}
    for f, ids, masks in ours.propagate_in_video(st_j):
        fwd_j[f] = (list(ids), np.asarray(masks))
    rev_j = {}
    for f, ids, masks in ours.propagate_in_video(
        st_j, start_frame_idx=3, reverse=True
    ):
        rev_j[f] = (list(ids), np.asarray(masks))
    ids_after_j, _ = ours.remove_object(st_j, 2, need_output=True)

    # ---------------- compare ----------------
    assert set(fwd_t) == set(fwd_j) == set(range(T))
    assert set(rev_t) == set(rev_j), (sorted(rev_t), sorted(rev_j))

    def compare(tag, d_t, d_j):
        ious = []
        for f in sorted(d_t):
            ids_t, m_t = d_t[f]
            ids_j, m_j = d_j[f]
            assert ids_t == ids_j, f"{tag} frame {f}: obj ids {ids_t} vs {ids_j}"
            assert m_t.shape == m_j.shape
            # sharp gate: logits (memory-selection drift -> O(0.5) jump)
            err = np.abs(m_t - m_j).max()
            assert err <= 0.05, f"{tag} frame {f}: logit err {err:.4f}"
            for o in range(m_t.shape[0]):
                iou = _iou(m_t[o, 0] > 0, m_j[o, 0] > 0)
                ious.append(iou)
                assert iou >= 0.94, f"{tag} frame {f} obj {o}: IoU {iou:.4f}"
        return float(np.mean(ious))

    miou_fwd = compare("forward", fwd_t, fwd_j)
    miou_rev = compare("reverse", rev_t, rev_j)
    assert miou_fwd >= 0.96, f"forward mIoU {miou_fwd:.4f}"
    assert miou_rev >= 0.96, f"reverse mIoU {miou_rev:.4f}"

    assert list(ids_after_t) == list(ids_after_j) == [1]


def test_mask_correction_on_tracked_frame_parity(predictors, video_dir):
    """add_new_mask on an ALREADY-TRACKED frame must reach the model: the
    reference routes any mask prompt to _use_mask_as_output regardless of
    frame kind (sam2_base_official.py:1051-1058), returning the +-10-logit
    passthrough and steering subsequent tracking through the corrected
    memory. (A dropped mask prompt would instead return a re-prediction from
    memory and fail the passthrough IoU gate.)"""
    import torch

    torch_vp, ours = predictors
    points = np.array([[54, 74]], np.float32)
    labels = np.array([1], np.int32)
    # exact square of the tracked object at frame 5
    corr = np.zeros((VH, VW), bool)
    x0, y0 = 30 + 8 * 5, 50
    corr[y0 : y0 + 48, x0 : x0 + 48] = True

    with torch.no_grad():
        st_t = torch_vp.init_state(video_dir)
        torch_vp.add_new_points_or_box(st_t, 0, 1, points=points, labels=labels)
        for _f, _ids, _m in torch_vp.propagate_in_video(
            st_t, max_frame_num_to_track=6
        ):
            _float_all_maskmem(st_t)
        _, _, mt = torch_vp.add_new_mask(st_t, 5, 1, torch.from_numpy(corr))
        mt = mt.numpy()
        _float_all_maskmem(st_t)
        fwd_t = {}
        for f, _ids, m in torch_vp.propagate_in_video(
            st_t, start_frame_idx=6, max_frame_num_to_track=3
        ):
            fwd_t[f] = m.numpy()
            _float_all_maskmem(st_t)

    st_j = ours.init_state(video_dir)
    ours.add_new_points_or_box(st_j, 0, 1, points=points, labels=labels)
    for _f, _ids, _m in ours.propagate_in_video(st_j, max_frame_num_to_track=6):
        pass
    _, _, mj = ours.add_new_mask(st_j, 5, 1, corr)
    mj = np.asarray(mj)
    fwd_j = {}
    for f, _ids, m in ours.propagate_in_video(
        st_j, start_frame_idx=6, max_frame_num_to_track=3
    ):
        fwd_j[f] = np.asarray(m)

    # corrected frame returns the mask passthrough, identically on both sides
    assert _iou(mj[0, 0] > 0, corr) >= 0.99
    assert np.abs(mt - mj).max() <= 0.05
    # frames after the correction attend to the corrected memory
    assert set(fwd_t) == set(fwd_j)
    for f in sorted(fwd_t):
        err = np.abs(fwd_t[f] - fwd_j[f]).max()
        assert err <= 0.05, f"frame {f}: logit err {err:.4f}"


@pytest.fixture(scope="module")
def predictors_v20_flags(video_dir):
    """Predictor pair with the SAM 2.0-style pointer flags (Linear
    obj_ptr_proj, no pointer temporal PE) — exercises the non-2.1 branches
    of the pointer machinery against the reference."""
    from reference_helper import build_torch_video_predictor, state_dict_numpy

    from sam2_opt_tpu.config import model_config
    from sam2_opt_tpu.io.torch_convert import convert_state_dict
    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.video import SAM2VideoPredictor

    flags = dict(
        use_mlp_for_obj_ptr_proj=False,
        add_tpos_enc_to_obj_ptrs=False,
        proj_tpos_enc_in_obj_ptrs=False,
        use_signed_tpos_enc_to_obj_ptrs=False,
    )
    torch_vp = build_torch_video_predictor("hiera_t", seed=0, **flags)
    cfg = model_config("hiera_t", **flags)
    params = convert_state_dict(state_dict_numpy(torch_vp))
    ours = SAM2VideoPredictor(SAM2Model(params, cfg), fill_hole_area=0)
    return torch_vp, ours


def test_v20_pointer_flags_parity(predictors_v20_flags, video_dir):
    """Linear obj_ptr_proj + zero pointer tpos PE (2.0-style flags) track a
    short clip identically to the reference."""
    import torch

    torch_vp, ours = predictors_v20_flags
    points = np.array([[54, 74]], np.float32)
    labels = np.array([1], np.int32)

    with torch.no_grad():
        st_t = torch_vp.init_state(video_dir)
        torch_vp.add_new_points_or_box(st_t, 0, 1, points=points, labels=labels)
        fwd_t = {}
        for f, _ids, m in torch_vp.propagate_in_video(
            st_t, max_frame_num_to_track=5
        ):
            fwd_t[f] = m.numpy()
            _float_all_maskmem(st_t)

    st_j = ours.init_state(video_dir)
    ours.add_new_points_or_box(st_j, 0, 1, points=points, labels=labels)
    fwd_j = {}
    for f, _ids, m in ours.propagate_in_video(st_j, max_frame_num_to_track=5):
        fwd_j[f] = np.asarray(m)

    assert set(fwd_t) == set(fwd_j)
    for f in sorted(fwd_t):
        err = np.abs(fwd_t[f] - fwd_j[f]).max()
        assert err <= 0.05, f"frame {f}: logit err {err:.4f}"


@pytest.fixture(scope="module")
def predictors_dense_mask_prompt(video_dir):
    """use_mask_input_as_output_without_sam=False: mask prompts become dense
    SAM prompts instead of GT passthrough (reference _track_step else-branch
    -> _forward_sam_heads mask_inputs)."""
    from reference_helper import build_torch_video_predictor, state_dict_numpy

    from sam2_opt_tpu.config import model_config
    from sam2_opt_tpu.io.torch_convert import convert_state_dict
    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.video import SAM2VideoPredictor

    torch_vp = build_torch_video_predictor(
        "hiera_t", seed=0, use_mask_input_as_output_without_sam=False
    )
    cfg = model_config("hiera_t", use_mask_input_as_output_without_sam=False)
    params = convert_state_dict(state_dict_numpy(torch_vp))
    ours = SAM2VideoPredictor(SAM2Model(params, cfg), fill_hole_area=0)
    return torch_vp, ours


def test_dense_mask_prompt_parity(predictors_dense_mask_prompt, video_dir):
    """With the passthrough disabled, the 1024² mask must be antialias-resized
    to the prompt grid and fed to the SAM heads (reference
    _forward_sam_heads :402-416) — not silently dropped."""
    import torch

    torch_vp, ours = predictors_dense_mask_prompt
    mask0 = np.zeros((VH, VW), bool)
    mask0[50:98, 30:78] = True  # square at frame 0

    with torch.no_grad():
        st_t = torch_vp.init_state(video_dir)
        _, _, mt = torch_vp.add_new_mask(st_t, 0, 1, torch.from_numpy(mask0))
        mt = mt.numpy()

    st_j = ours.init_state(video_dir)
    _, _, mj = ours.add_new_mask(st_j, 0, 1, mask0)
    mj = np.asarray(mj)

    assert mt.shape == mj.shape
    err = np.abs(mt - mj).max()
    assert err <= 0.05, f"dense-mask-prompt logit err {err:.4f}"
