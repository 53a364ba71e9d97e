"""Legacy-predictor cross-validation vs the reference torch legacy engine
(VERDICT r4 #3 — the dam4sam-style differential test the shim never had).

The reference keeps the pre-12/2024 engine
(sam2/sam2/sam2_video_predictor_legacy.py, 1172 LoC: one shared
`output_dict` with object-batched tensors) for backward compatibility
(RELEASE_NOTES.md:10-13). Our `SAM2VideoPredictorLegacy`
(predictors/variants.py) enforces the legacy API contract on the modern
per-object engine. This test drives BOTH through the same multi-object
script and asserts:

- numerical agreement of every propagated frame (points obj 1 + mask obj 2
  on frame 0, forward + reverse propagation) under the same converted
  weights — gates identical to tests/test_video_full_loop_parity.py;
- behavioral agreement on the legacy-only API contract: add-new-object
  after tracking raises (same message), box-after-start warns,
  propagate-without-prompts raises, reset_state unlocks.

Documented delta (intentional, engine-level): when objects are clicked on
DIFFERENT frames, the legacy engine consolidates every clicked frame
across ALL objects, filling non-clicked objects with a placeholder
"empty mask" output + `_get_empty_mask_ptr` pointer (legacy :426-591) that
then enters their memory; the modern engine (official track, which our
shim wraps) conditions each object only on its own clicked frames
(sam2_video_predictor_official.py — per-object independent tracking).
Outputs for such scripts legitimately differ between the two reference
engines themselves; the shim follows the modern semantics. The numerical
scenario here therefore clicks all objects on the same frame, where the
engines agree.
"""

import os
import warnings

import numpy as np
import pytest

from reference_helper import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)

T, VH, VW = 10, 192, 256


def _write_video(tmp_dir) -> str:
    from PIL import Image

    rng = np.random.default_rng(21)
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


def _obj2_mask_at0() -> np.ndarray:
    yy, xx = np.mgrid[0:VH, 0:VW]
    return ((xx - 190) ** 2 + (yy - 30) ** 2) < 20 ** 2


def _iou(a, b) -> float:
    a, b = np.asarray(a, bool), np.asarray(b, bool)
    union = (a | b).sum()
    return 1.0 if union == 0 else (a & b).sum() / union


def _float_all_maskmem(state):
    """Legacy stores maskmem bf16 (legacy :956,1008) for GPU autocast; on
    CPU upcast stored tensors to fp32 keeping the bf16 rounding (same
    rationale as test_video_full_loop_parity._float_all_maskmem) —
    including the SHARED batched output_dict the legacy engine tracks
    from."""
    import torch

    def fix(frames_dict):
        for out in frames_dict.values():
            mm = out.get("maskmem_features")
            if mm is not None and mm.dtype == torch.bfloat16:
                out["maskmem_features"] = mm.float()

    for key in ("cond_frame_outputs", "non_cond_frame_outputs"):
        fix(state["output_dict"][key])
    for per_obj in ("output_dict_per_obj", "temp_output_dict_per_obj"):
        for obj_dict in state[per_obj].values():
            for key in ("cond_frame_outputs", "non_cond_frame_outputs"):
                fix(obj_dict[key])


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    return _write_video(str(tmp_path_factory.mktemp("legacy_video") / "f"))


@pytest.fixture(scope="module")
def predictors():
    from reference_helper import build_torch_legacy_predictor, state_dict_numpy

    from sam2_opt_tpu.config import model_config
    from sam2_opt_tpu.io.torch_convert import convert_state_dict
    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.variants import SAM2VideoPredictorLegacy

    torch_vp = build_torch_legacy_predictor("hiera_t", seed=0)
    cfg = model_config("hiera_t")
    params = convert_state_dict(state_dict_numpy(torch_vp))
    ours = SAM2VideoPredictorLegacy(SAM2Model(params, cfg), fill_hole_area=0)
    return torch_vp, ours


def test_legacy_full_loop_parity(predictors, video_dir):
    import torch

    torch_vp, ours = predictors
    points = np.array([[54, 74], [100, 74]], np.float32)
    labels = np.array([1, 1], np.int32)
    mask2 = _obj2_mask_at0()

    with torch.no_grad():
        st_t = torch_vp.init_state(video_dir)
        torch_vp.add_new_points_or_box(st_t, 0, 1, points=points,
                                       labels=labels)
        torch_vp.add_new_mask(st_t, 0, 2, torch.from_numpy(mask2))
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

    st_j = ours.init_state(video_dir)
    ours.add_new_points_or_box(st_j, 0, 1, points=points, labels=labels)
    ours.add_new_mask(st_j, 0, 2, mask2)
    fwd_j = {}
    for f, ids, masks in ours.propagate_in_video(st_j):
        fwd_j[f] = (list(ids), np.asarray(masks))
    rev_j = {}
    for f, ids, masks in ours.propagate_in_video(
        st_j, start_frame_idx=3, reverse=True
    ):
        rev_j[f] = (list(ids), np.asarray(masks))

    assert set(fwd_t) == set(fwd_j) == set(range(T))
    assert set(rev_t) == set(rev_j)

    def compare(tag, d_t, d_j):
        ious = []
        for f in sorted(d_t):
            ids_t, m_t = d_t[f]
            ids_j, m_j = d_j[f]
            assert ids_t == ids_j, f"{tag} frame {f}: ids {ids_t} vs {ids_j}"
            assert m_t.shape == m_j.shape
            err = np.abs(m_t - m_j).max()
            assert err <= 0.05, f"{tag} frame {f}: logit err {err:.4f}"
            for o in range(m_t.shape[0]):
                iou = _iou(m_t[o, 0] > 0, m_j[o, 0] > 0)
                ious.append(iou)
                assert iou >= 0.94, f"{tag} frame {f} obj {o}: IoU {iou:.4f}"
        return float(np.mean(ious))

    assert compare("forward", fwd_t, fwd_j) >= 0.96
    assert compare("reverse", rev_t, rev_j) >= 0.96


def test_legacy_api_contract(predictors, video_dir):
    """The legacy-only API behaviors, asserted against the reference's own
    responses (legacy :130-162 add-after-tracking, :216-224 box-after-start,
    :679 propagate-without-prompts, :848-877 reset unlocks)."""
    import torch

    torch_vp, ours = predictors
    points = np.array([[54, 74]], np.float32)
    labels = np.array([1], np.int32)

    # --- propagate with no prompts raises on both ---
    with torch.no_grad():
        st_t = torch_vp.init_state(video_dir)
        with pytest.raises(RuntimeError, match="No points are provided"):
            for _ in torch_vp.propagate_in_video(st_t):
                pass
    st_j = ours.init_state(video_dir)
    with pytest.raises(RuntimeError, match="No points are provided"):
        for _ in ours.propagate_in_video(st_j):
            pass

    # --- add object, track, then: new object rejected with the same
    #     message; box-after-start warns on both ---
    def drive(vp, st, is_torch):
        ctx = torch.no_grad() if is_torch else _null()
        with ctx:
            vp.add_new_points_or_box(st, 0, 1, points=points, labels=labels)
            for _ in vp.propagate_in_video(st, max_frame_num_to_track=2):
                pass
            with pytest.raises(RuntimeError) as exc:
                vp.add_new_points_or_box(st, 3, 99, points=points,
                                         labels=labels)
            with warnings.catch_warnings(record=True) as caught:
                warnings.simplefilter("always")
                vp.add_new_points_or_box(
                    st, 3, 1, points=np.zeros((0, 2), np.float32),
                    labels=np.zeros((0,), np.int32),
                    box=np.array([150, 10, 230, 60], np.float32),
                )
            assert any(issubclass(w.category, UserWarning)
                       and "adding a box after tracking starts"
                       in str(w.message) for w in caught)
            # reset unlocks new objects
            vp.reset_state(st)
            vp.add_new_points_or_box(st, 0, 99, points=points, labels=labels)
        return str(exc.value)

    class _null:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    st_t = torch_vp.init_state(video_dir)
    st_j = ours.init_state(video_dir)
    msg_t = drive(torch_vp, st_t, True)
    msg_j = drive(ours, st_j, False)
    assert msg_t == msg_j, f"rejection messages differ:\n{msg_t}\n{msg_j}"
    assert "Cannot add new object id 99 after tracking starts" in msg_j
