"""DAM4SAM distractor-aware track tests (reference
sam2_video_predictor_dam4sam.py + modeling/sam2_base_dam4sam.py).

Covers: visibility-aware RAM memory selection (occluded frames skipped, walk
past them), DRM promotion via add_to_drm, multimask/iou extras from
propagate_in_video(return_all_masks=True), n_pixels_pos bookkeeping, and the
SAM2_VERSION_TRACK env switch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam2_opt_tpu.models.model import SAM2Model
from sam2_opt_tpu.predictors.variants import (
    SAM2VideoPredictorDAM4SAM,
    select_video_predictor_cls,
)


@pytest.fixture()
def dam_predictor(tiny128_cfg, tiny128_params):
    return SAM2VideoPredictorDAM4SAM(
        SAM2Model(tiny128_params, tiny128_cfg), fill_hole_area=0
    )


def _fake_out(frame_value, g, visible=True):
    return {
        "maskmem_features": jnp.full((1, g, g, 64), float(frame_value),
                                     jnp.bfloat16),
        "pred_masks": jnp.zeros((1, 1, 32, 32), jnp.float32),
        "obj_ptr": jnp.full((1, 256), float(frame_value), jnp.float32),
        "object_score_logits": jnp.asarray([[10.0]], jnp.float32),
        "n_pixels_pos": 100 if visible else 0,
    }


def test_ram_selection_skips_invisible_frames(dam_predictor):
    """RAM picks the most recent VISIBLE frames, walking back past occluded
    ones (reference sam2_base_dam4sam.py:640-680); DRM (cond) frames take
    tpos slot 0."""
    p = dam_predictor
    g = p.cfg.image_embedding_size
    # frames 0..8 tracked; frames 7 and 8 occluded (target invisible)
    output_dict = {
        "cond_frame_outputs": {0: _fake_out(0, g)},
        "non_cond_frame_outputs": {
            t: _fake_out(t, g, visible=t not in (7, 8)) for t in range(1, 9)
        },
    }
    mem = p._gather_memory({"num_frames": 20}, output_dict, frame_idx=9,
                           reverse=False)
    vals = [float(np.asarray(f, np.float32)[0, 0, 0, 0]) for f in mem.feats]
    valid = np.asarray(mem.valid[0])
    picked = sorted(v for v, ok in zip(vals, valid) if ok)
    # cond frame 0 + the 6 most recent VISIBLE frames (1..6); occluded 7, 8
    # must NOT appear
    assert picked == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0], picked
    # object pointers also skip invisible frames
    ptr_vals = [float(np.asarray(x)[0, 0]) for x in mem.ptrs]
    ptr_valid = np.asarray(mem.ptr_valid[0])
    picked_ptrs = sorted(v for v, ok in zip(ptr_vals, ptr_valid) if ok)
    assert 7.0 not in picked_ptrs and 8.0 not in picked_ptrs
    assert 6.0 in picked_ptrs and 0.0 in picked_ptrs


def test_ram_all_occluded_falls_back_to_cond_only(dam_predictor):
    p = dam_predictor
    g = p.cfg.image_embedding_size
    output_dict = {
        "cond_frame_outputs": {0: _fake_out(0, g)},
        "non_cond_frame_outputs": {
            t: _fake_out(t, g, visible=False) for t in range(1, 5)
        },
    }
    mem = p._gather_memory({"num_frames": 10}, output_dict, frame_idx=5,
                           reverse=False)
    valid = np.asarray(mem.valid[0])
    assert valid.sum() == 1  # only the DRM/cond frame remains


def test_env_track_switch():
    import os

    old = os.environ.get("SAM2_VERSION_TRACK")
    try:
        os.environ["SAM2_VERSION_TRACK"] = "dam4sam"
        assert select_video_predictor_cls() is SAM2VideoPredictorDAM4SAM
        os.environ["SAM2_VERSION_TRACK"] = "official"
        from sam2_opt_tpu.predictors.video import SAM2VideoPredictor

        assert select_video_predictor_cls() is SAM2VideoPredictor
    finally:
        if old is None:
            os.environ.pop("SAM2_VERSION_TRACK", None)
        else:
            os.environ["SAM2_VERSION_TRACK"] = old


def test_dam4sam_end_to_end(dam_predictor):
    """Full loop: clicks -> propagate with multimask extras -> add_to_drm ->
    the promoted frame becomes a conditioning (DRM) frame."""
    p = dam_predictor
    rng = np.random.default_rng(9)
    video = (rng.random((5, 128, 128, 3)) * 255).astype(np.uint8)
    state = p.init_state(video)
    p.add_new_points_or_box(
        state, frame_idx=0, obj_id=1,
        points=np.array([[60.0, 60.0]], np.float32),
        labels=np.array([1], np.int32),
    )
    outs = list(p.propagate_in_video(state, return_all_masks=True))
    assert len(outs) == 5
    frame_idx, obj_ids, masks, (all_masks, all_ious) = outs[2]
    assert obj_ids == [1] and masks.shape[-2:] == (128, 128)
    assert len(all_masks) == 3 and all_ious.shape == (3,)
    assert all(m.shape[-2:] == (128, 128) for m in all_masks)

    obj_out = state["output_dict_per_obj"][0]
    assert all(
        "n_pixels_pos" in o
        for o in obj_out["non_cond_frame_outputs"].values()
    )

    # promote frame 2 into DRM; preflight moves it to cond outputs
    f, ids, m = p.add_to_drm(state, 2, 1)
    assert f == 2 and state["adds_in_drm_per_obj"][0] == [2]
    p.propagate_in_video_preflight(state)
    assert 2 in obj_out["cond_frame_outputs"]
    assert 2 not in obj_out["non_cond_frame_outputs"]

    # memory gather at a later frame now treats frame 2 as DRM (cond)
    mem = p._gather_memory(state, obj_out, frame_idx=4, reverse=False)
    assert np.asarray(mem.valid[0]).sum() >= 2

    # reset clears the DRM-promotion bookkeeping (reference
    # sam2_video_predictor_dam4sam.py:1057,1071; regression: the clear
    # lived on the Legacy class, where the key never exists)
    p.reset_state(state)
    assert state["adds_in_drm_per_obj"] == {}


def test_legacy_track_contract(tiny128_cfg, tiny128_params):
    """Legacy (pre-12/2024) API contract: no new objects after tracking
    starts; box-after-start warns; reset clears the flag (reference
    sam2_video_predictor_legacy.py:107,138-162,216-224,848-877)."""
    import warnings

    from sam2_opt_tpu.predictors.variants import SAM2VideoPredictorLegacy

    p = SAM2VideoPredictorLegacy(
        SAM2Model(tiny128_params, tiny128_cfg), fill_hole_area=0
    )
    rng = np.random.default_rng(10)
    video = (rng.random((3, 128, 128, 3)) * 255).astype(np.uint8)
    state = p.init_state(video)
    assert state["tracking_has_started"] is False
    p.add_new_points_or_box(
        state, 0, 1, points=np.array([[60.0, 60.0]], np.float32),
        labels=np.array([1], np.int32),
    )
    list(p.propagate_in_video(state))
    assert state["tracking_has_started"] is True

    with pytest.raises(RuntimeError, match="Cannot add new object"):
        p.add_new_points_or_box(
            state, 1, 2, points=np.array([[30.0, 30.0]], np.float32),
            labels=np.array([1], np.int32),
        )
    # existing object: box prompt after start warns but works
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        p.add_new_points_or_box(state, 1, 1, box=np.array([20, 20, 90, 90]))
    assert any("after tracking starts" in str(x.message) for x in w)

    p.reset_state(state)
    assert state["tracking_has_started"] is False
