"""DAM4SAM cross-validation vs the reference torch implementation (VERDICT r2 #2).

Drives BOTH dam4sam predictors (reference sam2_video_predictor_dam4sam.py +
modeling/sam2_base_dam4sam.py on CPU torch; ours
predictors/variants.py:SAM2VideoPredictorDAM4SAM) over the same synthetic
video through the DAM4SAM-specific machinery:

- an `add_to_drm` promotion mid-propagation (reference :434-466),
- a forced occlusion span (target invisible for 3 consecutive frames) so the
  RAM walk-back (reference sam2_base_dam4sam.py:636-696) must skip invisible
  frames AND the promoted DRM frame,
- a second propagation segment whose memory selection is spied on BOTH sides:
  the reference via a wrapper on MemoryAttention.forward that identifies each
  4096-token memory block (frame id by nearest channel-mean signature, tpos
  row by matching the additive maskmem_tpos_enc component), ours via a wrapper
  on _gather_memory (frame id by array identity).

Asserted: per-frame memory selection agreement — same frames, same
maskmem_tpos_enc rows, same obj-ptr count — plus the same video-res logit
gate as the official-track full-loop test.
"""

import os

import numpy as np
import pytest

from reference_helper import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)

T, VH, VW = 14, 192, 256
OCCLUDED = (5, 6, 7)   # forced-invisible span (set after the first segment)
DRM_FRAME = 4          # promoted into the DRM mid-propagation
# The reference propagate loop binds `video_res_masks` only inside the
# return_all_masks branch (sam2_video_predictor_dam4sam.py:920-941): any
# yielded frame WITHOUT `all_pred_masks` extras (e.g. the consolidated
# clicked frame) raises UnboundLocalError. DAM4SAM therefore always drives it
# with return_all_masks=True starting past the clicked frame — so do we.
SEG1_START = 1         # first segment tracks frames 1..10
SEG1_END = 10
FEAT_TOKENS = 4096     # tokens per memory frame at 1024^2 (64x64)


def _write_video(tmp_dir) -> str:
    from PIL import Image

    rng = np.random.default_rng(11)
    bg = (rng.random((VH, VW, 3)) * 80 + 60).astype(np.uint8)
    os.makedirs(tmp_dir, exist_ok=True)
    for t in range(T):
        frame = bg.copy()
        if t not in OCCLUDED:  # the target genuinely disappears
            x0, y0 = 30 + 6 * t, 50
            frame[y0 : y0 + 48, x0 : x0 + 48] = (230, 210, 60)
        Image.fromarray(frame).save(os.path.join(tmp_dir, f"{t:05d}.jpg"))
    return tmp_dir


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    return _write_video(str(tmp_path_factory.mktemp("dam_video") / "frames"))


@pytest.fixture(scope="module")
def predictors():
    from reference_helper import (
        build_torch_dam4sam_predictor,
        state_dict_numpy,
    )

    from sam2_opt_tpu.config import model_config
    from sam2_opt_tpu.io.torch_convert import convert_state_dict
    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.variants import SAM2VideoPredictorDAM4SAM

    torch_vp = build_torch_dam4sam_predictor("hiera_t", seed=0)
    cfg = model_config("hiera_t")
    params = convert_state_dict(state_dict_numpy(torch_vp))
    ours = SAM2VideoPredictorDAM4SAM(SAM2Model(params, cfg), fill_hole_area=0)
    return torch_vp, ours


def _float_all_maskmem(state):
    """Upcast bf16-stored memories to fp32 for the CPU torch linears (same
    rationale as test_video_full_loop_parity); dam4sam reads the BATCHED
    output_dict, so cover it too."""
    import torch

    def fix(frames):
        for out in frames.values():
            mm = out.get("maskmem_features")
            if mm is not None and mm.dtype == torch.bfloat16:
                out["maskmem_features"] = mm.float()

    for obj_dict in state["output_dict_per_obj"].values():
        for frames in obj_dict.values():
            fix(frames)
    for obj_dict in state["temp_output_dict_per_obj"].values():
        for frames in obj_dict.values():
            fix(frames)
    fix(state["output_dict"]["cond_frame_outputs"])
    fix(state["output_dict"]["non_cond_frame_outputs"])


def _torch_frame_signatures(state):
    """frame -> 64-dim channel-mean signature of its stored memory."""
    sigs = {}
    for key in ("cond_frame_outputs", "non_cond_frame_outputs"):
        for f, out in state["output_dict"][key].items():
            mm = out.get("maskmem_features")
            if mm is not None:
                sigs[f] = mm.float().mean(dim=(0, 2, 3)).numpy()
    return sigs


def _nearest(vec, table):
    """(key, gap) of the nearest signature; gap = margin to the 2nd-nearest."""
    keys = list(table)
    d = np.asarray([np.linalg.norm(vec - table[k]) for k in keys])
    order = np.argsort(d)
    margin = (d[order[1]] - d[order[0]]) if len(keys) > 1 else np.inf
    return keys[order[0]], float(margin)


def _install_torch_spy(torch_vp, state, records):
    """Wrap MemoryAttention.forward to decode (frames, tpos rows, n_ptrs)
    from the assembled memory stream (layout [S, B, C], reference
    memory_attention.py:263-297)."""
    import torch

    orig = torch_vp.memory_attention.forward
    tpos_rows = torch_vp.maskmem_tpos_enc.detach().float().numpy().reshape(7, -1)
    # the spatial component of every memory-pos block is the same sine PE
    any_out = next(iter(state["output_dict"]["cond_frame_outputs"].values()))
    spatial = any_out["maskmem_pos_enc"][-1]
    spatial_mean = spatial.float().flatten(2).mean(dim=(0, 2)).numpy()

    def spy(curr, memory, curr_pos=None, memory_pos=None, num_obj_ptr_tokens=0):
        sigs = _torch_frame_signatures(state)
        n_mem = (memory.shape[0] - num_obj_ptr_tokens) // FEAT_TOKENS
        sel = []
        for j in range(n_mem):
            blk = memory[j * FEAT_TOKENS : (j + 1) * FEAT_TOKENS, 0, :]
            f, margin = _nearest(blk.float().mean(dim=0).numpy(), sigs)
            assert margin > 1e-3, "ambiguous frame signature"
            pos_blk = memory_pos[j * FEAT_TOKENS : (j + 1) * FEAT_TOKENS, 0, :]
            tvec = pos_blk.float().mean(dim=0).numpy() - spatial_mean
            row = int(np.argmin(np.linalg.norm(tpos_rows - tvec, axis=1)))
            sel.append((f, row))
        records.append((sel, num_obj_ptr_tokens))
        return orig(curr, memory, curr_pos, memory_pos, num_obj_ptr_tokens)

    torch_vp.memory_attention.forward = spy
    return lambda: setattr(torch_vp.memory_attention, "forward", orig)


def _install_ours_spy(ours, records):
    """Wrap _gather_memory to record (frames, tpos rows, n_ptr_tokens) by
    array identity against the per-object output dict."""
    orig = ours._gather_memory

    def spy(inference_state, output_dict, frame_idx, reverse):
        mem = orig(inference_state, output_dict, frame_idx, reverse)
        id_to_frame = {}
        for key in ("cond_frame_outputs", "non_cond_frame_outputs"):
            for f, out in output_dict[key].items():
                mm = out.get("maskmem_features")
                if mm is not None:
                    id_to_frame[id(mm)] = f
        n = int(np.asarray(mem.valid).sum())
        sel = [
            (id_to_frame[id(mem.feats[i])], int(np.asarray(mem.tpos_idx)[0, i]))
            for i in range(n)
        ]
        tokens_per_ptr = ours.cfg.hidden_dim // ours.cfg.mem_dim
        n_ptr_tokens = int(np.asarray(mem.ptr_valid).sum()) * tokens_per_ptr
        records.append((sel, n_ptr_tokens))
        return mem

    ours._gather_memory = spy
    return lambda: setattr(ours, "_gather_memory", orig)


def test_dam4sam_parity(predictors, video_dir, monkeypatch):
    import torch

    # the dam4sam memory path hard-codes .cuda() (sam2_base_dam4sam.py:700-703)
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)

    torch_vp, ours = predictors
    points = np.array([[54, 74]], np.float32)
    labels = np.array([1], np.int32)

    # ------------- segment 1: frames 1..10, add_to_drm(4) mid-loop ---------
    with torch.no_grad():
        st_t = torch_vp.init_state(video_dir)
        torch_vp.add_new_points_or_box(st_t, 0, 1, points=points, labels=labels)
        torch_vp.propagate_in_video_preflight(st_t)
        _float_all_maskmem(st_t)
        seg1_t, extras1_t = {}, {}
        for f, ids, masks, extras in torch_vp.propagate_in_video(
            st_t, start_frame_idx=SEG1_START,
            max_frame_num_to_track=SEG1_END - SEG1_START,
            return_all_masks=True,
        ):
            seg1_t[f] = masks.numpy()
            extras1_t[f] = (
                np.stack([m.numpy() for m in extras[0]]),
                np.asarray(extras[1], np.float32).reshape(-1),
            )
            _float_all_maskmem(st_t)
            if f == DRM_FRAME:
                # mid-loop promotion: reference uses self.curr_out (:450-452)
                torch_vp.add_to_drm(st_t, DRM_FRAME, 1)

    st_j = ours.init_state(video_dir)
    ours.add_new_points_or_box(st_j, 0, 1, points=points, labels=labels)
    seg1_j, extras1_j = {}, {}
    for f, ids, masks, extras in ours.propagate_in_video(
        st_j, start_frame_idx=SEG1_START,
        max_frame_num_to_track=SEG1_END - SEG1_START,
        return_all_masks=True,
    ):
        seg1_j[f] = np.asarray(masks)
        extras1_j[f] = (
            np.stack([np.asarray(m) for m in extras[0]]),
            np.asarray(extras[1], np.float32).reshape(-1),
        )
        if f == DRM_FRAME:
            ours.add_to_drm(st_j, DRM_FRAME, 1)

    assert set(seg1_t) == set(seg1_j) == set(range(SEG1_START, SEG1_END + 1))
    for f in seg1_t:
        err = np.abs(seg1_t[f] - seg1_j[f]).max()
        assert err <= 0.05, f"segment-1 frame {f}: logit err {err:.4f}"
        # return_all_masks extras: all multimask slots + ious agree
        am_t, iou_t = extras1_t[f]
        am_j, iou_j = extras1_j[f]
        assert am_t.shape == am_j.shape, f"frame {f}: {am_t.shape} {am_j.shape}"
        assert np.abs(am_t - am_j).max() <= 0.05, f"frame {f} all-mask extras"
        np.testing.assert_allclose(iou_t, iou_j, atol=5e-3, err_msg=f"frame {f}")

    # both sides agree on the organic visibility of every tracked frame
    for f in range(1, SEG1_END + 1):
        store_t = ("cond_frame_outputs"
                   if f in st_t["output_dict"]["cond_frame_outputs"]
                   else "non_cond_frame_outputs")
        n_t = int(st_t["output_dict"][store_t][f]["n_pixels_pos"])
        out_j = st_j["output_dict_per_obj"][0]["non_cond_frame_outputs"].get(
            f, st_j["output_dict_per_obj"][0]["cond_frame_outputs"].get(f)
        )
        assert (n_t >= 1) == (out_j["n_pixels_pos"] >= 1), f"frame {f}"

    # ---------------- force the occlusion span on both sides ----------------
    for f in OCCLUDED:
        for store in ("cond_frame_outputs", "non_cond_frame_outputs"):
            if f in st_t["output_dict"][store]:
                st_t["output_dict"][store][f]["n_pixels_pos"] = 0
            if f in st_t["output_dict_per_obj"][0][store]:
                st_t["output_dict_per_obj"][0][store][f]["n_pixels_pos"] = 0
            if f in st_j["output_dict_per_obj"][0][store]:
                st_j["output_dict_per_obj"][0][store][f]["n_pixels_pos"] = 0

    # ---------------- segment 2: frames 10..13 with selection spies ---------
    rec_t, rec_j = [], []
    undo_t = _install_torch_spy(torch_vp, st_t, rec_t)
    undo_j = _install_ours_spy(ours, rec_j)
    try:
        with torch.no_grad():
            seg2_t = {}
            for f, ids, masks, _ in torch_vp.propagate_in_video(
                st_t, start_frame_idx=SEG1_END + 1, return_all_masks=True
            ):
                seg2_t[f] = masks.numpy()
                _float_all_maskmem(st_t)
        seg2_j = {}
        for f, ids, masks, _ in ours.propagate_in_video(
            st_j, start_frame_idx=SEG1_END + 1, return_all_masks=True
        ):
            seg2_j[f] = np.asarray(masks)
    finally:
        undo_t()
        undo_j()

    assert set(seg2_t) == set(seg2_j) == set(range(SEG1_END + 1, T))

    # the promoted frame became a DRM (cond) frame on both sides
    assert DRM_FRAME in st_t["output_dict"]["cond_frame_outputs"]
    assert DRM_FRAME in st_j["output_dict_per_obj"][0]["cond_frame_outputs"]

    # memory-selection agreement: same frames, same tpos rows, same ptr count
    assert len(rec_t) == len(rec_j) == T - SEG1_END - 1
    for i, (sel_t, sel_j) in enumerate(zip(rec_t, rec_j)):
        frame = SEG1_END + 1 + i
        assert sel_t[0] == sel_j[0], (
            f"frame {frame}: memory selection (frame, tpos) differs:\n"
            f"  reference: {sel_t[0]}\n  ours:      {sel_j[0]}"
        )
        assert sel_t[1] == sel_j[1], (
            f"frame {frame}: obj-ptr token count {sel_t[1]} vs {sel_j[1]}"
        )

    # the forced-occluded frames must have been skipped by the RAM walk, and
    # the DRM frame must participate
    for sel, _ in rec_t:
        frames_used = [f for f, _ in sel]
        assert not set(frames_used) & set(OCCLUDED), frames_used
        assert DRM_FRAME in frames_used, frames_used
        assert 0 in frames_used, frames_used

    # mask parity on the occlusion-affected segment
    for f in seg2_t:
        err = np.abs(seg2_t[f] - seg2_j[f]).max()
        assert err <= 0.05, f"segment-2 frame {f}: logit err {err:.4f}"
