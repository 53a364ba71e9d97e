"""Video predictor variant tracks.

The reference ships three tracker tracks selected by the SAM2_VERSION_TRACK
env var (sam2/sam2/sam2_video_predictor.py:4-18, modeling/sam2_base.py:6-17):

  "official" (default) — per-object independent tracking, post-12/2024 API
  "dam4sam"            — distractor-aware memory variant
  plus the pre-12/2024 "legacy" class kept for backward compat.

Here:
- SAM2VideoPredictor (official) is the fully implemented track;
- SAM2VideoPredictorVOS subclasses it — in the reference this variant exists
  to torch.compile the submodules (sam2_video_predictor_official.py:1082-1329);
  our predictor compiles everything via speedup() already, so the subclass
  only pins the compiled backend on;
- SAM2VideoPredictorDAM4SAM implements the distractor-aware memory track
  (reference sam2_video_predictor_dam4sam.py + modeling/sam2_base_dam4sam.py):
  the memory bank is split into a DRM part (distractor-resolving memory —
  conditioning frames, including frames promoted via `add_to_drm`) and a RAM
  part (recent-appearance memory — the latest frames WHERE THE TARGET IS
  VISIBLE, walking further back past occlusions), plus multimask/IoU extras
  for the caller's distractor analysis;
- SAM2VideoPredictorLegacy enforces the pre-12/2024 API contract (no new
  objects after tracking starts, box-after-start warning) on the modern
  engine (superseded per RELEASE_NOTES.md:10-13, kept for backward compat).
"""

from __future__ import annotations

import os

import numpy as np

from sam2_opt_tpu.predictors.video import (
    SAM2VideoPredictor,
    _select_closest_cond_frames,
)


class SAM2VideoPredictorVOS(SAM2VideoPredictor):
    """VOS-optimized variant: everything jit-compiled up front (the reference
    torch.compile's memory encoder/attention/prompt encoder/mask decoder,
    sam2_video_predictor_official.py:1089-1117 — our compiled XLA path is the
    same thing, so this subclass just defaults speedup on)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.speedup()


class SAM2VideoPredictorLegacy(SAM2VideoPredictor):
    """Pre-12/2024 API contract (reference sam2_video_predictor_legacy.py),
    superseded by the official track (RELEASE_NOTES.md:10-13) but kept for
    backward compatibility. The legacy public-API deltas are enforced on top
    of the modern engine:

    - new objects CANNOT be added after tracking starts
      (`tracking_has_started`, reference legacy :107,138-162) — the official
      track allows it; legacy raises with the reference's message;
    - adding a box after tracking starts warns (reference legacy :216-224);
    - `reset_state` clears the tracking-started flag (reference :848-877).

    Internally the per-object storage of the modern engine is used (the
    legacy shared batched output_dict is an implementation detail that the
    public API does not expose).
    """

    def init_state(self, *args, **kwargs):
        state = super().init_state(*args, **kwargs)
        state["tracking_has_started"] = False
        return state

    def _obj_id_to_idx(self, inference_state, obj_id):
        obj_idx = inference_state["obj_id_to_idx"].get(obj_id)
        if obj_idx is None and inference_state.get("tracking_has_started"):
            raise RuntimeError(
                f"Cannot add new object id {obj_id} after tracking starts. "
                f"All existing object ids: {inference_state['obj_ids']}. "
                "Please call 'reset_state' to restart from scratch."
            )
        return super()._obj_id_to_idx(inference_state, obj_id)

    def add_new_points_or_box(self, inference_state, frame_idx, obj_id,
                              points=None, labels=None, clear_old_points=True,
                              normalize_coords=True, box=None):
        if box is not None and inference_state.get("tracking_has_started"):
            import warnings

            warnings.warn(
                "You are adding a box after tracking starts. SAM 2 may not "
                "always be able to incorporate a box prompt for *refinement*. "
                "If you intend to use box prompt as an *initial* input before "
                "tracking, please call 'reset_state' on the inference state "
                "to restart from scratch.",
                category=UserWarning,
                stacklevel=2,
            )
        return super().add_new_points_or_box(
            inference_state, frame_idx, obj_id, points=points, labels=labels,
            clear_old_points=clear_old_points,
            normalize_coords=normalize_coords, box=box,
        )

    def propagate_in_video_preflight(self, inference_state):
        # the reference locks new objects at PREFLIGHT (legacy :593-596),
        # which propagate_in_video also calls — match both entry points
        inference_state["tracking_has_started"] = True
        return super().propagate_in_video_preflight(inference_state)

    def propagate_in_video(self, inference_state, *args, **kwargs):
        inference_state["tracking_has_started"] = True
        if not any(
            obj_out["cond_frame_outputs"] or obj_out["non_cond_frame_outputs"]
            for obj_out in inference_state["output_dict_per_obj"].values()
        ) and not any(
            inference_state["point_inputs_per_obj"].get(i)
            or inference_state["mask_inputs_per_obj"].get(i)
            for i in inference_state["obj_id_to_idx"].values()
        ):
            raise RuntimeError(
                "No points are provided; please add points first"
            )
        return super().propagate_in_video(inference_state, *args, **kwargs)

    def reset_state(self, inference_state):
        super().reset_state(inference_state)
        inference_state["tracking_has_started"] = False


class SAM2VideoPredictorDAM4SAM(SAM2VideoPredictor):
    """DAM4SAM distractor-aware track (reference
    sam2_video_predictor_dam4sam.py + modeling/sam2_base_dam4sam.py).

    Deltas vs the official track, all host-side (the compiled memory-attention
    graph is the same fixed-capacity masked kernel):

    - per-frame outputs record `n_pixels_pos` (target visibility) and the
      multimask `all_pred_masks`/`ious` extras (reference
      sam2_base_dam4sam.py:447-501, predictor :1175);
    - memory selection (reference sam2_base_dam4sam.py:617-710): the DRM part
      = selected conditioning frames (t_pos 0), the RAM part = the most
      recent VISIBLE frames, walking back past frames where the target
      disappeared (n_pixels_pos < 1), with the stride walk anchored at the
      previously selected RAM frame; object pointers only from visible
      frames, unsigned temporal distances;
    - `add_to_drm(state, frame_idx, obj_id)` promotes an already-tracked
      frame into the DRM (conditioning) part (reference :434-466) — the
      caller's distractor analysis decides when;
    - `propagate_in_video(..., return_all_masks=True)` yields a 4-tuple with
      `(all_masks, all_ious)` extras (reference :837-941).
    """

    # retain multimask slots in the compiled step for distractor analysis
    keep_multimasks = True

    def _compact_output(self, out, pred_masks):
        compact = super()._compact_output(out, pred_masks)
        compact["ious"] = out.get("ious")
        if "all_pred_masks" in out:
            compact["all_pred_masks"] = out["all_pred_masks"]
        # host visibility count (reference :1175); small [1,1,256,256] fetch
        compact["n_pixels_pos"] = int(
            (np.asarray(pred_masks[0, 0]) > 0).sum()
        )
        return compact

    @staticmethod
    def _visible(out) -> bool:
        return out is not None and out.get("n_pixels_pos", 1) >= 1

    def _gather_memory(self, inference_state, output_dict, frame_idx, reverse):
        """DRM/RAM memory selection (reference sam2_base_dam4sam.py:617-710).

        Returns a vc.MemoryInput. DRM frames take tpos enumeration slot 0;
        RAM frames are sorted by frame index and enumerated after them, so
        the temporal embedding index is `total - t_pos - 1` with `total` the
        padded slot count (faithful to the reference arithmetic).

        Two reference quirks are preserved DELIBERATELY (cross-validated by
        tests/test_dam4sam_parity.py against the reference running on torch):
        - the RAM walk only looks BACKWARD in time regardless of `reverse`
          (reference :640-676 decrements unconditionally; only the obj-ptr
          windows honor track_in_reverse, :720-732) — DAM4SAM is a forward
          tracker and reverse passes see DRM-only memory, same as upstream;
        - a RAM entry at frame index 0 shares sort key 0 with DRM entries and
          walked-off (None) sentinels still occupy enumeration slots
          (reference :684-694 assigns t_pos before skipping padding frames).
        """
        from sam2_opt_tpu.models import video_core as vc

        cfg = self.cfg
        num_frames = inference_state["num_frames"]
        cond_outputs = output_dict["cond_frame_outputs"]
        non_cond = output_dict["non_cond_frame_outputs"]
        selected_cond, unselected_cond = _select_closest_cond_frames(
            frame_idx, cond_outputs, cfg.max_cond_frames_in_attn
        )
        # DRM part: (sort_key=0, out)
        t_pos_and_prevs = [(0, out) for out in selected_cond.values()]

        # RAM part: most recent frames with the target visible
        r = cfg.memory_temporal_stride_for_eval
        n_ram = cfg.num_maskmem - 1 - (len(t_pos_and_prevs) - 1)
        outs_, ram_frame_indices = [], []
        prev_frame_idx = None
        for i in range(max(n_ram, 0)):
            if i == 0:
                prev_frame_idx = frame_idx - 1
                if prev_frame_idx in cond_outputs:
                    out = cond_outputs.get(prev_frame_idx)
                else:
                    out = non_cond.get(prev_frame_idx)
                if (
                    not self._visible(out)
                    or prev_frame_idx in selected_cond
                ):
                    out = None
                    while True:
                        prev_frame_idx -= 1
                        if prev_frame_idx > 0:
                            out = non_cond.get(prev_frame_idx)
                            if (
                                self._visible(out)
                                and prev_frame_idx not in selected_cond
                            ):
                                break
                            out = None
                        else:
                            out = None
                            break
            elif prev_frame_idx >= 0:
                prev_frame_idx = ((prev_frame_idx - 1) // r) * r
                out = non_cond.get(prev_frame_idx)
                if (
                    not self._visible(out)
                    or prev_frame_idx in selected_cond
                ):
                    out = None
                    while True:
                        prev_frame_idx -= r
                        if prev_frame_idx > 0:
                            out = non_cond.get(prev_frame_idx)
                            if (
                                self._visible(out)
                                and prev_frame_idx not in selected_cond
                            ):
                                break
                            out = None
                        else:
                            out = None
                            break
            else:
                out = None
            outs_.append(out)
            ram_frame_indices.append(prev_frame_idx)

        for out_f_idx, out in zip(ram_frame_indices, outs_):
            t_pos_and_prevs.append((out_f_idx, out))
        # sort: DRM (key 0) first, RAM ascending by frame index; then
        # enumerate — DRM entries keep t_pos 0, RAM get their position
        t_pos_and_prevs = sorted(t_pos_and_prevs, key=lambda x: x[0])
        t_pos_and_prevs = [
            (0, prev) if t_pos == 0 else (idx, prev)
            for idx, (t_pos, prev) in enumerate(t_pos_and_prevs)
        ]
        total = len(t_pos_and_prevs)

        feats_list, tpos_list = [], []
        for t_pos, prev in t_pos_and_prevs:
            if prev is None:
                continue
            feats_list.append(prev["maskmem_features"])
            tpos_list.append(total - t_pos - 1)

        n = max(len(feats_list), 1)
        cap = cfg.num_maskmem if n <= cfg.num_maskmem else n
        D = cfg.mem_dim
        tpos_idx = np.zeros((cap,), np.int32)
        valid = np.zeros((cap,), bool)
        zero_slot = self._zero_mem_slot(D)
        mem_feats = tuple(
            feats_list[i] if i < len(feats_list) else zero_slot
            for i in range(cap)
        )
        tpos_idx[: len(tpos_list)] = [
            min(t, cfg.num_maskmem - 1) for t in tpos_list
        ]
        valid[: len(feats_list)] = True

        # object pointers: unsigned distances, visible frames only
        # (reference sam2_base_dam4sam.py:712-741)
        C = cfg.hidden_dim
        ptr_cap = cfg.max_obj_ptrs_in_encoder
        ptrs_list, pos_list = [], []
        if cfg.use_obj_ptrs_in_encoder:
            max_obj_ptrs = min(num_frames, cfg.max_obj_ptrs_in_encoder)
            ptr_cond = {
                t: out
                for t, out in selected_cond.items()
                if (t >= frame_idx if reverse else t <= frame_idx)
            } if cfg.only_obj_ptrs_in_the_past_for_eval else selected_cond
            for t, out in ptr_cond.items():
                pos_list.append(abs(frame_idx - t))
                ptrs_list.append(out["obj_ptr"])
            for t_diff in range(1, max_obj_ptrs):
                t = frame_idx + t_diff if reverse else frame_idx - t_diff
                if t < 0 or (num_frames is not None and t >= num_frames):
                    break
                out = non_cond.get(t, unselected_cond.get(t))
                if self._visible(out):
                    pos_list.append(t_diff)
                    ptrs_list.append(out["obj_ptr"])
            t_diff_max = max(max_obj_ptrs - 1, 1)
        else:
            t_diff_max = 1

        # no TOTAL pointer cap in the reference (DRM pointers + up to
        # max_obj_ptrs-1 RAM pointers, sam2_base_dam4sam.py:713-745): grow the
        # padded capacity in buckets of 8 instead of truncating
        if len(ptrs_list) > ptr_cap:
            ptr_cap = -(-len(ptrs_list) // 8) * 8
        ptr_pos = np.zeros((ptr_cap,), np.float32)
        ptr_valid = np.zeros((ptr_cap,), bool)
        zero_ptr = self._zero_ptr_slot(C)
        ptrs = tuple(
            ptrs_list[i] if i < len(ptrs_list) else zero_ptr
            for i in range(ptr_cap)
        )
        ptr_pos[: len(pos_list)] = [pp / t_diff_max for pp in pos_list]
        ptr_valid[: len(ptrs_list)] = True

        return vc.MemoryInput(
            feats=mem_feats,
            tpos_idx=tpos_idx[None],
            valid=valid[None],
            ptrs=ptrs,
            ptr_pos=ptr_pos[None],
            ptr_valid=ptr_valid[None],
        )

    def reset_state(self, inference_state):
        super().reset_state(inference_state)
        # reference clears the DRM-promotion bookkeeping on reset
        # (sam2_video_predictor_dam4sam.py:1057,1071)
        inference_state.get("adds_in_drm_per_obj", {}).clear()

    def add_to_drm(self, inference_state, frame_idx, obj_id):
        """Promote an already-tracked frame into the DRM (conditioning) part
        of the memory (reference :434-466). The frame's stored output —
        including its already-encoded memory — becomes a cond frame at the
        next preflight."""
        obj_idx = self._obj_id_to_idx(inference_state, obj_id)
        inference_state["mask_inputs_per_obj"][obj_idx].pop(frame_idx, None)
        inference_state.setdefault("adds_in_drm_per_obj", {}).setdefault(
            obj_idx, []
        ).append(frame_idx)

        obj_out = inference_state["output_dict_per_obj"][obj_idx]
        out = obj_out["non_cond_frame_outputs"].get(frame_idx)
        if out is None:
            out = obj_out["cond_frame_outputs"].get(frame_idx)
        if out is None:
            raise RuntimeError(
                f"frame {frame_idx} has no tracked output for object "
                f"{obj_id}; run propagate_in_video past it first"
            )
        temp = inference_state["temp_output_dict_per_obj"][obj_idx]
        # the reference RE-RUNS the memory encoder on the promoted frame at
        # preflight with is_mask_from_pts=True (binarized sigmoid), instead of
        # keeping the tracked-frame memory (_consolidate_temp_output_across_obj
        # run_mem_encoder=True path, sam2_video_predictor_dam4sam.py:704-723);
        # dropping maskmem_features here makes our preflight do the same
        out = dict(out)
        out["maskmem_features"] = None
        temp["cond_frame_outputs"][frame_idx] = out

        obj_ids = inference_state["obj_ids"]
        consolidated = self._consolidate_temp_output_across_obj(
            inference_state, frame_idx, is_cond=True,
            consolidate_at_video_res=True,
        )
        _, video_res_masks = self._get_orig_video_res_output(
            inference_state, consolidated["pred_masks_video_res"]
        )
        return frame_idx, obj_ids, video_res_masks

    def propagate_in_video(self, inference_state, start_frame_idx=None,
                           max_frame_num_to_track=None, reverse=False,
                           return_all_masks=False):
        """Generator; with return_all_masks=True yields
        (frame_idx, obj_ids, video_res_masks, (all_masks, all_ious))
        (reference :837-941) for distractor analysis."""
        gen = super().propagate_in_video(
            inference_state, start_frame_idx, max_frame_num_to_track, reverse
        )
        for frame_idx, obj_ids, video_res_masks in gen:
            if not return_all_masks:
                yield frame_idx, obj_ids, video_res_masks
                continue
            extras = self._collect_all_masks(inference_state, frame_idx)
            yield frame_idx, obj_ids, video_res_masks, extras

    def _collect_all_masks(self, inference_state, frame_idx):
        """Video-res multimask slots + ious of the first object's output on
        this frame (dam4sam is single-object tracking in practice)."""
        obj_out = inference_state["output_dict_per_obj"][0]
        out = obj_out["non_cond_frame_outputs"].get(
            frame_idx, obj_out["cond_frame_outputs"].get(frame_idx)
        )
        if out is None or out.get("all_pred_masks") is None:
            return ([], np.zeros((0,), np.float32))
        all_mm = out["all_pred_masks"]  # [1, M, 256, 256]
        all_masks = []
        for m in range(all_mm.shape[1]):
            _, vm = self._get_orig_video_res_output(
                inference_state, all_mm[:, m : m + 1]
            )
            all_masks.append(vm)
        ious = np.asarray(out["ious"])[0] if out.get("ious") is not None else (
            np.zeros((all_mm.shape[1],), np.float32)
        )
        return (all_masks, ious)


def select_video_predictor_cls():
    """Env-var track switch (reference sam2_video_predictor.py:4-8)."""
    track = os.environ.get("SAM2_VERSION_TRACK", "official").lower()
    if track in ("official", ""):
        return SAM2VideoPredictor
    if track == "dam4sam":
        return SAM2VideoPredictorDAM4SAM
    if track == "legacy":
        return SAM2VideoPredictorLegacy
    raise ValueError(f"unknown SAM2_VERSION_TRACK={track!r}")
