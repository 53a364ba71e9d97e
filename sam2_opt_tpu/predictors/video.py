"""SAM2VideoPredictor — public API parity with the reference
(sam2/sam2/sam2_video_predictor_official.py:20-1080), TPU-native execution.

State model: host-side dicts exactly mirror the reference's `inference_state`
(per-object cond/non-cond frame outputs), but every tensor is a device array —
masks at low-res fp32, memory features in bf16 (matching the reference's bf16
offload, :885-888). The per-frame hot path is two compiled XLA calls: image
encode + track step. All memory selection (frame arithmetic) stays in Python,
as in the reference — it's microseconds per frame.
"""

from __future__ import annotations

import functools
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sam2_opt_tpu.config import SAM2Config
from sam2_opt_tpu.models import sam2_base as base
from sam2_opt_tpu.models import video_core as vc
from sam2_opt_tpu.models.model import SAM2Model
from sam2_opt_tpu.io.video import load_video_frames

NO_OBJ_SCORE = base.NO_OBJ_SCORE


def _select_closest_cond_frames(frame_idx, cond_frame_outputs, max_cond_frame_num):
    """reference sam2_utils.select_closest_cond_frames (sam2_utils.py:19-61)."""
    if max_cond_frame_num == -1 or len(cond_frame_outputs) <= max_cond_frame_num:
        return cond_frame_outputs, {}
    assert max_cond_frame_num >= 2
    selected = {}
    idx_before = max((t for t in cond_frame_outputs if t < frame_idx), default=None)
    if idx_before is not None:
        selected[idx_before] = cond_frame_outputs[idx_before]
    idx_after = min((t for t in cond_frame_outputs if t >= frame_idx), default=None)
    if idx_after is not None:
        selected[idx_after] = cond_frame_outputs[idx_after]
    num_remain = max_cond_frame_num - len(selected)
    inds_remain = sorted(
        (t for t in cond_frame_outputs if t not in selected),
        key=lambda x: abs(x - frame_idx),
    )[:num_remain]
    selected.update((t, cond_frame_outputs[t]) for t in inds_remain)
    unselected = {t: v for t, v in cond_frame_outputs.items() if t not in selected}
    return selected, unselected


def make_cond_track_fn(cfg: SAM2Config, mesh, static: dict,
                       keep_multimasks: bool = False):
    """The production memory-conditioned track-step function (jittable).

    Module-level so the compile-only mesh tests can lower/compile the EXACT
    graph `_track_jit("cond")` dispatches at production shapes
    (1024², 7 memory slots, 64 pointer tokens) without building a predictor.
    """

    def fn(p, feats, mem, coords, labels, mask_inputs, prev_logits):
        B = mem.tpos_idx.shape[0]
        f0, f1, f2 = feats
        if B > 1 and f2.shape[0] == 1:
            # object-batched tracking: one shared frame encode,
            # memory/heads batched over objects (the reference loops
            # objects at batch 1; batching is the TPU win)
            f0 = jnp.repeat(f0, B, axis=0)
            f1 = jnp.repeat(f1, B, axis=0)
            f2 = jnp.repeat(f2, B, axis=0)
        if mesh is not None and B % mesh.shape["data"] == 0:
            # object-DP over the mesh: GSPMD propagates this
            # constraint through memory attention / SAM heads /
            # memory encoder
            from jax.sharding import NamedSharding, PartitionSpec

            sh = NamedSharding(
                mesh, PartitionSpec("data", None, None, None)
            )
            f0, f1, f2 = (
                jax.lax.with_sharding_constraint(f, sh)
                for f in (f0, f1, f2)
            )
        return vc.track_step_conditioned(
            p, cfg, (f0, f1, f2), mem, coords, labels, prev_logits,
            multimask_output=static["multimask"],
            run_mem_encoder=static["run_mem_encoder"],
            fill_hole_area=static["fill_hole_area"],
            keep_multimasks=keep_multimasks and static["multimask"],
            mask_inputs=mask_inputs,
        )

    return fn


class SAM2VideoPredictor:
    def __init__(
        self,
        sam_model: SAM2Model,
        fill_hole_area: int = 8,
        non_overlap_masks: bool = False,
        clear_non_cond_mem_around_input: bool = False,
        add_all_frames_to_correct_as_cond: bool = False,
        sync_per_frame: Optional[bool] = None,
        mesh=None,
        **kwargs,
    ):
        self.model = sam_model
        if mesh is not None:
            # Multi-chip SPMD video inference (beyond reference parity — the
            # reference is single-GPU): params follow the TP rule
            # (parallel/mesh.py) and the object-batched tracking step shards
            # objects over the "data" axis (see _track_jit "cond"), so
            # memory attention + SAM heads + memory encoder run
            # object-parallel with XLA-inserted collectives.
            self.model.shard(mesh)
        self.fill_hole_area = fill_hole_area
        self.non_overlap_masks = non_overlap_masks
        self.clear_non_cond_mem_around_input = clear_non_cond_mem_around_input
        self.add_all_frames_to_correct_as_cond = add_all_frames_to_correct_as_cond
        # Synchronize per-frame outputs before dispatching the next frame.
        # Costs pipelining (dispatch of frame t+1 could overlap the fetch of
        # mask t), but bounds the async dispatch queue — required on
        # remote-attached relay backends (axon), which fail under deep
        # in-flight queues. Default: sync only on such backends; healthy
        # local backends pipeline. Override via kwarg or
        # SAM2_TPU_SYNC_PER_FRAME=0/1.
        import os as _os

        if sync_per_frame is None:
            env = _os.environ.get("SAM2_TPU_SYNC_PER_FRAME")
            if env is not None:
                sync_per_frame = env not in ("0", "false", "False")
            else:
                try:
                    platform = jax.devices()[0].platform
                except Exception:
                    platform = "cpu"
                sync_per_frame = platform not in ("cpu", "tpu", "gpu")
        self.sync_per_frame = sync_per_frame
        # When syncing (relay backends), block only every Nth dispatch: this
        # bounds the in-flight queue (the flake trigger) while amortizing the
        # relay round trips. Measured on the axon relay, hiera-T: sync every
        # frame 396 ms/frame wall-clock, fully pipelined 47 ms/frame;
        # sync_every=4 keeps most of the pipelining win (doc/benchmark.md).
        self.sync_every = max(int(_os.environ.get("SAM2_TPU_SYNC_EVERY", "4")), 1)
        self._dispatch_count = 0
        # video predictors binarize click-frame masks for the memory encoder
        # (reference build_sam.py:110-131 override)
        if not self.cfg.binarize_mask_from_pts_for_mem_enc:
            import dataclasses

            self.model.cfg = dataclasses.replace(
                self.cfg, binarize_mask_from_pts_for_mem_enc=True
            )

    @property
    def cfg(self) -> SAM2Config:
        return self.model.cfg

    @classmethod
    def from_pretrained(cls, model_id: str, **kwargs) -> "SAM2VideoPredictor":
        """HF-hub loader (reference sam2_video_predictor_official.py:207-222);
        kwargs flow to both build_sam2_hf and the constructor like the
        reference."""
        from sam2_opt_tpu.build_sam import build_sam2_hf

        kwargs.setdefault("fill_hole_area", 8)
        return cls(build_sam2_hf(model_id, **kwargs), **kwargs)

    @property
    def image_size(self) -> int:
        return self.cfg.image_size

    @property
    def num_maskmem(self) -> int:
        return self.cfg.num_maskmem

    @property
    def memory_temporal_stride_for_eval(self) -> int:
        return self.cfg.memory_temporal_stride_for_eval

    def speedup(self, backend: str = "xla", use_cache: bool = True,
                model_root_path=None, dtype=jnp.bfloat16,
                calib_dir=None, activation_quant: bool = True,
                quant_scope: str = "encoder"):
        """One-line acceleration (reference :45-145): compiles encoder + memory
        attention + heads to XLA and warms up the hot shapes. backend "int8"
        additionally quantizes the image-encoder linears (weight-only, or
        activation-quant with `calib_dir`) — by default the tracking
        head/memory path stays bf16, mirroring the reference's encoder-only
        TRT int8 engines (quant_image_encoder.py); quant_scope="tracking"
        extends int8 to the memory-attention and SAM-transformer linears
        (beyond reference; calibration then drives the full track step)."""
        self.model.speedup(
            backend=backend, use_cache=use_cache, dtype=dtype,
            model_root_path=model_root_path, calib_dir=calib_dir,
            activation_quant=activation_quant, quant_scope=quant_scope,
        )

    def set_runtime_backend(self, backend="eager", args=None):
        self.model.set_runtime_backend(backend, args)

    def release(self):
        self.model.set_runtime_backend("eager")

    # ------------------------------------------------------------------ #
    # state init
    # ------------------------------------------------------------------ #

    def init_state(self, video_path, offload_video_to_cpu: bool = False,
                   offload_state_to_cpu: bool = False,
                   async_loading_frames: bool = False):
        """Initialize an inference state (reference :147-205)."""
        frames, video_height, video_width = load_video_frames(
            video_path=video_path,
            image_size=self.image_size,
            offload_video_to_cpu=offload_video_to_cpu,
            async_loading_frames=async_loading_frames,
        )
        inference_state = {
            "images": frames,
            "num_frames": len(frames),
            "offload_video_to_cpu": offload_video_to_cpu,
            "offload_state_to_cpu": offload_state_to_cpu,
            "video_height": video_height,
            "video_width": video_width,
            "point_inputs_per_obj": {},
            "mask_inputs_per_obj": {},
            "cached_features": {},
            "constants": {},
            "obj_id_to_idx": OrderedDict(),
            "obj_idx_to_id": OrderedDict(),
            "obj_ids": [],
            "output_dict_per_obj": {},
            "temp_output_dict_per_obj": {},
            "frames_tracked_per_obj": {},
        }
        # Warm up the visual backbone and cache frame 0's features (:204)
        self._get_image_feature(inference_state, frame_idx=0)
        return inference_state

    # ------------------------------------------------------------------ #
    # object bookkeeping (reference :224-264)
    # ------------------------------------------------------------------ #

    def _obj_id_to_idx(self, inference_state, obj_id):
        obj_idx = inference_state["obj_id_to_idx"].get(obj_id, None)
        if obj_idx is not None:
            return obj_idx
        obj_idx = len(inference_state["obj_id_to_idx"])
        inference_state["obj_id_to_idx"][obj_id] = obj_idx
        inference_state["obj_idx_to_id"][obj_idx] = obj_id
        inference_state["obj_ids"] = list(inference_state["obj_id_to_idx"])
        inference_state["point_inputs_per_obj"][obj_idx] = {}
        inference_state["mask_inputs_per_obj"][obj_idx] = {}
        inference_state["output_dict_per_obj"][obj_idx] = {
            "cond_frame_outputs": {},
            "non_cond_frame_outputs": {},
        }
        inference_state["temp_output_dict_per_obj"][obj_idx] = {
            "cond_frame_outputs": {},
            "non_cond_frame_outputs": {},
        }
        inference_state["frames_tracked_per_obj"][obj_idx] = {}
        return obj_idx

    def _obj_idx_to_id(self, inference_state, obj_idx):
        return inference_state["obj_idx_to_id"][obj_idx]

    def _get_obj_num(self, inference_state):
        return len(inference_state["obj_idx_to_id"])

    # ------------------------------------------------------------------ #
    # features
    # ------------------------------------------------------------------ #

    def _get_image_feature(self, inference_state, frame_idx):
        """Encode one frame with a 1-frame LRU cache (reference :810-841).
        Returns (hrf0, hrf1, embed) NHWC batch-1 device arrays."""
        cached = inference_state["cached_features"].get(frame_idx)
        if cached is not None:
            return cached
        img = inference_state["images"][frame_idx]
        x = jnp.asarray(img, jnp.float32)[None] / 255.0
        feats = self.model.encode_image(x)
        inference_state["cached_features"] = {frame_idx: feats}
        return feats

    # ------------------------------------------------------------------ #
    # prompts
    # ------------------------------------------------------------------ #

    def add_new_points_or_box(
        self,
        inference_state,
        frame_idx,
        obj_id,
        points=None,
        labels=None,
        clear_old_points=True,
        normalize_coords=True,
        box=None,
    ):
        """Add click/box prompts on a frame (reference :266-399)."""
        obj_idx = self._obj_id_to_idx(inference_state, obj_id)
        point_inputs_per_frame = inference_state["point_inputs_per_obj"][obj_idx]
        mask_inputs_per_frame = inference_state["mask_inputs_per_obj"][obj_idx]

        if (points is not None) != (labels is not None):
            raise ValueError("points and labels must be provided together")
        if points is None and box is None:
            raise ValueError("at least one of points or box must be provided as input")

        points = (
            np.zeros((0, 2), np.float32) if points is None
            else np.asarray(points, np.float32)
        )
        labels = (
            np.zeros((0,), np.int32) if labels is None
            else np.asarray(labels, np.int32)
        )
        if points.ndim == 2:
            points = points[None]
        if labels.ndim == 1:
            labels = labels[None]
        if box is not None:
            if not clear_old_points:
                raise ValueError(
                    "cannot add box without clearing old points (use "
                    "clear_old_points=True)"
                )
            box_coords = np.asarray(box, np.float32).reshape(1, 2, 2)
            box_labels = np.asarray([[2, 3]], np.int32)
            points = np.concatenate([box_coords, points], axis=1)
            labels = np.concatenate([box_labels, labels], axis=1)

        if normalize_coords:
            video_wh = np.asarray(
                [inference_state["video_width"], inference_state["video_height"]],
                np.float32,
            )
            points = points / video_wh
        points = points * self.image_size

        if not clear_old_points:
            prev = point_inputs_per_frame.get(frame_idx)
            if prev is not None:
                points = np.concatenate([prev["point_coords"], points], axis=1)
                labels = np.concatenate([prev["point_labels"], labels], axis=1)
        point_inputs = {"point_coords": points, "point_labels": labels}
        point_inputs_per_frame[frame_idx] = point_inputs
        mask_inputs_per_frame.pop(frame_idx, None)

        obj_frames_tracked = inference_state["frames_tracked_per_obj"][obj_idx]
        is_init_cond_frame = frame_idx not in obj_frames_tracked
        reverse = (
            False if is_init_cond_frame else obj_frames_tracked[frame_idx]["reverse"]
        )
        obj_output_dict = inference_state["output_dict_per_obj"][obj_idx]
        obj_temp_output_dict = inference_state["temp_output_dict_per_obj"][obj_idx]
        is_cond = is_init_cond_frame or self.add_all_frames_to_correct_as_cond
        storage_key = "cond_frame_outputs" if is_cond else "non_cond_frame_outputs"

        # feed back previously predicted low-res logits with new clicks (:353-368)
        prev_sam_mask_logits = None
        prev_out = obj_temp_output_dict[storage_key].get(frame_idx)
        if prev_out is None:
            prev_out = obj_output_dict["cond_frame_outputs"].get(frame_idx)
        if prev_out is None:
            prev_out = obj_output_dict["non_cond_frame_outputs"].get(frame_idx)
        if prev_out is not None and prev_out.get("pred_masks") is not None:
            prev_sam_mask_logits = jnp.clip(prev_out["pred_masks"], -32.0, 32.0)

        current_out = self._run_single_frame_inference(
            inference_state=inference_state,
            output_dict=obj_output_dict,
            frame_idx=frame_idx,
            is_init_cond_frame=is_init_cond_frame,
            point_inputs=point_inputs,
            mask_inputs=None,
            reverse=reverse,
            run_mem_encoder=False,
            prev_sam_mask_logits=prev_sam_mask_logits,
        )
        obj_temp_output_dict[storage_key][frame_idx] = current_out

        obj_ids = inference_state["obj_ids"]
        consolidated_out = self._consolidate_temp_output_across_obj(
            inference_state, frame_idx, is_cond=is_cond,
            consolidate_at_video_res=True,
        )
        _, video_res_masks = self._get_orig_video_res_output(
            inference_state, consolidated_out["pred_masks_video_res"]
        )
        return frame_idx, obj_ids, video_res_masks

    add_new_points = add_new_points_or_box

    def add_new_mask(self, inference_state, frame_idx, obj_id, mask):
        """Add a binary mask prompt (reference :405-487)."""
        obj_idx = self._obj_id_to_idx(inference_state, obj_id)
        mask = np.asarray(mask)
        assert mask.ndim == 2
        mask_inputs = jnp.asarray(mask, jnp.float32)[None, None]  # [1,1,H,W]
        if mask.shape != (self.image_size, self.image_size):
            mask_inputs = base.resize_hw(
                mask_inputs, (self.image_size, self.image_size), "bilinear",
                antialias=True,
            )
            mask_inputs = (mask_inputs >= 0.5).astype(jnp.float32)

        inference_state["mask_inputs_per_obj"][obj_idx][frame_idx] = mask_inputs
        inference_state["point_inputs_per_obj"][obj_idx].pop(frame_idx, None)
        obj_frames_tracked = inference_state["frames_tracked_per_obj"][obj_idx]
        is_init_cond_frame = frame_idx not in obj_frames_tracked
        reverse = (
            False if is_init_cond_frame else obj_frames_tracked[frame_idx]["reverse"]
        )
        obj_output_dict = inference_state["output_dict_per_obj"][obj_idx]
        obj_temp_output_dict = inference_state["temp_output_dict_per_obj"][obj_idx]
        is_cond = is_init_cond_frame or self.add_all_frames_to_correct_as_cond
        storage_key = "cond_frame_outputs" if is_cond else "non_cond_frame_outputs"

        current_out = self._run_single_frame_inference(
            inference_state=inference_state,
            output_dict=obj_output_dict,
            frame_idx=frame_idx,
            is_init_cond_frame=is_init_cond_frame,
            point_inputs=None,
            mask_inputs=mask_inputs,
            reverse=reverse,
            run_mem_encoder=False,
        )
        obj_temp_output_dict[storage_key][frame_idx] = current_out

        obj_ids = inference_state["obj_ids"]
        consolidated_out = self._consolidate_temp_output_across_obj(
            inference_state, frame_idx, is_cond=is_cond,
            consolidate_at_video_res=True,
        )
        _, video_res_masks = self._get_orig_video_res_output(
            inference_state, consolidated_out["pred_masks_video_res"]
        )
        return frame_idx, obj_ids, video_res_masks

    # ------------------------------------------------------------------ #
    # outputs
    # ------------------------------------------------------------------ #

    def _get_orig_video_res_output(self, inference_state, any_res_masks):
        """Resize to the original video resolution (+ optional non-overlap
        constraint) — reference :489-509. Compiled per (input, output) shape."""
        video_h = inference_state["video_height"]
        video_w = inference_state["video_width"]
        if any_res_masks.shape[-2:] == (video_h, video_w):
            video_res_masks = any_res_masks
        else:
            key = ("video_res", any_res_masks.shape, video_h, video_w,
                   self.non_overlap_masks)
            fn = self.model._jit_fns.get(key)
            if fn is None:
                non_overlap = self.non_overlap_masks

                @jax.jit
                def fn(m):
                    out = base.resize_hw(m, (video_h, video_w), "bilinear")
                    if non_overlap:
                        out = base.apply_non_overlapping_constraints(out)
                    return out

                self.model._jit_fns[key] = fn
            video_res_masks = fn(any_res_masks)
            return any_res_masks, video_res_masks
        if self.non_overlap_masks:
            video_res_masks = base.apply_non_overlapping_constraints(video_res_masks)
        return any_res_masks, video_res_masks

    def _consolidate_temp_output_across_obj(self, inference_state, frame_idx,
                                            is_cond, consolidate_at_video_res=False):
        """reference :511-583."""
        batch_size = self._get_obj_num(inference_state)
        storage_key = "cond_frame_outputs" if is_cond else "non_cond_frame_outputs"
        if consolidate_at_video_res:
            consolidated_H = inference_state["video_height"]
            consolidated_W = inference_state["video_width"]
            consolidated_mask_key = "pred_masks_video_res"
        else:
            consolidated_H = consolidated_W = self.image_size // 4
            consolidated_mask_key = "pred_masks"

        masks = []
        for obj_idx in range(batch_size):
            obj_temp = inference_state["temp_output_dict_per_obj"][obj_idx]
            obj_out = inference_state["output_dict_per_obj"][obj_idx]
            out = obj_temp[storage_key].get(frame_idx)
            if out is None:
                out = obj_out["cond_frame_outputs"].get(frame_idx)
            if out is None:
                out = obj_out["non_cond_frame_outputs"].get(frame_idx)
            if out is None:
                masks.append(
                    jnp.full(
                        (1, 1, consolidated_H, consolidated_W), NO_OBJ_SCORE,
                        jnp.float32,
                    )
                )
                continue
            obj_mask = out["pred_masks"]
            if obj_mask.shape[-2:] != (consolidated_H, consolidated_W):
                obj_mask = base.resize_hw(
                    obj_mask, (consolidated_H, consolidated_W), "bilinear"
                )
            masks.append(obj_mask)
        return {consolidated_mask_key: jnp.concatenate(masks, axis=0)}

    # ------------------------------------------------------------------ #
    # propagation
    # ------------------------------------------------------------------ #

    def propagate_in_video_preflight(self, inference_state):
        """Consolidate temp outputs, lazily run the memory encoder on clicked
        frames (reference :585-649)."""
        batch_size = self._get_obj_num(inference_state)
        if batch_size == 0:
            raise RuntimeError(
                "No input points or masks are provided for any object; "
                "please add inputs first."
            )
        for obj_idx in range(batch_size):
            obj_output_dict = inference_state["output_dict_per_obj"][obj_idx]
            obj_temp_output_dict = inference_state["temp_output_dict_per_obj"][obj_idx]
            for is_cond in (False, True):
                storage_key = (
                    "cond_frame_outputs" if is_cond else "non_cond_frame_outputs"
                )
                for frame_idx, out in obj_temp_output_dict[storage_key].items():
                    if out.get("maskmem_features") is None:
                        high_res_masks = base.resize_hw(
                            out["pred_masks"],
                            (self.image_size, self.image_size),
                            "bilinear",
                        )
                        out["maskmem_features"] = self._run_memory_encoder(
                            inference_state, frame_idx, high_res_masks,
                            out["object_score_logits"], is_mask_from_pts=True,
                        )
                    obj_output_dict[storage_key][frame_idx] = out
                    if self.clear_non_cond_mem_around_input:
                        self._clear_obj_non_cond_mem_around_input(
                            inference_state, frame_idx, obj_idx
                        )
                obj_temp_output_dict[storage_key].clear()

            if len(obj_output_dict["cond_frame_outputs"]) == 0:
                obj_id = self._obj_idx_to_id(inference_state, obj_idx)
                raise RuntimeError(
                    f"No input points or masks are provided for object id "
                    f"{obj_id}; please add inputs first."
                )
            for frame_idx in obj_output_dict["cond_frame_outputs"]:
                obj_output_dict["non_cond_frame_outputs"].pop(frame_idx, None)

    def propagate_in_video(self, inference_state, start_frame_idx=None,
                           max_frame_num_to_track=None, reverse=False):
        """Per-frame propagation generator (reference :651-736)."""
        self.propagate_in_video_preflight(inference_state)

        obj_ids = inference_state["obj_ids"]
        num_frames = inference_state["num_frames"]
        batch_size = self._get_obj_num(inference_state)

        if start_frame_idx is None:
            start_frame_idx = min(
                t
                for obj_output_dict in inference_state["output_dict_per_obj"].values()
                for t in obj_output_dict["cond_frame_outputs"]
            )
        if max_frame_num_to_track is None:
            max_frame_num_to_track = num_frames
        if reverse:
            end_frame_idx = max(start_frame_idx - max_frame_num_to_track, 0)
            processing_order = (
                range(start_frame_idx, end_frame_idx - 1, -1)
                if start_frame_idx > 0
                else []
            )
        else:
            end_frame_idx = min(start_frame_idx + max_frame_num_to_track, num_frames - 1)
            processing_order = range(start_frame_idx, end_frame_idx + 1)

        for frame_idx in processing_order:
            pred_masks_per_obj = [None] * batch_size
            to_track = []
            for obj_idx in range(batch_size):
                obj_output_dict = inference_state["output_dict_per_obj"][obj_idx]
                if frame_idx in obj_output_dict["cond_frame_outputs"]:
                    current_out = obj_output_dict["cond_frame_outputs"][frame_idx]
                    pred_masks_per_obj[obj_idx] = current_out["pred_masks"]
                    if self.clear_non_cond_mem_around_input:
                        self._clear_obj_non_cond_mem_around_input(
                            inference_state, frame_idx, obj_idx
                        )
                else:
                    to_track.append(obj_idx)

            # object-batched tracking: one compiled call for all objects that
            # need this frame (the reference runs them one-by-one at B=1)
            batched_outs = None
            if len(to_track) > 1:
                batched_outs = self._run_batched_frame_inference(
                    inference_state, to_track, frame_idx, reverse
                )
            if batched_outs is not None:
                for obj_idx, current_out in zip(to_track, batched_outs):
                    inference_state["output_dict_per_obj"][obj_idx][
                        "non_cond_frame_outputs"
                    ][frame_idx] = current_out
                    pred_masks_per_obj[obj_idx] = current_out["pred_masks"]
            else:
                for obj_idx in to_track:
                    obj_output_dict = inference_state["output_dict_per_obj"][obj_idx]
                    current_out = self._run_single_frame_inference(
                        inference_state=inference_state,
                        output_dict=obj_output_dict,
                        frame_idx=frame_idx,
                        is_init_cond_frame=False,
                        point_inputs=None,
                        mask_inputs=None,
                        reverse=reverse,
                        run_mem_encoder=True,
                    )
                    obj_output_dict["non_cond_frame_outputs"][frame_idx] = current_out
                    pred_masks_per_obj[obj_idx] = current_out["pred_masks"]
            for obj_idx in range(batch_size):
                inference_state["frames_tracked_per_obj"][obj_idx][frame_idx] = {
                    "reverse": reverse
                }

            if len(pred_masks_per_obj) > 1:
                all_pred_masks = jnp.concatenate(pred_masks_per_obj, axis=0)
            else:
                all_pred_masks = pred_masks_per_obj[0]
            _, video_res_masks = self._get_orig_video_res_output(
                inference_state, all_pred_masks
            )
            yield frame_idx, obj_ids, video_res_masks

    # ------------------------------------------------------------------ #
    # single-frame inference
    # ------------------------------------------------------------------ #

    def _use_multimask(self, is_init_cond_frame, point_inputs):
        """reference sam2_base_official.py:1181-1189."""
        cfg = self.cfg
        num_pts = (
            0 if point_inputs is None else point_inputs["point_labels"].shape[1]
        )
        return (
            cfg.multimask_output_in_sam
            and (is_init_cond_frame or cfg.multimask_output_for_tracking)
            and (cfg.multimask_min_pt_num <= num_pts <= cfg.multimask_max_pt_num)
        )

    def _gather_memory(self, inference_state, output_dict, frame_idx, reverse):
        """Host-side memory selection (reference :822-948): pick <=num_maskmem
        spatial memories and <=max_obj_ptrs pointers, pad to fixed capacity.
        Returns a vc.MemoryInput of device arrays."""
        cfg = self.cfg
        num_frames = inference_state["num_frames"]
        tpos_sign_mul = -1 if reverse else 1
        cond_outputs = output_dict["cond_frame_outputs"]
        selected_cond, unselected_cond = _select_closest_cond_frames(
            frame_idx, cond_outputs, cfg.max_cond_frames_in_attn
        )
        t_pos_and_prevs = [(0, out) for out in selected_cond.values()]
        stride = cfg.memory_temporal_stride_for_eval
        for t_pos in range(1, cfg.num_maskmem):
            t_rel = cfg.num_maskmem - t_pos
            if t_rel == 1:
                prev_frame_idx = frame_idx - t_rel if not reverse else frame_idx + t_rel
            else:
                if not reverse:
                    prev_frame_idx = ((frame_idx - 2) // stride) * stride
                    prev_frame_idx = prev_frame_idx - (t_rel - 2) * stride
                else:
                    prev_frame_idx = -(-(frame_idx + 2) // stride) * stride
                    prev_frame_idx = prev_frame_idx + (t_rel - 2) * stride
            out = output_dict["non_cond_frame_outputs"].get(prev_frame_idx)
            if out is None:
                out = unselected_cond.get(prev_frame_idx)
            t_pos_and_prevs.append((t_pos, out))

        feats_list, tpos_list = [], []
        for t_pos, prev in t_pos_and_prevs:
            if prev is None:
                continue
            feats_list.append(prev["maskmem_features"])  # [1,64,64,mem_dim] bf16
            tpos_list.append(cfg.num_maskmem - t_pos - 1)

        # fixed capacity = num_maskmem (one compiled graph for the whole video;
        # rarely, >num_maskmem cond frames can exceed it -> a second bucket)
        n = max(len(feats_list), 1)
        cap = cfg.num_maskmem if n <= cfg.num_maskmem else n
        D = cfg.mem_dim
        tpos_idx = np.zeros((cap,), np.int32)
        valid = np.zeros((cap,), bool)
        zero_slot = self._zero_mem_slot(D)
        mem_feats = tuple(
            feats_list[i] if i < len(feats_list) else zero_slot for i in range(cap)
        )
        tpos_idx[: len(tpos_list)] = tpos_list
        valid[: len(feats_list)] = True

        # object pointers (reference :886-948)
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
                pos_list.append(
                    (frame_idx - t) * tpos_sign_mul
                    if cfg.use_signed_tpos_enc_to_obj_ptrs
                    else abs(frame_idx - t)
                )
                ptrs_list.append(out["obj_ptr"])
            for t_diff in range(1, max_obj_ptrs):
                t = frame_idx + t_diff if reverse else frame_idx - t_diff
                if t < 0 or (num_frames is not None and t >= num_frames):
                    break
                out = output_dict["non_cond_frame_outputs"].get(
                    t, unselected_cond.get(t)
                )
                if out is not None:
                    pos_list.append(t_diff)
                    ptrs_list.append(out["obj_ptr"])
            t_diff_max = max(max_obj_ptrs - 1, 1)
        else:
            t_diff_max = 1

        # The reference has no TOTAL pointer cap: cond-frame pointers plus up
        # to (max_obj_ptrs - 1) non-cond pointers can exceed
        # max_obj_ptrs_in_encoder when there are >=2 past cond frames
        # (sam2_base_official.py:886-948). Grow the padded capacity (in
        # buckets of 8 to bound recompiles) instead of silently truncating.
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

        # host numpy for the small fields (single H2D at jit-call time);
        # device arrays stay as tuples, stacked inside the compiled graph
        return vc.MemoryInput(
            feats=mem_feats,
            tpos_idx=tpos_idx[None],
            valid=valid[None],
            ptrs=ptrs,
            ptr_pos=ptr_pos[None],
            ptr_valid=ptr_valid[None],
        )

    @staticmethod
    def _stack_memory(mems):
        """Combine per-object MemoryInputs (B=1 each) into one batched input.
        Device slots become nested tuples (concatenated INSIDE the jit); the
        small index fields are numpy-stacked on host."""
        S = len(mems[0].feats)
        P = len(mems[0].ptrs)
        return vc.MemoryInput(
            feats=tuple(tuple(m.feats[i] for m in mems) for i in range(S)),
            tpos_idx=np.concatenate([m.tpos_idx for m in mems], axis=0),
            valid=np.concatenate([m.valid for m in mems], axis=0),
            ptrs=tuple(tuple(m.ptrs[i] for m in mems) for i in range(P)),
            ptr_pos=np.concatenate([m.ptr_pos for m in mems], axis=0),
            ptr_valid=np.concatenate([m.ptr_valid for m in mems], axis=0),
        )

    def _zero_mem_slot(self, D):
        g = self.cfg.image_embedding_size
        slot = getattr(self, "_zero_mem", None)
        if slot is None or slot.shape[-1] != D or slot.shape[1] != g:
            slot = jnp.zeros((1, g, g, D), jnp.bfloat16)
            self._zero_mem = slot
        return slot

    def _zero_ptr_slot(self, C):
        slot = getattr(self, "_zero_ptr", None)
        if slot is None or slot.shape[-1] != C:
            slot = jnp.zeros((1, C), jnp.float32)
            self._zero_ptr = slot
        return slot

    def _track_jit(self, kind: str, **static):
        """Build/cache a jitted track-step variant."""
        key = (kind, getattr(self, "keep_multimasks", False),
               tuple(sorted(static.items())))
        fns = self.model._jit_fns
        if key in fns:
            return fns[key]
        cfg = self.cfg

        keep_mm = getattr(self, "keep_multimasks", False)
        if kind == "init":
            def fn(p, feats, coords, labels, mask_inputs, prev_logits):
                return vc.track_step_init(
                    p, cfg, feats,
                    coords, labels, mask_inputs, prev_logits,
                    multimask_output=static["multimask"],
                    run_mem_encoder=static["run_mem_encoder"],
                    fill_hole_area=static["fill_hole_area"],
                    keep_multimasks=keep_mm and static["multimask"],
                )
        elif kind == "cond":
            # shard() clears _jit_fns, so re-traced with the live mesh
            fn = make_cond_track_fn(
                cfg, self.model.mesh, static, keep_multimasks=keep_mm
            )
        elif kind == "memenc":
            def fn(p, embed, high_res_masks, obj_score):
                return vc.encode_memory_only(
                    p, cfg, embed, high_res_masks, obj_score,
                    is_mask_from_pts=static["is_mask_from_pts"],
                )
        else:
            raise ValueError(kind)
        jfn = jax.jit(fn)
        fns[key] = jfn
        return jfn

    def _run_single_frame_inference(
        self,
        inference_state,
        output_dict,
        frame_idx,
        is_init_cond_frame,
        point_inputs,
        mask_inputs,
        reverse,
        run_mem_encoder,
        prev_sam_mask_logits=None,
        batch_size: int = 1,
    ):
        """reference :843-909 — one compiled track step + compact output.

        Dispatch is retried on transient runtime errors: remote-attached TPU
        backends can fail sporadically under interleaved async dispatch (the
        computation itself is deterministic, so a re-dispatch is safe).
        """
        last_err = None
        for _attempt in range(4):
            try:
                return self._run_single_frame_inference_once(
                    inference_state, output_dict, frame_idx, is_init_cond_frame,
                    point_inputs, mask_inputs, reverse, run_mem_encoder,
                    prev_sam_mask_logits, batch_size,
                )
            except Exception as e:  # pragma: no cover - backend flake path
                if not self._is_transient_backend_error(e):
                    raise
                last_err = e
                if _attempt < 3:
                    import time

                    time.sleep(2.0 * (_attempt + 1))
        raise last_err

    @staticmethod
    def _is_transient_backend_error(e: Exception) -> bool:
        """Relay-backend flake signatures that are safe to retry (the
        computation is deterministic, so a re-dispatch is safe).
        INVALID_ARGUMENT / FAILED_PRECONDITION alone are XLA's
        programming-error codes and must re-raise immediately (a real
        shape/dtype bug must not turn into 20s of sleeps)."""
        msg = str(e)
        return (
            "TPU backend error" in msg
            or "UNAVAILABLE" in msg
            or "Socket closed" in msg
            or "Connection reset" in msg
            or "DEADLINE_EXCEEDED" in msg
        )

    def _fill_holes(self, pred_masks):
        """Shared jit-cached hole-filling call. Kept OUTSIDE the track-step
        graph: fusing the connected-components scatter into a big jit graph
        wedges D2H transfers on the relay backend (see verify skill notes)."""
        fill = self.fill_hole_area
        if fill <= 0:
            return pred_masks
        key = ("fill_holes", pred_masks.shape, fill)
        ffn = self.model._jit_fns.get(key)
        if ffn is None:
            from sam2_opt_tpu.ops.connected_components import (
                fill_holes_in_mask_scores,
            )

            ffn = jax.jit(lambda m: fill_holes_in_mask_scores(m, fill))
            self.model._jit_fns[key] = ffn
        return ffn(pred_masks)

    def _run_single_frame_inference_once(
        self,
        inference_state,
        output_dict,
        frame_idx,
        is_init_cond_frame,
        point_inputs,
        mask_inputs,
        reverse,
        run_mem_encoder,
        prev_sam_mask_logits=None,
        batch_size: int = 1,
    ):
        feats = self._get_image_feature(inference_state, frame_idx)
        assert point_inputs is None or mask_inputs is None
        multimask = self._use_multimask(is_init_cond_frame, point_inputs)
        fill = self.fill_hole_area
        p = self.model._p

        coords = labels = None
        if point_inputs is not None:
            coords = jnp.asarray(point_inputs["point_coords"], jnp.float32)
            labels = jnp.asarray(point_inputs["point_labels"], jnp.int32)

        # A GT-mask prompt bypasses memory conditioning entirely — on init AND
        # tracked frames — exactly like the reference's _use_mask_as_output
        # branch (sam2_base_official.py:1051-1058); the memoryless "init"
        # graph implements that path.
        mask_direct = (
            mask_inputs is not None and self.cfg.use_mask_input_as_output_without_sam
        )
        if is_init_cond_frame or self.cfg.num_maskmem == 0 or mask_direct:
            fn = self._track_jit(
                "init", multimask=multimask, run_mem_encoder=run_mem_encoder,
                fill_hole_area=fill,
                has_pts=coords is not None and coords.shape[1],
                has_mask=mask_inputs is not None,
                has_prev=prev_sam_mask_logits is not None,
            )
            out = fn(p, feats, coords, labels, mask_inputs, prev_sam_mask_logits)
        else:
            mem = self._gather_memory(inference_state, output_dict, frame_idx, reverse)
            fn = self._track_jit(
                "cond", multimask=multimask, run_mem_encoder=run_mem_encoder,
                fill_hole_area=fill,
                has_pts=coords is not None and coords.shape[1],
                has_mask=mask_inputs is not None,
                has_prev=prev_sam_mask_logits is not None,
                mem_cap=len(mem.feats),
            )
            out = fn(p, feats, mem, coords, labels, mask_inputs,
                     prev_sam_mask_logits)

        pred_masks = self._fill_holes(out["pred_masks"])

        compact = self._compact_output(out, pred_masks)
        if self._should_sync():
            jax.block_until_ready(
                [v for v in compact.values()
                 if v is not None and hasattr(v, "dtype")]
            )
        return compact

    def _should_sync(self) -> bool:
        if not self.sync_per_frame:
            return False
        self._dispatch_count += 1
        return self._dispatch_count % self.sync_every == 0

    def _compact_output(self, out, pred_masks):
        """Per-frame stored output (subclass hook: the dam4sam track adds
        visibility counts and multimask extras)."""
        return {
            "maskmem_features": out.get("maskmem_features"),
            "pred_masks": pred_masks,
            "obj_ptr": out["obj_ptr"],
            "object_score_logits": out["object_score_logits"],
        }

    def _run_batched_frame_inference(self, inference_state, obj_idxs,
                                     frame_idx, reverse):
        """Track several objects in one compiled call (shared frame features,
        batched memory). Returns a list of compact outputs per object, or
        None when batching is not applicable (mixed memory capacities)."""
        if self.cfg.num_maskmem == 0:
            # memoryless mode tracks through the "init" graph; the batched
            # path assumes encoded memories exist for every stored output
            return None
        feats = self._get_image_feature(inference_state, frame_idx)
        mems = [
            self._gather_memory(
                inference_state,
                inference_state["output_dict_per_obj"][i],
                frame_idx,
                reverse,
            )
            for i in obj_idxs
        ]
        if len({(len(m.feats), len(m.ptrs)) for m in mems}) != 1:
            return None
        mem = self._stack_memory(mems)
        multimask = self._use_multimask(False, None)
        fill = self.fill_hole_area
        fn = self._track_jit(
            "cond", multimask=multimask, run_mem_encoder=True,
            fill_hole_area=fill, has_pts=0, has_mask=False, has_prev=False,
            mem_cap=len(mem.feats), batched=len(obj_idxs),
        )
        last_err = None
        for _attempt in range(3):
            try:
                out = fn(self.model._p, feats, mem, None, None, None, None)
                break
            except Exception as e:  # pragma: no cover - backend flake path
                if not self._is_transient_backend_error(e):
                    raise
                last_err = e
                if _attempt < 2:
                    import time

                    time.sleep(1.0)
        else:
            raise last_err

        pred_masks = self._fill_holes(out["pred_masks"])

        if self._should_sync():
            jax.block_until_ready(
                [pred_masks, out["obj_ptr"], out["object_score_logits"],
                 out["maskmem_features"]]
            )
        results = []
        for i in range(len(obj_idxs)):
            out_i = {
                k: (v[i : i + 1] if hasattr(v, "ndim") else v)
                for k, v in out.items()
            }
            results.append(self._compact_output(out_i, pred_masks[i : i + 1]))
        return results

    def _run_memory_encoder(self, inference_state, frame_idx, high_res_masks,
                            object_score_logits, is_mask_from_pts):
        """reference :911-945."""
        feats = self._get_image_feature(inference_state, frame_idx)
        fn = self._track_jit("memenc", is_mask_from_pts=is_mask_from_pts)
        return fn(
            self.model._p, feats[2], jnp.asarray(high_res_masks),
            jnp.asarray(object_score_logits),
        )

    # ------------------------------------------------------------------ #
    # state edits (reference :738-1079)
    # ------------------------------------------------------------------ #

    def clear_all_prompts_in_frame(self, inference_state, frame_idx, obj_id,
                                   need_output=True):
        obj_idx = self._obj_id_to_idx(inference_state, obj_id)
        inference_state["point_inputs_per_obj"][obj_idx].pop(frame_idx, None)
        inference_state["mask_inputs_per_obj"][obj_idx].pop(frame_idx, None)
        temp = inference_state["temp_output_dict_per_obj"]
        temp[obj_idx]["cond_frame_outputs"].pop(frame_idx, None)
        temp[obj_idx]["non_cond_frame_outputs"].pop(frame_idx, None)
        obj_output_dict = inference_state["output_dict_per_obj"][obj_idx]
        out = obj_output_dict["cond_frame_outputs"].pop(frame_idx, None)
        if out is not None:
            obj_output_dict["non_cond_frame_outputs"][frame_idx] = out
            inference_state["frames_tracked_per_obj"][obj_idx].pop(frame_idx, None)
        if not need_output:
            return
        obj_ids = inference_state["obj_ids"]
        is_cond = any(
            frame_idx in t["cond_frame_outputs"] for t in temp.values()
        )
        consolidated_out = self._consolidate_temp_output_across_obj(
            inference_state, frame_idx, is_cond=is_cond,
            consolidate_at_video_res=True,
        )
        _, video_res_masks = self._get_orig_video_res_output(
            inference_state, consolidated_out["pred_masks_video_res"]
        )
        return frame_idx, obj_ids, video_res_masks

    def reset_state(self, inference_state):
        self._reset_tracking_results(inference_state)
        inference_state["obj_id_to_idx"].clear()
        inference_state["obj_idx_to_id"].clear()
        inference_state["obj_ids"].clear()
        inference_state["point_inputs_per_obj"].clear()
        inference_state["mask_inputs_per_obj"].clear()
        inference_state["output_dict_per_obj"].clear()
        inference_state["temp_output_dict_per_obj"].clear()
        inference_state["frames_tracked_per_obj"].clear()

    def _reset_tracking_results(self, inference_state):
        for v in inference_state["point_inputs_per_obj"].values():
            v.clear()
        for v in inference_state["mask_inputs_per_obj"].values():
            v.clear()
        for v in inference_state["output_dict_per_obj"].values():
            v["cond_frame_outputs"].clear()
            v["non_cond_frame_outputs"].clear()
        for v in inference_state["temp_output_dict_per_obj"].values():
            v["cond_frame_outputs"].clear()
            v["non_cond_frame_outputs"].clear()
        for v in inference_state["frames_tracked_per_obj"].values():
            v.clear()

    def remove_object(self, inference_state, obj_id, strict=False, need_output=True):
        """reference :972-1060."""
        old_obj_idx_to_rm = inference_state["obj_id_to_idx"].get(obj_id, None)
        updated_frames = []
        if old_obj_idx_to_rm is None:
            if not strict:
                return inference_state["obj_ids"], updated_frames
            raise RuntimeError(
                f"Cannot remove object id {obj_id} as it doesn't exist."
            )
        if len(inference_state["obj_id_to_idx"]) == 1:
            self.reset_state(inference_state)
            return inference_state["obj_ids"], updated_frames

        obj_input_frames_inds = set()
        obj_input_frames_inds.update(
            inference_state["point_inputs_per_obj"][old_obj_idx_to_rm]
        )
        obj_input_frames_inds.update(
            inference_state["mask_inputs_per_obj"][old_obj_idx_to_rm]
        )
        for frame_idx in obj_input_frames_inds:
            self.clear_all_prompts_in_frame(
                inference_state, frame_idx, obj_id, need_output=False
            )

        old_obj_ids = inference_state["obj_ids"]
        old_obj_inds = list(range(len(old_obj_ids)))
        remain_old_obj_inds = old_obj_inds.copy()
        remain_old_obj_inds.remove(old_obj_idx_to_rm)
        new_obj_ids = [old_obj_ids[i] for i in remain_old_obj_inds]
        new_obj_inds = list(range(len(new_obj_ids)))
        old_idx_to_new_idx = dict(zip(remain_old_obj_inds, new_obj_inds))
        inference_state["obj_id_to_idx"] = OrderedDict(
            zip(new_obj_ids, new_obj_inds)
        )
        inference_state["obj_idx_to_id"] = OrderedDict(
            zip(new_obj_inds, new_obj_ids)
        )
        inference_state["obj_ids"] = new_obj_ids

        def _map_keys(container):
            new_kvs = []
            for k in old_obj_inds:
                v = container.pop(k)
                if k in old_idx_to_new_idx:
                    new_kvs.append((old_idx_to_new_idx[k], v))
            container.update(new_kvs)

        _map_keys(inference_state["point_inputs_per_obj"])
        _map_keys(inference_state["mask_inputs_per_obj"])
        _map_keys(inference_state["output_dict_per_obj"])
        _map_keys(inference_state["temp_output_dict_per_obj"])
        _map_keys(inference_state["frames_tracked_per_obj"])

        if need_output:
            temp = inference_state["temp_output_dict_per_obj"]
            for frame_idx in obj_input_frames_inds:
                is_cond = any(
                    frame_idx in t["cond_frame_outputs"] for t in temp.values()
                )
                consolidated_out = self._consolidate_temp_output_across_obj(
                    inference_state, frame_idx, is_cond=is_cond,
                    consolidate_at_video_res=True,
                )
                _, video_res_masks = self._get_orig_video_res_output(
                    inference_state, consolidated_out["pred_masks_video_res"]
                )
                updated_frames.append((frame_idx, video_res_masks))
        return inference_state["obj_ids"], updated_frames

    def _clear_obj_non_cond_mem_around_input(self, inference_state, frame_idx,
                                             obj_idx):
        """reference :1062-1079."""
        r = self.memory_temporal_stride_for_eval
        frame_idx_begin = frame_idx - r * self.num_maskmem
        frame_idx_end = frame_idx + r * self.num_maskmem
        non_cond = inference_state["output_dict_per_obj"][obj_idx][
            "non_cond_frame_outputs"
        ]
        for t in range(frame_idx_begin, frame_idx_end + 1):
            non_cond.pop(t, None)
