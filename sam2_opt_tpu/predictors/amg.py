"""SAM2AutomaticMaskGenerator — dense grid prompting over the image predictor.

Produces the same annotation records as Meta's SAM2
`sam2/sam2/automatic_mask_generator.py` (Apache-2.0; see
LICENSES/LICENSE_SAM2_APACHE2) — the output schema, filtering thresholds and
crop pyramid are that algorithm — implemented here as a functional pipeline
over plain column-dict records (utils/amg.py): predict a grid chunk, apply a
sequence of row filters, deduplicate with self-contained NMS.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from sam2_opt_tpu.predictors.image import SAM2ImagePredictor
from sam2_opt_tpu.utils import amg as A


class SAM2AutomaticMaskGenerator:
    def __init__(
        self,
        model,
        points_per_side: Optional[int] = 32,
        points_per_batch: int = 64,
        pred_iou_thresh: float = 0.8,
        stability_score_thresh: float = 0.95,
        stability_score_offset: float = 1.0,
        mask_threshold: float = 0.0,
        box_nms_thresh: float = 0.7,
        crop_n_layers: int = 0,
        crop_nms_thresh: float = 0.7,
        crop_overlap_ratio: float = 512 / 1500,
        crop_n_points_downscale_factor: int = 1,
        point_grids: Optional[List[np.ndarray]] = None,
        min_mask_region_area: int = 0,
        output_mode: str = "binary_mask",
        use_m2m: bool = False,
        multimask_output: bool = True,
        **kwargs,
    ) -> None:
        assert (points_per_side is None) != (point_grids is None), (
            "Exactly one of points_per_side or point_grid must be provided."
        )
        assert output_mode in ("binary_mask", "uncompressed_rle", "coco_rle")
        self.point_grids = (
            point_grids
            if point_grids is not None
            else A.build_all_layer_point_grids(
                points_per_side, crop_n_layers, crop_n_points_downscale_factor
            )
        )
        self.predictor = (
            model
            if isinstance(model, SAM2ImagePredictor)
            else SAM2ImagePredictor(model, max_hole_area=min_mask_region_area,
                                    max_sprinkle_area=min_mask_region_area)
        )
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.mask_threshold = mask_threshold
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.min_mask_region_area = min_mask_region_area
        self.output_mode = output_mode
        self.use_m2m = use_m2m
        self.multimask_output = multimask_output

    @classmethod
    def from_pretrained(cls, model_id: str, **kwargs) -> "SAM2AutomaticMaskGenerator":
        """HuggingFace-hub loader (reference automatic_mask_generator.py:152-171).
        Like the reference, kwargs flow to BOTH build_sam2_hf and the
        constructor (each consumes what it knows and tolerates the rest)."""
        from sam2_opt_tpu.build_sam import build_sam2_hf

        model = build_sam2_hf(model_id, **kwargs)
        return cls(model, **kwargs)

    # ------------------------------------------------------------------ #
    # public API
    # ------------------------------------------------------------------ #

    def generate(self, image: np.ndarray) -> List[Dict[str, Any]]:
        """HWC uint8 image -> list of annotation records (upstream schema)."""
        data = self._all_crops(image)

        if self.output_mode == "coco_rle":
            segs = [A.coco_encode_rle(r) for r in data["rles"]]
        elif self.output_mode == "binary_mask":
            segs = [A.rle_to_mask(r) for r in data["rles"]]
        else:
            segs = data["rles"]

        return [
            {
                "segmentation": seg,
                "area": A.area_from_rle(rle),
                "bbox": A.box_xyxy_to_xywh(box).tolist(),
                "predicted_iou": float(iou),
                "point_coords": [point.tolist()],
                "stability_score": float(stab),
                "crop_box": A.box_xyxy_to_xywh(crop).tolist(),
            }
            for seg, rle, box, iou, point, stab, crop in zip(
                segs, data["rles"], data["boxes"], data["iou_preds"],
                data["points"], data["stability_score"], data["crop_boxes"],
            )
        ]

    # ------------------------------------------------------------------ #
    # pipeline stages
    # ------------------------------------------------------------------ #

    def _all_crops(self, image: np.ndarray) -> A.Records:
        orig_size = image.shape[:2]
        crop_boxes, layers = A.generate_crop_boxes(
            orig_size, self.crop_n_layers, self.crop_overlap_ratio
        )
        data = A.concat_records(
            [self._one_crop(image, box, layer, orig_size)
             for box, layer in zip(crop_boxes, layers)]
        )
        if len(crop_boxes) > 1:
            # deduplicate across crops, preferring masks from smaller crops
            crop_area = (
                (data["crop_boxes"][:, 2] - data["crop_boxes"][:, 0])
                * (data["crop_boxes"][:, 3] - data["crop_boxes"][:, 1])
            ).astype(np.float64)
            keep = A.batched_nms(
                data["boxes"], 1.0 / np.maximum(crop_area, 1),
                np.zeros(len(crop_area)), iou_threshold=self.crop_nms_thresh,
            )
            data = A.filter_records(data, keep)
        if self.min_mask_region_area > 0:
            data = self._clean_small_regions(
                data, self.min_mask_region_area,
                max(self.box_nms_thresh, self.crop_nms_thresh),
            )
        return data

    def _one_crop(self, image, crop_box, layer: int, orig_size) -> A.Records:
        x0, y0, x1, y1 = crop_box
        crop = image[y0:y1, x0:x1, :]
        crop_hw = crop.shape[:2]
        self.predictor.set_image(crop)
        grid = self.point_grids[layer] * np.asarray(crop_hw)[None, ::-1]
        try:
            chunks = [
                self._one_chunk(pts, crop_hw, crop_box, orig_size)
                for (pts,) in A.chunked(self.points_per_batch, grid)
            ]
        finally:
            self.predictor.reset_predictor()
        data = A.concat_records(chunks)

        # within-crop dedup, then lift coordinates to the full image
        keep = A.batched_nms(
            data["boxes"], data["iou_preds"],
            np.zeros(A.num_records(data)), iou_threshold=self.box_nms_thresh,
        )
        data = A.filter_records(data, keep)
        data["boxes"] = A.shift_boxes(data["boxes"], crop_box)
        data["points"] = A.shift_points(data["points"], crop_box)
        data["crop_boxes"] = np.tile(
            np.asarray(crop_box)[None], (A.num_records(data), 1)
        )
        return data

    def _one_chunk(self, points, crop_hw, crop_box, orig_size) -> A.Records:
        """Predict one chunk of grid points and run the row-filter pipeline:
        IoU threshold -> stability threshold -> binarize -> drop crop-edge
        artifacts -> encode RLE."""
        orig_h, orig_w = orig_size
        h, w = crop_hw
        points = np.asarray(points, np.float32)
        model_pts = points / np.asarray([w, h], np.float32) \
            * self.predictor.cfg.image_size
        labels = np.ones((len(points), 1), np.int32)

        mask_logits, iou_preds, low_res = self.predictor._predict(
            model_pts[:, None, :], labels,
            multimask_output=self.multimask_output, return_logits=True,
        )
        mask_logits = np.asarray(mask_logits)
        iou_preds = np.asarray(iou_preds)
        slots = mask_logits.shape[1]
        data: A.Records = {
            "masks": mask_logits.reshape(-1, *mask_logits.shape[2:]),
            "iou_preds": iou_preds.reshape(-1),
            "points": np.repeat(points, slots, axis=0),
            "low_res_masks": np.asarray(low_res).reshape(
                -1, *np.asarray(low_res).shape[2:]
            ),
        }
        if self.use_m2m:
            data = self._refine_m2m(data, crop_hw)

        if self.pred_iou_thresh > 0.0:
            data = A.filter_records(
                data, data["iou_preds"] > self.pred_iou_thresh
            )
        data["stability_score"] = A.calculate_stability_score(
            data["masks"], self.mask_threshold, self.stability_score_offset
        )
        if self.stability_score_thresh > 0.0:
            data = A.filter_records(
                data, data["stability_score"] >= self.stability_score_thresh
            )

        data["masks"] = data["masks"] > self.mask_threshold
        data["boxes"] = A.batched_mask_to_box(data["masks"])
        edge = A.touches_crop_edge(
            data["boxes"], crop_box, [0, 0, orig_w, orig_h]
        )
        if edge.any():
            data = A.filter_records(data, ~edge)

        masks_full = A.uncrop_masks(data["masks"], crop_box, orig_h, orig_w)
        data["rles"] = A.mask_to_rle(masks_full)
        del data["masks"]
        return data

    def _refine_m2m(self, data: A.Records, crop_hw) -> A.Records:
        """One refinement pass: feed each mask's low-res logits back with its
        point (single-mask output)."""
        h, w = crop_hw
        model_pts = data["points"] / np.asarray([w, h], np.float32) \
            * self.predictor.cfg.image_size
        labels = np.ones((len(model_pts), 1), np.int32)
        masks, ious = [], []
        for pts, lbl, low in A.chunked(
            self.points_per_batch, model_pts, labels, data["low_res_masks"]
        ):
            m, i, _ = self.predictor._predict(
                np.asarray(pts)[:, None, :], np.asarray(lbl),
                mask_input=np.asarray(low)[:, None],
                multimask_output=False, return_logits=True,
            )
            masks.append(np.asarray(m))
            ious.append(np.asarray(i))
        data = dict(data)
        data["masks"] = np.concatenate(masks)[:, 0]
        data["iou_preds"] = np.concatenate(ious)[:, 0]
        return data

    def _clean_small_regions(self, data: A.Records, min_area: int,
                             nms_thresh: float) -> A.Records:
        """Fill small holes / drop small islands in every mask, then NMS away
        duplicates created by the cleanup (unchanged masks win ties)."""
        if A.num_records(data) == 0:
            return data
        cleaned, untouched = [], []
        for rle in data["rles"]:
            mask = A.rle_to_mask(rle)
            mask, filled = A.remove_small_regions(mask, min_area, "holes")
            mask, dropped = A.remove_small_regions(mask, min_area, "islands")
            cleaned.append(mask)
            untouched.append(float(not (filled or dropped)))
        masks = np.stack(cleaned)
        boxes = A.batched_mask_to_box(masks)
        keep = A.batched_nms(
            boxes, np.asarray(untouched), np.zeros(len(untouched)),
            iou_threshold=nms_thresh,
        )
        rles = list(data["rles"])
        out_boxes = np.array(data["boxes"], copy=True)
        for i in keep:
            if untouched[i] == 0.0:
                rles[i] = A.mask_to_rle(masks[i][None])[0]
                out_boxes[i] = boxes[i]
        data = dict(data)
        data["rles"] = rles
        data["boxes"] = out_boxes
        return A.filter_records(data, keep)
