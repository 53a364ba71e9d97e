"""AMG (automatic mask generation) utilities, numpy host-side.

Adapted from Meta's SAM2 / segment-anything `sam2/sam2/utils/amg.py`
(Apache-2.0; see LICENSES/LICENSE_SAM2_APACHE2): the MaskData columnar
store, uncompressed-RLE codec and AMG geometry keep the upstream
structure and semantics for format compatibility.

Re-design of sam2/sam2/utils/amg.py: MaskData columnar store, pycoco-style
uncompressed RLE codec, stability score, point grids, crop boxes, box/points
uncropping, batched mask->box, plus a self-contained box NMS (the reference
uses torchvision.ops.batched_nms — no torchvision dependency here).
"""

from __future__ import annotations

import math
from copy import deepcopy
from itertools import product
from typing import Any, Dict, Generator, List, Tuple

import numpy as np


class MaskData:
    """Columnar store with filtering and concatenation
    (reference amg.py:17-80)."""

    def __init__(self, **kwargs) -> None:
        for v in kwargs.values():
            assert isinstance(v, (list, np.ndarray)), (
                "MaskData only supports list and numpy arrays."
            )
        self._stats = dict(**kwargs)

    def __setitem__(self, key: str, item: Any) -> None:
        assert isinstance(item, (list, np.ndarray))
        self._stats[key] = item

    def __delitem__(self, key: str) -> None:
        del self._stats[key]

    def __getitem__(self, key: str) -> Any:
        return self._stats[key]

    def items(self):
        return self._stats.items()

    def filter(self, keep: np.ndarray) -> None:
        keep = np.asarray(keep)
        for k, v in self._stats.items():
            if v is None:
                self._stats[k] = None
            elif isinstance(v, np.ndarray):
                self._stats[k] = v[keep]
            elif isinstance(v, list) and keep.dtype == bool:
                self._stats[k] = [a for i, a in enumerate(v) if keep[i]]
            elif isinstance(v, list):
                self._stats[k] = [v[i] for i in keep]
            else:
                raise TypeError(f"MaskData key {k} has unsupported type {type(v)}.")

    def cat(self, new_stats: "MaskData") -> None:
        for k, v in new_stats.items():
            if k not in self._stats or self._stats[k] is None:
                self._stats[k] = deepcopy(v)
            elif isinstance(v, np.ndarray):
                self._stats[k] = np.concatenate([self._stats[k], v], axis=0)
            elif isinstance(v, list):
                self._stats[k] = self._stats[k] + deepcopy(v)
            else:
                raise TypeError(f"MaskData key {k} has unsupported type {type(v)}.")

    def to_numpy(self) -> None:
        for k, v in self._stats.items():
            if hasattr(v, "device"):  # jax array
                self._stats[k] = np.asarray(v)


def is_box_near_crop_edge(boxes, crop_box, orig_box, atol: float = 20.0):
    """reference amg.py:82-93."""
    crop = np.asarray(crop_box, np.float32)
    orig = np.asarray(orig_box, np.float32)
    boxes = uncrop_boxes_xyxy(np.asarray(boxes, np.float32), crop_box)
    near_crop = np.isclose(boxes, crop[None], atol=atol, rtol=0)
    near_image = np.isclose(boxes, orig[None], atol=atol, rtol=0)
    return np.any(near_crop & ~near_image, axis=1)


def box_xyxy_to_xywh(box_xyxy):
    box = np.array(box_xyxy, copy=True)
    box[2] = box[2] - box[0]
    box[3] = box[3] - box[1]
    return box


def batch_iterator(batch_size: int, *args) -> Generator[List[Any], None, None]:
    assert len(args) > 0 and all(len(a) == len(args[0]) for a in args)
    n_batches = len(args[0]) // batch_size + int(len(args[0]) % batch_size != 0)
    for b in range(n_batches):
        yield [arg[b * batch_size : (b + 1) * batch_size] for arg in args]


def mask_to_rle(masks: np.ndarray) -> List[Dict[str, Any]]:
    """Uncompressed column-major RLE, pycoco format (reference amg.py:109-138).
    masks: [B, H, W] bool. Uses the native C++ codec when available."""
    try:
        from sam2_opt_tpu.io import native

        if native.available():
            out = []
            for i in range(masks.shape[0]):
                rle = native.rle_encode(masks[i])
                if rle is None:
                    break
                out.append(rle)
            if len(out) == masks.shape[0]:
                return out
    except Exception:
        pass
    b, h, w = masks.shape
    flat = np.transpose(masks, (0, 2, 1)).reshape(b, h * w)
    out = []
    for i in range(b):
        row = flat[i]
        diff = row[1:] != row[:-1]
        change = np.flatnonzero(diff) + 1
        idxs = np.concatenate([[0], change, [h * w]])
        btw = np.diff(idxs)
        counts = [] if not row[0] else [0]
        counts.extend(btw.tolist())
        out.append({"size": [h, w], "counts": counts})
    return out


# backwards-friendly alias mirroring the reference name
mask_to_rle_pytorch = mask_to_rle


def rle_to_mask(rle: Dict[str, Any]) -> np.ndarray:
    """reference amg.py:141-152."""
    h, w = rle["size"]
    mask = np.empty(h * w, dtype=bool)
    idx = 0
    parity = False
    for count in rle["counts"]:
        mask[idx : idx + count] = parity
        idx += count
        parity ^= True
    return mask.reshape(w, h).transpose()


def area_from_rle(rle: Dict[str, Any]) -> int:
    return sum(rle["counts"][1::2])


def calculate_stability_score(masks, mask_threshold: float, threshold_offset: float):
    """IoU between high/low-thresholded masks (reference amg.py:158-178).
    masks: [..., H, W] logits."""
    masks = np.asarray(masks)
    inter = (masks > (mask_threshold + threshold_offset)).sum(-1).sum(-1)
    union = (masks > (mask_threshold - threshold_offset)).sum(-1).sum(-1)
    return inter / np.maximum(union, 1)


def build_point_grid(n_per_side: int) -> np.ndarray:
    offset = 1 / (2 * n_per_side)
    pts = np.linspace(offset, 1 - offset, n_per_side)
    px = np.tile(pts[None, :], (n_per_side, 1))
    py = np.tile(pts[:, None], (1, n_per_side))
    return np.stack([px, py], axis=-1).reshape(-1, 2)


def build_all_layer_point_grids(n_per_side: int, n_layers: int,
                                scale_per_layer: int) -> List[np.ndarray]:
    return [
        build_point_grid(int(n_per_side / (scale_per_layer**i)))
        for i in range(n_layers + 1)
    ]


def generate_crop_boxes(im_size, n_layers: int, overlap_ratio: float):
    """reference amg.py:202-236."""
    crop_boxes, layer_idxs = [], []
    im_h, im_w = im_size
    short_side = min(im_h, im_w)
    crop_boxes.append([0, 0, im_w, im_h])
    layer_idxs.append(0)

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_crops_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_crops_per_side))
        crop_w = crop_len(im_w, n_crops_per_side, overlap)
        crop_h = crop_len(im_h, n_crops_per_side, overlap)
        x0s = [int((crop_w - overlap) * i) for i in range(n_crops_per_side)]
        y0s = [int((crop_h - overlap) * i) for i in range(n_crops_per_side)]
        for x0, y0 in product(x0s, y0s):
            crop_boxes.append([x0, y0, min(x0 + crop_w, im_w), min(y0 + crop_h, im_h)])
            layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def uncrop_boxes_xyxy(boxes, crop_box):
    x0, y0 = crop_box[0], crop_box[1]
    offset = np.asarray([[x0, y0, x0, y0]], dtype=np.asarray(boxes).dtype)
    if np.asarray(boxes).ndim == 3:
        offset = offset[:, None]
    return np.asarray(boxes) + offset


def uncrop_points(points, crop_box):
    x0, y0 = crop_box[0], crop_box[1]
    offset = np.asarray([[x0, y0]], dtype=np.asarray(points).dtype)
    if np.asarray(points).ndim == 3:
        offset = offset[:, None]
    return np.asarray(points) + offset


def uncrop_masks(masks, crop_box, orig_h: int, orig_w: int):
    x0, y0, x1, y1 = crop_box
    if x0 == 0 and y0 == 0 and x1 == orig_w and y1 == orig_h:
        return masks
    pad_x, pad_y = orig_w - (x1 - x0), orig_h - (y1 - y0)
    widths = [(0, 0)] * (masks.ndim - 2) + [(y0, pad_y - y0), (x0, pad_x - x0)]
    return np.pad(masks, widths)


def remove_small_regions(mask: np.ndarray, area_thresh: float, mode: str):
    """Remove small holes/islands (reference amg.py:270-295, cv2-backed)."""
    import cv2

    assert mode in ("holes", "islands")
    correct_holes = mode == "holes"
    working = (correct_holes ^ mask).astype(np.uint8)
    n_labels, regions, stats, _ = cv2.connectedComponentsWithStats(working, 8)
    sizes = stats[:, -1][1:]
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask, False
    fill = [0] + small
    if not correct_holes:
        fill = [i for i in range(n_labels) if i not in fill]
        if not fill:
            fill = [int(np.argmax(sizes)) + 1]
    return np.isin(regions, fill), True


def coco_encode_rle(uncompressed_rle: Dict[str, Any]) -> Dict[str, Any]:
    from pycocotools import mask as mask_utils  # optional dependency

    h, w = uncompressed_rle["size"]
    rle = mask_utils.frPyObjects(uncompressed_rle, h, w)
    rle["counts"] = rle["counts"].decode("utf-8")
    return rle


def batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """XYXY boxes around masks; [0,0,0,0] for empty (reference amg.py:305-348).
    masks: [..., H, W] bool."""
    masks = np.asarray(masks)
    if masks.size == 0:
        return np.zeros((*masks.shape[:-2], 4), np.int64)
    shape = masks.shape
    h, w = shape[-2:]
    flat = masks.reshape(-1, h, w)

    in_height = flat.max(axis=-1)
    coords_h = in_height * np.arange(h)[None, :]
    bottom = coords_h.max(axis=-1)
    coords_h = coords_h + h * (~in_height)
    top = coords_h.min(axis=-1)

    in_width = flat.max(axis=-2)
    coords_w = in_width * np.arange(w)[None, :]
    right = coords_w.max(axis=-1)
    coords_w = coords_w + w * (~in_width)
    left = coords_w.min(axis=-1)

    empty = (right < left) | (bottom < top)
    out = np.stack([left, top, right, bottom], axis=-1)
    out = out * (~empty)[..., None]
    return out.reshape(*shape[:-2], 4)


def box_nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> np.ndarray:
    """Greedy NMS over XYXY boxes (replacement for torchvision batched_nms).
    Returns kept indices sorted by descending score."""
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)
    order = np.argsort(-scores)
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        xx0 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy0 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx1 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy1 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.clip(xx1 - xx0, 0, None) * np.clip(yy1 - yy0, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(area_i + area_r - inter, 1e-9)
        order = rest[iou <= iou_threshold]
    return np.asarray(keep, np.int64)


def batched_nms(boxes, scores, idxs, iou_threshold: float) -> np.ndarray:
    """Category-aware NMS (torchvision.ops.batched_nms semantics)."""
    boxes = np.asarray(boxes, np.float32)
    if boxes.size == 0:
        return np.zeros((0,), np.int64)
    max_coord = boxes.max()
    offsets = np.asarray(idxs, np.float32) * (max_coord + 1)
    return box_nms(boxes + offsets[:, None], scores, iou_threshold)
