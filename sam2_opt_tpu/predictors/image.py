"""SAM2ImagePredictor — public API parity with the reference
(sam2/sam2/sam2_image_predictor.py:23-616), TPU-native execution.

Differences under the hood:
- `speedup()` jit-compiles the encode/decode graphs to XLA (bf16 by default)
  instead of loading ONNX/TensorRT engines; accepted backend names include the
  reference's "tensorrt"/"onnxruntime" for drop-in script compatibility.
- preprocessing (resize to 1024², /255, ImageNet normalize) runs on-device
  inside the compiled graph.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from sam2_opt_tpu.config import SAM2Config
from sam2_opt_tpu.models.model import SAM2Model
from sam2_opt_tpu.models import sam2_base as base
from sam2_opt_tpu.ops import common as ops


def _squeeze0(a: np.ndarray) -> np.ndarray:
    """torch .squeeze(0) semantics: drop the leading axis only when it is 1
    (a single prompt); multi-prompt outputs keep their batch axis."""
    return a[0] if a.shape[0] == 1 else a


class SAM2ImagePredictor:
    def __init__(
        self,
        sam_model: SAM2Model,
        mask_threshold: float = 0.0,
        max_hole_area: float = 0.0,
        max_sprinkle_area: float = 0.0,
        mesh=None,
        **kwargs,
    ) -> None:
        self.model = sam_model
        if mesh is not None:
            # multi-chip SPMD inference (beyond reference parity): params
            # follow the TP rule, set_image_batch shards the image batch on
            # the "data" axis
            self.model.shard(mesh)
        self.mask_threshold = mask_threshold
        self.max_hole_area = max_hole_area
        self.max_sprinkle_area = max_sprinkle_area

        self._is_image_set = False
        self._features = None
        self._orig_hw: Optional[List[Tuple[int, int]]] = None
        self._is_batch = False
        self._bb_feat_sizes = [(256, 256), (128, 128), (64, 64)]

    @property
    def cfg(self) -> SAM2Config:
        return self.model.cfg

    @classmethod
    def from_pretrained(cls, model_id: str, **kwargs) -> "SAM2ImagePredictor":
        """HF-hub loader (reference sam2_image_predictor.py:74-89); kwargs
        flow to both build_sam2_hf and the constructor like the reference."""
        from sam2_opt_tpu.build_sam import build_sam2_hf

        return cls(build_sam2_hf(model_id, **kwargs), **kwargs)

    # ------------------------------------------------------------------ #
    # speedup / backend seam (reference sam2_image_predictor.py:94-138)
    # ------------------------------------------------------------------ #

    def speedup(self, backend: str = "xla", use_cache: bool = True,
                model_root_path: Optional[str] = None, dtype=jnp.bfloat16,
                calib_dir: Optional[str] = None, activation_quant: bool = True):
        """One-line acceleration. backend in {"torch"/"eager", "xla", "int8"}
        (the reference names "tensorrt"/"onnxruntime" are accepted aliases for
        "xla"; "int8" mirrors the reference's `speedup("trt",
        model_root_path=...)` int8 engines — pass `calib_dir` with calibration
        images for activation-quant, omit it for weight-only). Warms up the
        1024² encode path."""
        self.model.speedup(
            backend=backend, use_cache=use_cache, dtype=dtype,
            model_root_path=model_root_path, calib_dir=calib_dir,
            activation_quant=activation_quant,
        )
        if self.model.backend == "xla":
            s = self.cfg.image_size
            warm = jnp.zeros((1, s, s, 3), jnp.float32)
            jax.block_until_ready(self.model.encode_image_e2e(warm))

    def set_runtime_backend(self, backend: str = "eager", args: dict = None):
        self.model.set_runtime_backend(backend, args)

    def release(self):
        self.speedup("eager")

    # ------------------------------------------------------------------ #
    # set_image / set_image_batch
    # ------------------------------------------------------------------ #

    def _resize_to_model(self, images: np.ndarray) -> jnp.ndarray:
        """uint8/float [B,H,W,3] -> float [B,S,S,3] in [0,1], on device.
        (reference: torchvision Resize 1024² + /255, sam2_image_predictor.py:193)"""
        s = self.cfg.image_size
        x = jnp.asarray(images)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32)
        x = x / 255.0
        if x.shape[1] != s or x.shape[2] != s:
            x = jax.image.resize(
                x, (x.shape[0], s, s, x.shape[3]), method="linear", antialias=True
            )
        return x

    def set_image(self, image) -> None:
        """image: np.ndarray HWC (RGB, 0-255) or PIL Image."""
        self.reset_predictor()
        if hasattr(image, "size") and not isinstance(image, np.ndarray):  # PIL
            w, h = image.size
            self._orig_hw = [(h, w)]
            image = np.array(image.convert("RGB"))
        else:
            image = np.asarray(image)
            self._orig_hw = [image.shape[:2]]
        self._set_image_([image])

    def set_image_batch(self, image_list: List[np.ndarray]) -> None:
        self.reset_predictor()
        self._orig_hw = [img.shape[:2] for img in image_list]
        self._set_image_(list(image_list))
        self._is_batch = True

    def _set_image_(self, images: List[np.ndarray]):
        if len({img.shape for img in images}) > 1:
            # heterogeneous batch: resize each image to the model resolution
            # BEFORE stacking (reference SAM2Transforms.forward_batch resizes
            # per image; _orig_hw already records the per-image shapes).
            # Same resize as the homogeneous path for numeric consistency.
            x = jnp.concatenate(
                [self._resize_to_model(np.asarray(img, np.uint8)[None])
                 for img in images]
            )
        else:
            x = self._resize_to_model(np.stack(images).astype(np.uint8))
        mesh = self.model.mesh
        if mesh is not None and x.shape[0] % mesh.shape["data"] == 0:
            from sam2_opt_tpu.parallel import mesh as mesh_lib

            x = jax.device_put(x, mesh_lib.data_sharded(mesh, 4))
        hrf0, hrf1, embed = self.model.encode_image_e2e(x)
        self._features = {"image_embed": embed, "high_res_feats": [hrf0, hrf1]}
        self._is_image_set = True

    # ------------------------------------------------------------------ #
    # predict
    # ------------------------------------------------------------------ #

    def _prep_prompts(self, point_coords, point_labels, box, mask_logits,
                      normalize_coords, img_idx=-1):
        unnorm_coords, labels, unnorm_box, mask_input = None, None, None, None
        if point_coords is not None:
            assert point_labels is not None
            coords = np.asarray(point_coords, np.float32)
            if normalize_coords:
                h, w = self._orig_hw[img_idx]
                coords = coords / np.asarray([w, h], np.float32)
            unnorm_coords = coords * self.cfg.image_size
            labels = np.asarray(point_labels, np.int32)
            if unnorm_coords.ndim == 2:
                unnorm_coords, labels = unnorm_coords[None], labels[None]
        if box is not None:
            b = np.asarray(box, np.float32).reshape(-1, 2, 2)
            if normalize_coords:
                h, w = self._orig_hw[img_idx]
                b = b / np.asarray([w, h], np.float32)
            unnorm_box = b * self.cfg.image_size
        if mask_logits is not None:
            mask_input = np.asarray(mask_logits, np.float32)
            if mask_input.ndim == 3:
                mask_input = mask_input[None]
        return mask_input, unnorm_coords, labels, unnorm_box

    def predict(
        self,
        point_coords: Optional[np.ndarray] = None,
        point_labels: Optional[np.ndarray] = None,
        box: Optional[np.ndarray] = None,
        mask_input: Optional[np.ndarray] = None,
        multimask_output: bool = True,
        return_logits: bool = False,
        normalize_coords: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Reference-compatible predict (sam2_image_predictor.py:387-454)."""
        if not self._is_image_set:
            raise RuntimeError(
                "An image must be set with .set_image(...) before mask prediction."
            )
        mask_in, unnorm_coords, labels, unnorm_box = self._prep_prompts(
            point_coords, point_labels, box, mask_input, normalize_coords
        )
        masks, ious, low_res = self._predict(
            unnorm_coords, labels, unnorm_box, mask_in, multimask_output,
            return_logits=return_logits,
        )
        # squeeze(0) like the reference (:451-454): a single prompt loses the
        # leading axis, but multiple prompts (e.g. several boxes) keep ALL
        # their masks — indexing [0] would silently drop the rest
        return (
            _squeeze0(np.asarray(masks)),
            _squeeze0(np.asarray(ious, np.float32)),
            _squeeze0(np.asarray(low_res)),
        )

    def predict_batch(
        self,
        point_coords_batch=None,
        point_labels_batch=None,
        box_batch=None,
        mask_input_batch=None,
        multimask_output: bool = True,
        return_logits: bool = False,
        normalize_coords: bool = True,
    ):
        """Batched-image prediction (reference sam2_image_predictor.py:325-385)."""
        assert self._is_batch, "use set_image_batch first"
        num_images = self._features["image_embed"].shape[0]
        all_masks, all_ious, all_low = [], [], []
        for i in range(num_images):
            pc = point_coords_batch[i] if point_coords_batch is not None else None
            pl = point_labels_batch[i] if point_labels_batch is not None else None
            bx = box_batch[i] if box_batch is not None else None
            mi = mask_input_batch[i] if mask_input_batch is not None else None
            mask_in, coords, labels, ubox = self._prep_prompts(
                pc, pl, bx, mi, normalize_coords, img_idx=i
            )
            masks, ious, low = self._predict(
                coords, labels, ubox, mask_in, multimask_output,
                return_logits=return_logits, img_idx=i,
            )
            all_masks.append(_squeeze0(np.asarray(masks)))
            all_ious.append(_squeeze0(np.asarray(ious, np.float32)))
            all_low.append(_squeeze0(np.asarray(low)))
        return all_masks, all_ious, all_low

    def _predict(self, point_coords, point_labels, boxes=None, mask_input=None,
                 multimask_output=True, return_logits=False, img_idx: int = -1):
        """Device-side predict on prepared prompts
        (reference sam2_image_predictor.py:487-589)."""
        concat_coords, concat_labels = point_coords, point_labels
        if boxes is not None:
            box_coords = boxes.reshape(-1, 2, 2)
            box_labels = np.broadcast_to(
                np.asarray([[2, 3]], np.int32), (box_coords.shape[0], 2)
            )
            if concat_coords is not None:
                concat_coords = np.concatenate([box_coords, concat_coords], axis=1)
                concat_labels = np.concatenate([box_labels, concat_labels], axis=1)
            else:
                concat_coords, concat_labels = box_coords, box_labels
        if concat_coords is None:
            # mask-only prompt: single padding point
            B = 1 if mask_input is None else mask_input.shape[0]
            concat_coords = np.zeros((B, 1, 2), np.float32)
            concat_labels = -np.ones((B, 1), np.int32)

        embed = self._features["image_embed"][img_idx][None] if img_idx >= 0 else \
            self._features["image_embed"]
        hrf0 = self._features["high_res_feats"][0][img_idx][None] if img_idx >= 0 else \
            self._features["high_res_feats"][0]
        hrf1 = self._features["high_res_feats"][1][img_idx][None] if img_idx >= 0 else \
            self._features["high_res_feats"][1]

        mi_nhwc = None
        if mask_input is not None:
            mi_nhwc = np.transpose(mask_input, (0, 2, 3, 1))

        low_res_masks, ious = self.model.predict_masks(
            embed, hrf0, hrf1, concat_coords, concat_labels,
            mask_input=mi_nhwc, multimask_output=multimask_output,
        )

        orig_hw = self._orig_hw[img_idx]
        masks = self.postprocess_masks(low_res_masks, orig_hw)
        low_res_masks = jnp.clip(low_res_masks, -32.0, 32.0)
        if not return_logits:
            masks = masks > self.mask_threshold
        return masks, ious, low_res_masks

    def postprocess_masks(self, masks, orig_hw):
        """Hole/sprinkle filling + resize to original resolution
        (reference utils/transforms.py:78-120)."""
        masks = masks.astype(jnp.float32)
        if self.max_hole_area > 0 or self.max_sprinkle_area > 0:
            from sam2_opt_tpu.ops.connected_components import fill_holes_and_sprinkles

            masks = fill_holes_and_sprinkles(
                masks, self.mask_threshold, self.max_hole_area,
                self.max_sprinkle_area,
            )
        return base.resize_hw(masks, tuple(orig_hw), "bilinear")

    def get_image_embedding(self):
        if not self._is_image_set:
            raise RuntimeError("An image must be set with .set_image(...)")
        return self._features["image_embed"]

    def reset_predictor(self) -> None:
        self._is_image_set = False
        self._features = None
        self._orig_hw = None
        self._is_batch = False
