"""SAM2Transforms — preprocessing/postprocessing helper (API parity with
sam2/sam2/utils/transforms.py:15-120).

The predictors inline these ops on-device; this class exists for users of the
reference API that constructed SAM2Transforms directly.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class SAM2Transforms:
    def __init__(self, resolution: int, mask_threshold: float,
                 max_hole_area: float = 0.0, max_sprinkle_area: float = 0.0):
        self.resolution = resolution
        self.mask_threshold = mask_threshold
        self.max_hole_area = max_hole_area
        self.max_sprinkle_area = max_sprinkle_area
        self.mean = jnp.asarray([0.485, 0.456, 0.406])
        self.std = jnp.asarray([0.229, 0.224, 0.225])

    def to_tensor(self, image: np.ndarray):
        """uint8 HWC -> float CHW-equivalent (we keep HWC, [0,1])."""
        return jnp.asarray(image, jnp.float32) / 255.0

    def resize(self, x):
        """[B, H, W, C] -> model resolution (bilinear, antialiased)."""
        B, H, W, C = x.shape
        r = self.resolution
        if (H, W) == (r, r):
            return x
        return jax.image.resize(x, (B, r, r, C), method="linear", antialias=True)

    def norm(self, x):
        return (x - self.mean) / self.std

    def __call__(self, image: np.ndarray):
        x = self.to_tensor(image)[None]
        return self.norm(self.resize(x))[0]

    def forward_batch(self, img_list):
        return jnp.stack([self(img) for img in img_list])

    def transform_coords(self, coords, normalize=False, orig_hw=None):
        """reference transforms.py:48-66."""
        coords = jnp.asarray(coords, jnp.float32)
        if normalize:
            h, w = orig_hw
            coords = coords / jnp.asarray([w, h], jnp.float32)
        return coords * self.resolution

    def transform_boxes(self, boxes, normalize=False, orig_hw=None):
        return self.transform_coords(
            jnp.asarray(boxes).reshape(-1, 2, 2), normalize, orig_hw
        )

    def postprocess_masks(self, masks, orig_hw):
        """Hole/sprinkle filling + bilinear resize (reference :78-120)."""
        from sam2_opt_tpu.models.sam2_base import resize_hw
        from sam2_opt_tpu.ops.connected_components import fill_holes_and_sprinkles

        masks = jnp.asarray(masks, jnp.float32)
        if self.max_hole_area > 0 or self.max_sprinkle_area > 0:
            try:
                masks = fill_holes_and_sprinkles(
                    masks, self.mask_threshold, self.max_hole_area,
                    self.max_sprinkle_area,
                )
            except Exception as e:
                # reference warns-and-skips on kernel failure
                # (sam2/utils/transforms.py:87-117)
                import warnings

                warnings.warn(
                    f"{e}\n\nSkipping the mask post-processing step due to "
                    f"the error above."
                )
        return resize_hw(masks, tuple(orig_hw), "bilinear")
