"""Accuracy gate: the compiled bf16 path must produce masks near-identical to
the fp32 eager path (proxy for the BASELINE.json north star: mask mIoU >= 0.99
vs the torch reference — fp32 parity vs torch is covered by
test_parity_modules; this closes the bf16 leg)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam2_opt_tpu.models.model import SAM2Model
from sam2_opt_tpu.predictors.image import SAM2ImagePredictor


def _miou(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return 1.0 if union == 0 else inter / union


def test_bf16_speedup_mask_miou(tiny128_cfg, tiny128_params):
    model = SAM2Model(tiny128_params, tiny128_cfg)
    predictor = SAM2ImagePredictor(model)
    rng = np.random.default_rng(0)
    # structured image so masks aren't degenerate noise
    base = rng.random((8, 8, 3))
    image = (np.kron(base, np.ones((16, 16, 1))) * 255).astype(np.uint8)

    pts = np.array([[64, 64]], np.float32)
    lbl = np.array([1], np.int32)

    predictor.set_image(image)
    masks_fp32, ious_fp32, _ = predictor.predict(
        point_coords=pts, point_labels=lbl
    )

    predictor.speedup()  # bf16 compiled path
    predictor.set_image(image)
    masks_bf16, ious_bf16, _ = predictor.predict(
        point_coords=pts, point_labels=lbl
    )

    # mIoU over the predicted binary masks (random weights produce large
    # diffuse masks; bf16 rounding must not move the decision boundary much)
    ious = [
        _miou(masks_fp32[i], masks_bf16[i]) for i in range(masks_fp32.shape[0])
        if masks_fp32[i].sum() + masks_bf16[i].sum() > 0
    ]
    assert ious, "degenerate: all masks empty"
    assert min(ious) > 0.97, ious
    assert np.abs(ious_fp32 - ious_bf16).max() < 0.05
