"""Automatic-mask-generator cross-validation vs the reference torch AMG.

Runs the reference SAM2AutomaticMaskGenerator (sam2/automatic_mask_generator.py)
and ours (predictors/amg.py) with the SAME seeded weights over the same image
and a 4x4 point grid, with filtering/NMS disabled (thresholds at 0 / NMS at
1.0) so the comparison is the raw mask-generation pipeline — point gridding,
batched prediction, stability scores, box/RLE bookkeeping — rather than
tie-breaking at filter boundaries on random weights.
"""

import numpy as np
import pytest

from reference_helper import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)


def _image():
    rng = np.random.default_rng(13)
    img = (rng.random((192, 256, 3)) * 70 + 80).astype(np.uint8)
    img[40:120, 30:120] = (220, 200, 60)
    yy, xx = np.mgrid[0:192, 0:256]
    img[(xx - 190) ** 2 + (yy - 120) ** 2 < 35 ** 2] = (30, 50, 170)
    return img


def _iou(a, b):
    u = (a | b).sum()
    return 1.0 if u == 0 else (a & b).sum() / u


KNOBS = dict(
    points_per_side=4,
    points_per_batch=16,
    pred_iou_thresh=0.0,
    stability_score_thresh=0.0,
    box_nms_thresh=1.0,
    crop_n_layers=0,
    min_mask_region_area=0,
    multimask_output=True,
)


def test_amg_parity():
    import torch

    from reference_helper import build_torch_sam2, state_dict_numpy

    from sam2_opt_tpu.config import model_config
    from sam2_opt_tpu.io.torch_convert import convert_state_dict
    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.amg import SAM2AutomaticMaskGenerator

    torch_model = build_torch_sam2("hiera_t", seed=0)
    from sam2.automatic_mask_generator import (
        SAM2AutomaticMaskGenerator as TorchAMG,
    )

    img = _image()
    with torch.no_grad():
        ref = TorchAMG(torch_model, **KNOBS).generate(img)

    cfg = model_config("hiera_t")
    params = convert_state_dict(state_dict_numpy(torch_model))
    ours = SAM2AutomaticMaskGenerator(SAM2Model(params, cfg), **KNOBS).generate(img)

    assert len(ref) == len(ours), (len(ref), len(ours))
    assert len(ref) > 0

    # match each reference record to our best-IoU record; require near-exact
    # segmentation agreement and consistent quality scores
    ours_masks = [np.asarray(o["segmentation"], bool) for o in ours]
    used = set()
    ious_delta, stab_delta = [], []
    for r in ref:
        rm = np.asarray(r["segmentation"], bool)
        best_j, best = -1, -1.0
        for j, om in enumerate(ours_masks):
            if j in used:
                continue
            v = _iou(rm, om)
            if v > best:
                best, best_j = v, j
        assert best >= 0.95, f"no matching mask (best IoU {best:.3f})"
        used.add(best_j)
        ious_delta.append(abs(r["predicted_iou"] - ours[best_j]["predicted_iou"]))
        stab_delta.append(
            abs(r["stability_score"] - ours[best_j]["stability_score"])
        )
        # bbox agreement (XYWH)
        assert np.abs(
            np.asarray(r["bbox"]) - np.asarray(ours[best_j]["bbox"])
        ).max() <= 2, (r["bbox"], ours[best_j]["bbox"])
    assert max(ious_delta) <= 5e-3, max(ious_delta)
    assert max(stab_delta) <= 5e-3, max(stab_delta)
