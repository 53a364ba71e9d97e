"""AMG utils parity vs the reference torch implementations + AMG smoke test."""

import numpy as np
import pytest

from sam2_opt_tpu.utils import amg as A

from reference_helper import reference_available


def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    masks = rng.random((4, 33, 57)) > 0.6
    rles = A.mask_to_rle(masks)
    for i, rle in enumerate(rles):
        assert np.array_equal(A.rle_to_mask(rle), masks[i])
        assert A.area_from_rle(rle) == int(masks[i].sum())


def test_mask_to_box():
    m = np.zeros((2, 10, 12), bool)
    m[0, 2:5, 3:9] = True
    boxes = A.batched_mask_to_box(m)
    assert boxes[0].tolist() == [3, 2, 8, 4]
    assert boxes[1].tolist() == [0, 0, 0, 0]


def test_nms_basic():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 10, 10], [20, 20, 30, 30]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = A.box_nms(boxes, scores, iou_threshold=0.5)
    assert keep.tolist() == [0, 2]


@pytest.mark.skipif(not reference_available(), reason="reference unavailable")
def test_amg_utils_parity_with_torch():
    import torch
    from reference_helper import setup_reference

    setup_reference()
    from sam2.utils import amg as ref

    rng = np.random.default_rng(1)
    masks = rng.random((3, 64, 48)) > 0.5
    ours = A.mask_to_rle(masks)
    theirs = ref.mask_to_rle_pytorch(torch.from_numpy(masks))
    for o, t in zip(ours, theirs):
        assert o["size"] == t["size"] and o["counts"] == t["counts"]

    logits = rng.standard_normal((5, 32, 32)).astype(np.float32) * 3
    s_ours = A.calculate_stability_score(logits, 0.0, 1.0)
    s_theirs = ref.calculate_stability_score(
        torch.from_numpy(logits), 0.0, 1.0
    ).numpy()
    assert np.allclose(s_ours, s_theirs, atol=1e-6)

    b_ours = A.batched_mask_to_box(masks)
    b_theirs = ref.batched_mask_to_box(torch.from_numpy(masks)).numpy()
    assert np.array_equal(b_ours, b_theirs)

    assert np.allclose(A.build_point_grid(7), ref.build_point_grid(7))
    cb_o, li_o = A.generate_crop_boxes((480, 640), 2, 0.34)
    cb_t, li_t = ref.generate_crop_boxes((480, 640), 2, 0.34)
    assert cb_o == cb_t and li_o == li_t


def test_amg_smoke_small(tiny128_cfg, tiny128_params):
    """End-to-end AMG on a small random-weight model (pipeline exercise)."""
    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.amg import SAM2AutomaticMaskGenerator

    cfg = tiny128_cfg
    model = SAM2Model(tiny128_params, cfg)
    amg = SAM2AutomaticMaskGenerator(
        model, points_per_side=2, points_per_batch=4,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
    )
    rng = np.random.default_rng(0)
    image = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
    anns = amg.generate(image)
    for ann in anns:
        assert ann["segmentation"].shape == (96, 128)
        assert {"area", "bbox", "predicted_iou", "stability_score"} <= set(ann)


def test_amg_from_pretrained(monkeypatch, tiny128_cfg, tiny128_params):
    """from_pretrained mirrors the reference classmethod
    (automatic_mask_generator.py:152-171): builds the model via the HF hub
    loader and passes constructor kwargs through."""
    from sam2_opt_tpu.predictors.amg import SAM2AutomaticMaskGenerator
    from sam2_opt_tpu.models.model import SAM2Model
    import sam2_opt_tpu.build_sam as bs

    seen = {}

    def fake_hf(model_id, **kwargs):
        seen["model_id"] = model_id
        return SAM2Model(tiny128_params, tiny128_cfg)

    monkeypatch.setattr(bs, "build_sam2_hf", fake_hf)
    amg = SAM2AutomaticMaskGenerator.from_pretrained(
        "facebook/sam2.1-hiera-tiny", points_per_side=4, points_per_batch=8
    )
    assert seen["model_id"] == "facebook/sam2.1-hiera-tiny"
    assert amg.points_per_batch == 8 and len(amg.point_grids[0]) == 16
