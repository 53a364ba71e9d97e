"""Trained-checkpoint gate (VERDICT r2 #4).

Two layers of protection around `sd["model"]` loading (reference
build_sam.py:164-174):

1. `test_convert_state_dict_key_coverage` (always on): for all 4 variants,
   `convert_state_dict` must map 100% of the reference torch state_dict key
   names, and the converted tree must have EXACTLY the structure and shapes
   of `init_params` — proving the converter covers the published key
   inventory, not just the subset the seeded parity tests touch.

2. `test_trained_checkpoint_parity` (activates when SAM2_CHECKPOINT_PT points
   at a reference .pt): converts the real checkpoint, then gates image-mask
   mIoU >= 0.99 vs torch on the reference truck image and bedroom-video
   propagation parity — the reference's own quality criterion
   (/root/reference/doc/benchmark.md: J&F within 0.1 of torch on trained
   checkpoints). Run with:

       SAM2_CHECKPOINT_PT=/path/to/sam2.1_hiera_large.pt \
           python -m pytest tests/test_checkpoint_gate.py -k trained
"""

import os

import numpy as np
import pytest

import jax

from reference_helper import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)

CKPT = os.environ.get("SAM2_CHECKPOINT_PT")
TRUCK = "/root/reference/sam2/notebooks/images/truck.jpg"
BEDROOM = "/root/reference/sam2/notebooks/videos/bedroom"


def _tree_spec(tree, prefix=()):
    """{dotted path: shape} for every leaf."""
    out = {}
    for k, v in tree.items():
        path = prefix + (str(k),)
        if isinstance(v, dict):
            out.update(_tree_spec(v, path))
        else:
            out[".".join(path)] = tuple(v.shape)
    return out


@pytest.mark.parametrize("variant", ["hiera_t", "hiera_s", "hiera_b+", "hiera_l"])
def test_convert_state_dict_key_coverage(variant):
    from reference_helper import build_torch_sam2, state_dict_numpy

    from sam2_opt_tpu.config import model_config
    from sam2_opt_tpu.io.torch_convert import convert_state_dict, infer_variant
    from sam2_opt_tpu.models.init import init_params

    torch_model = build_torch_sam2(variant, seed=0)
    sd = state_dict_numpy(torch_model)
    assert infer_variant(sd) == variant

    converted = convert_state_dict(sd)
    conv_spec = _tree_spec(converted)
    # every torch key must have landed somewhere in the tree
    assert len(conv_spec) == len(sd), (
        f"{len(sd) - len(conv_spec)} torch keys collided or vanished"
    )

    cfg = model_config(variant)
    expected = jax.eval_shape(
        lambda key: init_params(cfg, key), jax.random.PRNGKey(0)
    )
    exp_spec = _tree_spec(expected)

    missing = sorted(set(exp_spec) - set(conv_spec))
    extra = sorted(set(conv_spec) - set(exp_spec))
    assert not missing, f"converter misses model params: {missing[:10]}"
    assert not extra, f"converter produces unconsumed params: {extra[:10]}"
    mismatched = [
        k for k in exp_spec if exp_spec[k] != conv_spec[k]
    ]
    assert not mismatched, (
        f"shape mismatches: "
        f"{[(k, conv_spec[k], exp_spec[k]) for k in mismatched[:5]]}"
    )


def _iou(a, b) -> float:
    a = np.asarray(a, bool)
    b = np.asarray(b, bool)
    u = (a | b).sum()
    return 1.0 if u == 0 else float((a & b).sum() / u)


@pytest.mark.skipif(
    not CKPT, reason="set SAM2_CHECKPOINT_PT=/path/to/sam2.1_*.pt to activate"
)
def test_trained_checkpoint_parity():
    """The reference acceptance criterion on a real trained checkpoint."""
    import torch
    from PIL import Image

    from reference_helper import build_torch_video_predictor

    from sam2_opt_tpu.config import model_config
    from sam2_opt_tpu.io.torch_convert import (
        infer_variant,
        load_torch_checkpoint,
    )
    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.image import SAM2ImagePredictor
    from sam2_opt_tpu.predictors.video import SAM2VideoPredictor

    sd = torch.load(CKPT, map_location="cpu", weights_only=True)
    sd = sd.get("model", sd)
    variant = infer_variant({k: v for k, v in sd.items()})

    torch_vp = build_torch_video_predictor(variant, seed=0)
    missing, unexpected = torch_vp.load_state_dict(sd, strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    torch_vp.eval()

    params = load_torch_checkpoint(CKPT)
    model = SAM2Model(params, model_config(variant))

    # ---- image gate: truck.jpg, the reference demo prompt ----
    img = np.array(Image.open(TRUCK).convert("RGB"))
    pt = np.array([[500.0, 375.0]], np.float32)
    lbl = np.array([1], np.int32)

    from sam2.sam2_image_predictor import SAM2ImagePredictor as TorchImagePredictor

    tp = TorchImagePredictor(torch_vp)
    with torch.no_grad():
        tp.set_image(img)
        masks_t, ious_t, _ = tp.predict(point_coords=pt, point_labels=lbl)

    ours = SAM2ImagePredictor(model)
    ours.set_image(img)
    masks_j, ious_j, _ = ours.predict(point_coords=pt, point_labels=lbl)

    for m in range(masks_t.shape[0]):
        iou = _iou(masks_t[m] > 0, masks_j[m] > 0)
        assert iou >= 0.99, f"image mask slot {m}: mIoU {iou:.4f}"
    np.testing.assert_allclose(ious_t, ious_j, atol=0.02)

    # ---- video gate: bedroom propagation parity ----
    vp = SAM2VideoPredictor(model, fill_hole_area=0)
    st_j = vp.init_state(BEDROOM)
    n = min(8, st_j["num_frames"])
    click = np.array([[210.0, 350.0]], np.float32)
    vp.add_new_points_or_box(st_j, 0, 1, points=click, labels=lbl)
    ours_masks = {}
    for f, ids, m in vp.propagate_in_video(st_j, max_frame_num_to_track=n - 1):
        ours_masks[f] = np.asarray(m)

    with torch.no_grad():
        st_t = torch_vp.init_state(BEDROOM)
        torch_vp.add_new_points_or_box(st_t, 0, 1, points=click, labels=lbl)
        for f, ids, m in torch_vp.propagate_in_video(
            st_t, max_frame_num_to_track=n - 1
        ):
            if f in ours_masks:
                iou = _iou(m.numpy()[0, 0] > 0, ours_masks[f][0, 0] > 0)
                assert iou >= 0.99, f"video frame {f}: IoU {iou:.4f}"
