"""End-to-end SA-V-pipeline equivalence vs the reference benchmark driver.

This exercises the EXACT code path of the reference's acceptance criterion
(doc/benchmark.md:67-72: SA-V J&F within 0.1 of torch), weights aside:

  reference: benchmark.py:57-99 run_segmentation_with_gt_mask
             (init_state on a JPEG dir -> add_new_mask with the first-frame
             GT mask -> propagate_in_video) + save_masks_for_evaluation
             PNG dumping (benchmark.py:19-56)
  ours:      examples/benchmark.py run_segmentation_with_gt_mask
             (same seeding + propagation + per-object PNG dump)

Both run the SAME converted weights (seeded torch init -> convert_state_dict)
over a synthetic 3-video SA-V-format mini-dataset, and both prediction
folders are scored against the same GT by eval/sav_benchmark.benchmark —
itself cross-validated to 1e-11 against the reference's own scorer
(tests/test_eval.py::test_jf_matches_reference_implementation). Gate:
|J&F_ours - J&F_torch| <= 0.1 (the reference's own acceptance band).

Alignment note: the reference driver collects `[add_new_mask pred] + one
mask per propagate yield`, and the official propagate ALSO yields the
seeded frame (sam2_video_predictor_official.py:687-690), so its enumerate-
indexed PNG dump is shifted by one frame relative to the video. The
duplicate initial entry is dropped before dumping so masks[i] <-> frame i,
which is what its `save_masks_for_evaluation` indexing assumes.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

from reference_helper import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)

T, VH, VW = 12, 160, 224
# 1024 like production: every recorded parity config runs the model frame
# at the real size; the videos themselves are small (160x224)
IMAGE_SIZE = 1024


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _videos():
    """3 synthetic videos: per video a dict of object -> per-frame GT mask fn."""
    yy, xx = np.mgrid[0:VH, 0:VW]

    def square(x0, y0, s):
        m = np.zeros((VH, VW), bool)
        m[y0: y0 + s, x0: x0 + s] = True
        return m

    def circle(cx, cy, r):
        return (xx - cx) ** 2 + (yy - cy) ** 2 < r ** 2

    return {
        "vid_a": {
            "000": lambda t: square(20 + 5 * t, 40, 44),
            "001": lambda t: circle(180, 26 + 5 * t, 18),
        },
        "vid_b": {
            "000": lambda t: circle(60 + 4 * t, 80, 22),
            "001": lambda t: square(130, 20 + 4 * t, 36),
        },
        "vid_c": {
            "000": lambda t: square(90, 60, 40) if t < T else None,
        },
    }


@pytest.fixture(scope="module")
def sav_root(tmp_path_factory):
    """SA-V-format mini-dataset: JPEGImages_24fps/<video>/%05d.jpg +
    Annotations_6fps/<video>/<obj>/%05d.png, every frame annotated."""
    from PIL import Image

    root = tmp_path_factory.mktemp("sav")
    rng = np.random.default_rng(3)
    colors = {"000": (235, 200, 40), "001": (30, 60, 190)}
    for video, objs in _videos().items():
        img_dir = root / "JPEGImages_24fps" / video
        img_dir.mkdir(parents=True)
        bg = (rng.random((VH, VW, 3)) * 70 + 70).astype(np.uint8)
        for t in range(T):
            frame = bg.copy()
            for obj_id, mask_fn in objs.items():
                frame[mask_fn(t)] = colors[obj_id]
            Image.fromarray(frame).save(img_dir / f"{t:05d}.jpg", quality=95)
        for obj_id, mask_fn in objs.items():
            ann_dir = root / "Annotations_6fps" / video / obj_id
            ann_dir.mkdir(parents=True)
            for t in range(T):
                m = (mask_fn(t).astype(np.uint8)) * 255
                Image.fromarray(m, "L").save(ann_dir / f"{t:05d}.png")
    return str(root)


@pytest.fixture(scope="module")
def shared_weights():
    from reference_helper import build_torch_video_predictor, state_dict_numpy

    torch_vp = build_torch_video_predictor(
        "hiera_t", seed=0, image_size=IMAGE_SIZE
    )
    sd = state_dict_numpy(torch_vp)
    return torch_vp, sd


def _float_maskmem_everywhere(vp):
    """The reference stores maskmem as bf16 (official :885-888) and consumes
    it under GPU autocast; CPU fp32 linears reject bf16. Wrap the two methods
    that consume stored memories so every stored bf16 tensor is upcast first
    (keeping the bf16 rounding) — same semantics as the GPU path and as
    tests/test_video_full_loop_parity.py::_float_all_maskmem."""
    import torch

    def upcast(state):
        for key in ("output_dict_per_obj", "temp_output_dict_per_obj"):
            for obj_dict in state[key].values():
                for frames in obj_dict.values():
                    for out in frames.values():
                        mm = out.get("maskmem_features")
                        if mm is not None and mm.dtype == torch.bfloat16:
                            out["maskmem_features"] = mm.float()

    orig = vp._run_single_frame_inference

    def wrapped(inference_state, *a, **k):
        upcast(inference_state)
        return orig(inference_state, *a, **k)

    vp._run_single_frame_inference = wrapped


def _run_reference(sav_root, out_dir, torch_vp):
    """Drive the reference benchmark driver functions verbatim."""
    # benchmark.py imports build_sam at module scope (unused here — we pass
    # a built predictor); hydra/omegaconf aren't installed, so stub the
    # names build_sam.py imports (reference_helper stubs the rest)
    from reference_helper import _stub_module

    _stub_module("hydra", compose=lambda *a, **k: None,
                 initialize_config_module=lambda *a, **k: None)
    _stub_module("hydra.utils", instantiate=lambda *a, **k: None)
    _stub_module("omegaconf", OmegaConf=object)
    ref_bench = _load_module("ref_sav_benchmark_driver",
                             "/root/reference/benchmark.py")
    _float_maskmem_everywhere(torch_vp)

    gt_root = os.path.join(sav_root, "Annotations_6fps")
    img_root = os.path.join(sav_root, "JPEGImages_24fps")
    for video in sorted(os.listdir(gt_root)):
        gt_video_dir = os.path.join(gt_root, video)
        for obj_id_str in sorted(os.listdir(gt_video_dir)):
            first_frame_gt, n = ref_bench.get_first_frame_gt_mask(
                os.path.join(gt_video_dir, obj_id_str)
            )
            assert first_frame_gt is not None and n == T
            all_masks = ref_bench.run_segmentation_with_gt_mask(
                torch_vp,
                os.path.join(img_root, video),
                first_frame_gt,
                int(obj_id_str),
            )
            # drop the duplicate initial entry (see module docstring) so the
            # reference's enumerate-indexed dump maps masks[i] <-> frame i
            assert len(all_masks) == T + 1
            ref_bench.save_masks_for_evaluation(
                masks=all_masks[1:],
                output_dir_base=out_dir,
                video_name=video,
                obj_id_str=obj_id_str,
            )


def _run_ours(sav_root, out_dir, sd):
    ours_bench = _load_module(
        "ours_sav_benchmark_driver",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "benchmark.py"),
    )
    from sam2_opt_tpu.config import model_config
    from sam2_opt_tpu.io.torch_convert import convert_state_dict
    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.video import SAM2VideoPredictor

    cfg = model_config("hiera_t", image_size=IMAGE_SIZE)
    params = convert_state_dict(sd)
    # fill_hole_area=0 on BOTH sides: the reference's hole filling needs its
    # CUDA extension and silently no-ops on CPU (utils/misc.py:321-337)
    predictor = SAM2VideoPredictor(SAM2Model(params, cfg), fill_hole_area=0)

    img_root = os.path.join(sav_root, "JPEGImages_24fps")
    ann_root = os.path.join(sav_root, "Annotations_6fps")
    for video in sorted(os.listdir(img_root)):
        ours_bench.run_segmentation_with_gt_mask(
            predictor,
            os.path.join(img_root, video),
            os.path.join(ann_root, video),
            out_dir,
            video,
        )


def test_sav_pipeline_jf_equivalence(sav_root, shared_weights, tmp_path):
    import torch

    torch_vp, sd = shared_weights
    ref_out = str(tmp_path / "pred_torch")
    ours_out = str(tmp_path / "pred_ours")

    with torch.no_grad():
        _run_reference(sav_root, ref_out, torch_vp)
    _run_ours(sav_root, ours_out, sd)

    from sam2_opt_tpu.eval.sav_benchmark import benchmark

    gt = os.path.join(sav_root, "Annotations_6fps")
    (jf_ref,), (j_ref,), (f_ref,), _ = benchmark(
        [gt], [ref_out], verbose=False
    )
    (jf_ours,), (j_ours,), (f_ours,), _ = benchmark(
        [gt], [ours_out], verbose=False
    )
    # guard against degenerate all-empty predictions scoring 0 == 0
    assert jf_ref > 0.0 and jf_ours > 0.0
    assert abs(jf_ours - jf_ref) <= 0.1, (
        f"J&F ours {jf_ours:.3f} vs torch {jf_ref:.3f} "
        f"(J {j_ours:.3f}/{j_ref:.3f}, F {f_ours:.3f}/{f_ref:.3f})"
    )
    assert abs(j_ours - j_ref) <= 0.1
    assert abs(f_ours - f_ref) <= 0.1
