"""J&F metric and benchmark-folder tests (analytic cases + end-to-end dirs)."""

import os

import numpy as np
import pytest

from sam2_opt_tpu.eval.metrics import Evaluator, boundary_f_measure, get_iou, seg2bmap
from sam2_opt_tpu.eval.sav_benchmark import benchmark


def test_iou_analytic():
    assert get_iou(0, 0) == 1  # both empty
    assert get_iou(50, 150) == 0.5


def test_perfect_match_scores_100():
    ev = Evaluator()
    gt = np.zeros((64, 64), np.uint8)
    gt[20:40, 20:40] = 1
    for _ in range(3):
        ev.feed_frame(mask=gt, gt=gt)
    iou, f = ev.conclude()
    assert iou[1] == 100.0 and f[1] == 100.0


def test_half_overlap_iou():
    ev = Evaluator()
    gt = np.zeros((64, 64), np.uint8)
    gt[0:20, 0:20] = 1
    pred = np.zeros_like(gt)
    pred[0:20, 10:30] = 1  # half horizontal overlap
    ev.feed_frame(mask=pred, gt=gt)
    iou, _ = ev.conclude()
    # inter=200, union=600 -> 1/3
    assert abs(iou[1] - 100 / 3) < 1e-6


def test_seg2bmap_simple():
    seg = np.zeros((16, 16), bool)
    seg[2:12, 2:12] = True  # 10x10 filled square
    b = seg2bmap(seg)
    assert b.sum() > 0 and b.sum() < seg.sum()  # only the rim marked


def test_boundary_f_empty_cases():
    empty = np.zeros((32, 32), bool)
    full = np.zeros((32, 32), bool)
    full[8:24, 8:24] = True
    assert boundary_f_measure(empty, empty) == 1.0
    assert boundary_f_measure(empty, full) == 0.0
    assert boundary_f_measure(full, empty) == 0.0


def _write_png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr.astype(np.uint8)).save(path)


def test_benchmark_folders_davis_layout(tmp_path):
    gt_root = tmp_path / "gt"
    pred_root = tmp_path / "pred"
    rng = np.random.default_rng(0)
    for vid in ("video_a", "video_b"):
        for t in range(4):
            mask = np.zeros((32, 48), np.uint8)
            mask[5:20, 8:30] = 1
            _write_png(str(gt_root / vid / f"{t:05d}.png"), mask)
            _write_png(str(pred_root / vid / f"{t:05d}.png"), mask)
    jf, j, f, results = benchmark(
        [str(gt_root)], [str(pred_root)], num_processes=1, verbose=False
    )
    assert jf[0] == 100.0 and j[0] == 100.0 and f[0] == 100.0


def test_benchmark_folders_sav_layout(tmp_path):
    gt_root = tmp_path / "gt"
    pred_root = tmp_path / "pred"
    for vid in ("sav_000001",):
        for obj in ("000", "001"):
            for t in range(4):
                mask = np.zeros((32, 48), np.uint8)
                mask[4:16, 4:20] = 1
                _write_png(str(gt_root / vid / obj / f"{t:05d}.png"), mask)
                pred = mask if obj == "000" else np.zeros_like(mask)
                _write_png(str(pred_root / vid / obj / f"{t:05d}.png"), pred)
    jf, j, f, results = benchmark(
        [str(gt_root)], [str(pred_root)], num_processes=1, verbose=False
    )
    # one perfect object (100), one fully-missed object (0) -> J = 50
    assert abs(j[0] - 50.0) < 1e-6


def test_put_per_obj_mask_lowest_id_wins():
    """Overlap priority matches the reference (tools/vos_inference.py:42-53:
    descending-id iteration with unconditional overwrite -> LOWEST id wins)."""
    from sam2_opt_tpu.eval.vos_inference import put_per_obj_mask

    a = np.zeros((4, 4), bool)
    a[:, :3] = True  # obj 1
    b = np.zeros((4, 4), bool)
    b[:, 1:] = True  # obj 3
    mask = put_per_obj_mask({1: a, 3: b}, 4, 4)
    assert (mask[:, 1:3] == 1).all()  # overlap -> lowest id
    assert (mask[:, 0] == 1).all() and (mask[:, 3] == 3).all()


@pytest.fixture(scope="module")
def vos_fixture(tmp_path_factory, tiny128_cfg, tiny128_params):
    """Synthetic 3-frame DAVIS-layout video where object 2 first appears in
    frame 1 (late-appearing object)."""
    from PIL import Image

    from sam2_opt_tpu.eval.vos_inference import davis_palette
    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.video import SAM2VideoPredictor

    root = tmp_path_factory.mktemp("vos")
    vdir = root / "JPEGImages" / "vid0"
    adir = root / "Annotations" / "vid0"
    vdir.mkdir(parents=True), adir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    pal = davis_palette()
    for t in range(3):
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        img[20:40, 10:30] = (230, 210, 60)
        Image.fromarray(img).save(vdir / f"{t:05d}.jpg")
    ann0 = np.zeros((64, 64), np.uint8)
    ann0[20:40, 10:30] = 1
    ann1 = ann0.copy()
    ann1[45:60, 40:60] = 2  # object 2 appears at frame 1
    for t, ann in ((0, ann0), (1, ann1)):
        im = Image.fromarray(ann)
        im.putpalette(pal)
        im.save(adir / f"{t:05d}.png")

    predictor = SAM2VideoPredictor(
        SAM2Model(tiny128_params, tiny128_cfg), fill_hole_area=0
    )
    return root, predictor


def test_vos_inference_joint(vos_fixture, tmp_path):
    """Joint path seeds only frame 0 (reference :146-147): the late object is
    absent — that's exactly what the separate path exists for."""
    from sam2_opt_tpu.eval.vos_inference import vos_inference

    root, predictor = vos_fixture
    out = vos_inference(
        predictor, str(root / "JPEGImages"), str(root / "Annotations"),
        str(tmp_path / "out"), "vid0",
    )
    assert set(out) == {0, 1, 2}
    for t in out:
        assert set(out[t]) == {1}
    assert (tmp_path / "out" / "vid0" / "00002.png").exists()


def test_vos_inference_separate_tracks_late_object(vos_fixture, tmp_path):
    """Per-object separate tracking (reference :249-363): object 2 is seeded
    at ITS first annotated frame (1) and predicted from there on."""
    from sam2_opt_tpu.eval.vos_inference import (
        vos_separate_inference_per_object,
    )

    root, predictor = vos_fixture
    out = vos_separate_inference_per_object(
        predictor, str(root / "JPEGImages"), str(root / "Annotations"),
        str(tmp_path / "out2"), "vid0",
    )
    assert set(out) == {0, 1, 2}
    for t in out:
        assert set(out[t]) == {1, 2}
    # the seeded frames reproduce their GT masks (mask passthrough; the
    # 64->128->64 resize round trip softens the outermost boundary pixels)
    assert out[0][1][20:40, 10:30].mean() > 0.9
    assert out[1][2][45:60, 40:60].mean() > 0.9
    # before its first annotation, object 2 is empty (NO_OBJ score)
    assert not out[0][2].any()
    assert (tmp_path / "out2" / "vid0" / "00002.png").exists()


def test_benchmark_skips_empty_gt_track(tmp_path):
    """An SA-V object track whose GT is all-empty in the scored frames (e.g.
    visible only in the skipped first/last annotated frame) is skipped with a
    warning instead of aborting the whole benchmark run (regression:
    `(iou_val,) = iou.values()` raised ValueError on the empty dict)."""
    gt_root = tmp_path / "gt"
    pred_root = tmp_path / "pred"
    full = np.zeros((32, 48), np.uint8)
    full[4:16, 4:20] = 1
    empty = np.zeros_like(full)
    for t in range(4):
        # object 000: normal track; object 001: GT only in frame 0 (which
        # the SA-V convention skips) -> nothing to score
        _write_png(str(gt_root / "sav_000002" / "000" / f"{t:05d}.png"), full)
        _write_png(str(pred_root / "sav_000002" / "000" / f"{t:05d}.png"), full)
        g1 = full if t == 0 else empty
        _write_png(str(gt_root / "sav_000002" / "001" / f"{t:05d}.png"), g1)
        _write_png(str(pred_root / "sav_000002" / "001" / f"{t:05d}.png"), empty)
    jf, j, f, results = benchmark(
        [str(gt_root)], [str(pred_root)], num_processes=1, verbose=False
    )
    # only the scoreable object contributes
    assert jf[0] == 100.0 and j[0] == 100.0


# --------------------------------------------------------------------- #
# cross-validation against the reference's own J&F implementation
# (/root/reference/sam2/sav_dataset/utils/sav_benchmark.py) on identical
# synthetic GT/pred folders — the instrument behind the eventual headline
# J&F number must agree with the reference scorer to float precision.
# --------------------------------------------------------------------- #

_REF_SAV_BENCHMARK = "/root/reference/sam2/sav_dataset/utils/sav_benchmark.py"


def _import_reference_sav_benchmark():
    """Load the reference scorer. skimage isn't installed here; stub
    skimage.morphology.disk with an INDEPENDENT transcription of its
    documented semantics (not sam2_opt_tpu.eval.metrics.disk — sharing our
    implementation would let a bug there hide from this comparison)."""
    import importlib.util
    import sys
    import types

    if "skimage" not in sys.modules:
        def _disk(radius, dtype=np.uint8):
            L = np.arange(-radius, radius + 1)
            X, Y = np.meshgrid(L, L)
            return np.array((X ** 2 + Y ** 2) <= radius ** 2, dtype=dtype)

        skimage = types.ModuleType("skimage")
        morph = types.ModuleType("skimage.morphology")
        morph.disk = _disk
        skimage.morphology = morph
        sys.modules["skimage"] = skimage
        sys.modules["skimage.morphology"] = morph
    spec = importlib.util.spec_from_file_location(
        "ref_sav_benchmark", _REF_SAV_BENCHMARK
    )
    mod = importlib.util.module_from_spec(spec)
    # register BEFORE exec: the reference pickles VideoEvaluator into its
    # multiprocessing Pool, and unpickling imports by module name
    sys.modules["ref_sav_benchmark"] = mod
    spec.loader.exec_module(mod)
    return mod


def _rect(shape, r0, c0, h, w, value=1):
    m = np.zeros(shape, np.uint8)
    m[max(r0, 0):max(r0, 0) + h, max(c0, 0):max(c0, 0) + w] = value
    return m


def _build_davis_video(gt_dir, pred_dir, which):
    """Multi-object palette-png DAVIS layout with awkward cases: an object
    that first appears mid-video (the scorer keys objects from first
    sighting), prediction misses, and a pred-only false-positive id."""
    from PIL import Image

    shape = (48, 64)
    T = 6
    for t in range(T):
        gt = np.zeros(shape, np.uint8)
        pred = np.zeros(shape, np.uint8)
        if which == "a":
            gt |= _rect(shape, 4 + t, 6, 12, 14, 1)
            pred |= _rect(shape, 5 + t, 7, 12, 14, 1)      # 1px shift
            if t >= 2:
                gt[30:42, 30 + t:44 + t] = 2               # late-start obj
            if t >= 3:
                pred[31:41, 31 + t:43 + t] = 2             # later + smaller
            if t == 4:
                pred[2:6, 50:60] = 3                       # pred-only id
        else:
            gt |= _rect(shape, 10, 10 + 2 * t, 16, 10, 1)
            if t not in (2, 4):                            # dropped frames
                pred |= _rect(shape, 11, 9 + 2 * t, 15, 11, 1)
        os.makedirs(gt_dir, exist_ok=True)
        os.makedirs(pred_dir, exist_ok=True)
        Image.fromarray(gt).save(os.path.join(gt_dir, f"{t:05d}.png"))
        Image.fromarray(pred).save(os.path.join(pred_dir, f"{t:05d}.png"))


def _build_sav_video(gt_root, pred_root, video):
    """SA-V per-object binary layout, annotated every 4th frame; one track
    with partial GT visibility and imperfect predictions."""
    from PIL import Image

    shape = (48, 64)
    frames = [f"{t:05d}.png" for t in range(0, 16, 4)]
    for obj, off in (("000", 0), ("001", 3)):
        for i, name in enumerate(frames):
            gt = np.zeros(shape, np.uint8)
            pred = np.zeros(shape, np.uint8)
            if obj == "000" or i >= 1:                     # 001 starts late
                gt = _rect(shape, 8 + off + i, 8 + 2 * i, 14, 12, 1)
            if obj == "000" or i >= 2:
                pred = _rect(shape, 9 + off + i, 9 + 2 * i, 13, 12, 1)
            gd = os.path.join(gt_root, video, obj)
            pd = os.path.join(pred_root, video, obj)
            os.makedirs(gd, exist_ok=True)
            os.makedirs(pd, exist_ok=True)
            Image.fromarray(gt).save(os.path.join(gd, name))
            Image.fromarray(pred).save(os.path.join(pd, name))


@pytest.mark.skipif(
    not os.path.exists(_REF_SAV_BENCHMARK), reason="reference unavailable"
)
def test_jf_matches_reference_implementation(tmp_path):
    ref = _import_reference_sav_benchmark()

    davis_gt = str(tmp_path / "davis" / "gt")
    davis_pred = str(tmp_path / "davis" / "pred")
    _build_davis_video(os.path.join(davis_gt, "vid_a"),
                       os.path.join(davis_pred, "vid_a"), "a")
    _build_davis_video(os.path.join(davis_gt, "vid_b"),
                       os.path.join(davis_pred, "vid_b"), "b")
    sav_gt = str(tmp_path / "sav" / "gt")
    sav_pred = str(tmp_path / "sav" / "pred")
    _build_sav_video(sav_gt, sav_pred, "sav_000001")
    _build_sav_video(sav_gt, sav_pred, "sav_000002")

    gt_roots = [davis_gt, sav_gt]
    pred_roots = [davis_pred, sav_pred]

    ref_jf, ref_j, ref_f, ref_obj = ref.benchmark(
        list(gt_roots), list(pred_roots), strict=True, num_processes=1,
        verbose=False, skip_first_and_last=True,
    )
    our_jf, our_j, our_f, _ = benchmark(
        list(gt_roots), list(pred_roots), strict=True, num_processes=1,
        verbose=False, skip_first_and_last=True,
    )

    # global J, F, J&F equal to float precision, per dataset
    np.testing.assert_allclose(our_j, ref_j, rtol=0, atol=1e-11)
    np.testing.assert_allclose(our_f, ref_f, rtol=0, atol=1e-11)
    np.testing.assert_allclose(our_jf, ref_jf, rtol=0, atol=1e-11)
    # and the scores are non-trivial (imperfect predictions)
    assert 0.0 < our_jf[0] < 100.0 and 0.0 < our_jf[1] < 100.0

    # per-video per-object agreement: our per-video scorer returns the same
    # (video, {obj: J}, {obj: F}) triple shape as the reference's
    from sam2_opt_tpu.eval.sav_benchmark import _ScoreVideo

    for d, (gt_root, pred_root) in enumerate(zip(gt_roots, pred_roots)):
        for video, (ref_iou, ref_bf) in ref_obj[d].items():
            _, our_iou, our_bf = _ScoreVideo(
                gt_root, pred_root, skip_first_and_last=True
            )(video)
            ours_iou = {str(k): v for k, v in our_iou.items()}
            ours_bf = {str(k): v for k, v in our_bf.items()}
            assert set(ours_iou) == {str(k) for k in ref_iou}
            for k in ref_iou:
                np.testing.assert_allclose(
                    ours_iou[str(k)], ref_iou[k], rtol=0, atol=1e-11)
                np.testing.assert_allclose(
                    ours_bf[str(k)], ref_bf[k], rtol=0, atol=1e-11)
