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
