"""SA-V / DAVIS benchmark driver: folder scanning + multiprocess J&F.

Adapted from the reference sav_dataset/utils/sav_benchmark.py, itself from
hkchengrex/vos-benchmark (MIT) and davis2017-evaluation (BSD-3) — see
LICENSES/LICENSE_VOS_BENCHMARK and LICENSES/LICENSE_DAVIS.

Re-design of sam2/sav_dataset/utils/sav_benchmark.py:26-154 and :316-420.
Directory layouts supported (same as the reference):

  DAVIS-style : <root>/<video>/<frame>.png       (multi-object palette pngs)
  SA-V-style  : <root>/<video>/<obj_id>/<frame>.png  (binary pngs per object)
"""

from __future__ import annotations

import os
import time
from multiprocessing import Pool
from os import path
from typing import Dict, List, Tuple

import numpy as np

from sam2_opt_tpu.eval.metrics import Evaluator


class VideoEvaluator:
    def __init__(self, gt_root, pred_root, skip_first_and_last=True) -> None:
        self.gt_root = gt_root
        self.pred_root = pred_root
        self.skip_first_and_last = skip_first_and_last

    def __call__(self, vid_name: str):
        to_evaluate, is_sav_format = self.scan_vid_folder(vid_name)
        eval_results = []
        for all_frames, obj_id, gt_path, pred_path in to_evaluate:
            if self.skip_first_and_last:
                all_frames = all_frames[1:-1]
            evaluator = Evaluator(name=vid_name, obj_id=obj_id)
            for frame in all_frames:
                gt_array, pred_array = self.get_gt_and_pred(
                    gt_path, pred_path, frame, is_sav_format
                )
                evaluator.feed_frame(mask=pred_array, gt=gt_array)
            iou, boundary_f = evaluator.conclude()
            eval_results.append((obj_id, iou, boundary_f))

        if is_sav_format:
            iou_output, boundary_f_output = self.consolidate(eval_results)
        else:
            assert len(eval_results) == 1
            iou_output = eval_results[0][1]
            boundary_f_output = eval_results[0][2]
        return vid_name, iou_output, boundary_f_output

    def get_gt_and_pred(self, gt_path, pred_path, f_name, is_sav_format):
        from PIL import Image

        gt_mask_path = path.join(gt_path, f_name)
        pred_mask_path = path.join(pred_path, f_name)
        assert os.path.exists(pred_mask_path), f"{pred_mask_path} not found"
        gt_array = np.array(Image.open(gt_mask_path))
        pred_array = np.array(Image.open(pred_mask_path))
        assert gt_array.shape[-2:] == pred_array.shape[-2:], (
            f"shape mismatch: {gt_mask_path}, {pred_mask_path}"
        )
        if is_sav_format:
            assert len(np.unique(gt_array)) <= 2, (
                f"found more than 1 object in {gt_mask_path} (SA-V format "
                "assumes one object mask per png)"
            )
            assert len(np.unique(pred_array)) <= 2, (
                f"found more than 1 object in {pred_mask_path}"
            )
            gt_array = gt_array > 0
            pred_array = pred_array > 0
        return gt_array, pred_array

    def scan_vid_folder(self, vid_name):
        vid_gt_path = path.join(self.gt_root, vid_name)
        vid_pred_path = path.join(self.pred_root, vid_name)
        all_files_and_dirs = sorted(os.listdir(vid_gt_path))
        to_evaluate = []
        if all(name.endswith(".png") for name in all_files_and_dirs):
            is_sav_format = False
            to_evaluate.append(
                (all_files_and_dirs, None, vid_gt_path, vid_pred_path)
            )
        else:
            is_sav_format = True
            for obj_dir in all_files_and_dirs:
                obj_gt_path = path.join(vid_gt_path, obj_dir)
                obj_pred_path = path.join(vid_pred_path, obj_dir)
                frames = sorted(os.listdir(obj_gt_path))
                to_evaluate.append((frames, obj_dir, obj_gt_path, obj_pred_path))
        return to_evaluate, is_sav_format

    def consolidate(self, eval_results):
        iou_output, boundary_f_output = {}, {}
        for obj_id, iou, boundary_f in eval_results:
            assert len(iou) == 1
            key = list(iou.keys())[0]
            iou_output[obj_id] = iou[key]
            boundary_f_output[obj_id] = boundary_f[key]
        return iou_output, boundary_f_output


def benchmark(
    gt_roots,
    mask_roots,
    strict=True,
    num_processes=None,
    *,
    verbose=True,
    skip_first_and_last=True,
):
    """Evaluate prediction folders against GT folders; returns
    (global_jf, global_j, global_f, per-dataset results) like the reference
    (sav_benchmark.py:316-420)."""
    assert len(gt_roots) == len(mask_roots)
    if verbose:
        action = "SKIPPING" if skip_first_and_last else "NOT SKIPPING"
        print(f"We are *{action}* the evaluation of the first and last frame.")

    all_global_jf, all_global_j, all_global_f = [], [], []
    all_results = []
    start = time.time()
    for gt_root, mask_root in zip(gt_roots, mask_roots):
        gt_videos = os.listdir(gt_root)
        mask_videos = os.listdir(mask_root)
        if len(gt_videos) != len(mask_videos) and "Annotations" in gt_videos:
            anns = path.join(gt_root, "Annotations")
            if os.path.isdir(anns) and not os.listdir(anns)[0].endswith(".png"):
                gt_root = anns
                gt_videos = os.listdir(gt_root)
        gt_videos = [v for v in gt_videos if path.isdir(path.join(gt_root, v))]
        mask_videos = [v for v in mask_videos if path.isdir(path.join(mask_root, v))]
        if not strict:
            videos = sorted(set(gt_videos) & set(mask_videos))
        else:
            extras = (set(gt_videos) - set(mask_videos)) | (
                set(mask_videos) - set(gt_videos)
            )
            if extras:
                raise RuntimeError(f"gt/pred video mismatch: {sorted(extras)}")
            videos = sorted(gt_videos)
        if verbose:
            print(f"In dataset {gt_root}, evaluating {len(videos)} videos")

        evaluator = VideoEvaluator(
            gt_root, mask_root, skip_first_and_last=skip_first_and_last
        )
        if num_processes and num_processes > 1:
            with Pool(num_processes) as pool:
                results = pool.map(evaluator, videos)
        else:
            results = [evaluator(v) for v in videos]

        all_iou, all_f = [], []
        per_video = {}
        for vid_name, iou, boundary_f in results:
            j = list(iou.values())
            f = list(boundary_f.values())
            all_iou.extend(j)
            all_f.extend(f)
            per_video[vid_name] = {
                "J": float(np.mean(j)) if j else 0.0,
                "F": float(np.mean(f)) if f else 0.0,
            }
        gj = float(np.mean(all_iou)) if all_iou else 0.0
        gf = float(np.mean(all_f)) if all_f else 0.0
        gjf = (gj + gf) / 2
        all_global_j.append(gj)
        all_global_f.append(gf)
        all_global_jf.append(gjf)
        all_results.append(per_video)
        if verbose:
            print(f"{gt_root}: J&F {gjf:.1f}  J {gj:.1f}  F {gf:.1f}")
    if verbose:
        print(f"Total time: {time.time()-start:.1f}s")
    return all_global_jf, all_global_j, all_global_f, all_results
