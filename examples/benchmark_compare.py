"""J&F metric CLI (re-design of reference benchmark_compare.py:1-85).

Directory layouts (same as the reference docs, benchmark_compare.py:11-37):

SA-V:
  gt_root/<video>/<obj_id>/<frame>.png   (binary per-object pngs)
DAVIS:
  gt_root/<video>/<frame>.png            (multi-object palette pngs)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sam2_opt_tpu.eval.sav_benchmark import benchmark


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gt_root", required=True, help="ground-truth mask root")
    parser.add_argument("--pred_root", required=True, help="predicted mask root")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--strict", action="store_true")
    parser.add_argument(
        "--do_not_skip_first_and_last_frame", action="store_true",
        help="SA-V val/test and DAVIS semi-supervised skip first/last "
             "annotated frames by default",
    )
    args = parser.parse_args()
    jf, j, f, _ = benchmark(
        [args.gt_root],
        [args.pred_root],
        strict=args.strict,
        num_processes=args.num_processes,
        skip_first_and_last=not args.do_not_skip_first_and_last_frame,
    )
    print(f"J&F: {jf[0]:.1f}  J: {j[0]:.1f}  F: {f[0]:.1f}")


if __name__ == "__main__":
    main()
