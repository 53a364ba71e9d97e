"""Extract JPEG frames from SA-V mp4 videos for training/eval.

TPU-native counterpart of the reference's SLURM/submitit array job
(reference sam2/training/scripts/sav_frame_extraction_submitit.py): the
cluster scheduler is replaced by a local multiprocessing pool (TPU pods
launch this per host on a shard of the video list via --shard/--num-shards).

Output layout matches the reference (:103-111): one folder per video under
<output-dir>/JPEGImages_24fps, frames named <original_frame_index:05d>.jpg
where the index advances by `sample_rate` (sample_rate=1 keeps 24 fps; the
SA-V annotations run at 6 fps, i.e. every 4th frame).

    python scripts/sav_frame_extraction.py \
        --sav-vid-dir sav/videos --output-dir sav --workers 8
"""

from __future__ import annotations

import argparse
import os
from multiprocessing import Pool


def extract_one(job) -> int:
    video_path, save_root, sample_rate = job
    import cv2

    name = os.path.splitext(os.path.basename(video_path))[0]
    out_dir = os.path.join(save_root, "JPEGImages_24fps", name)
    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    n = 0
    fid = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if fid % sample_rate == 0:
            cv2.imwrite(os.path.join(out_dir, f"{fid:05d}.jpg"), frame)
            n += 1
        fid += 1
    cap.release()
    return n


def main():
    parser = argparse.ArgumentParser(
        "SA-V frame extraction",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--sav-vid-dir", required=True,
                        help="directory containing SA-V .mp4 videos")
    parser.add_argument("--output-dir", required=True,
                        help="root that receives JPEGImages_24fps/<video>/")
    parser.add_argument("--sample-rate", type=int, default=1,
                        help="keep every Nth frame (1 = all 24fps frames)")
    parser.add_argument("--workers", type=int, default=os.cpu_count())
    parser.add_argument("--shard", type=int, default=0,
                        help="this host's shard index (multi-host runs)")
    parser.add_argument("--num-shards", type=int, default=1)
    args = parser.parse_args()

    videos = sorted(
        os.path.join(args.sav_vid_dir, p)
        for p in os.listdir(args.sav_vid_dir)
        if p.lower().endswith(".mp4")
    )[args.shard :: args.num_shards]
    jobs = [(v, args.output_dir, args.sample_rate) for v in videos]
    print(f"extracting {len(jobs)} videos "
          f"(shard {args.shard}/{args.num_shards}, {args.workers} workers)")
    with Pool(args.workers) as pool:
        counts = pool.map(extract_one, jobs)
    print(f"done: {sum(counts)} frames from {len(jobs)} videos")


if __name__ == "__main__":
    main()
