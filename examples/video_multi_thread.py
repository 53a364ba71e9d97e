"""Concurrent multi-session video demo.

Re-design of reference video_multi_thread.py:1-88: two Python threads share
ONE predictor, each tracking its own video session concurrently. The reference
used per-thread CUDA streams; on TPU the XLA runtime serializes compiled-call
dispatches safely, so plain threads suffice — each session's state is
independent and the compiled executables are shared (compiled once).
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sam2_opt_tpu import build_sam2_video_predictor


def run_sync(predictor, video_path, point, name, results):
    state = predictor.init_state(video_path)
    predictor.add_new_points_or_box(
        state, frame_idx=0, obj_id=1,
        points=np.array([point], np.float32),
        labels=np.array([1], np.int32),
    )
    n = 0
    t0 = time.time()
    for frame_idx, obj_ids, masks in predictor.propagate_in_video(state):
        n += 1
    results[name] = (n, time.time() - t0)
    print(f"[{name}] propagated {n} frames in {results[name][1]:.1f}s")


def main(
    video_path="/root/reference/sam2/notebooks/videos/bedroom",
    checkpoint=None,
    variant="hiera_l",
):
    predictor = build_sam2_video_predictor(variant, checkpoint)
    predictor.speedup()

    results = {}
    threads = [
        threading.Thread(
            target=run_sync,
            args=(predictor, video_path, [210, 350], "session-a", results),
        ),
        threading.Thread(
            target=run_sync,
            args=(predictor, video_path, [300, 200], "session-b", results),
        ),
    ]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    print(f"2 concurrent sessions done in {time.time()-t0:.1f}s: {results}")


if __name__ == "__main__":
    argv = [None if a in ("", "none", "None") else a for a in sys.argv[1:]]
    main(*argv)
