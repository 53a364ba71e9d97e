"""Video demo (re-design of reference video.py:1-74): init_state ->
add_new_points_or_box -> propagate_in_video -> mp4 with blended masks."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sam2_opt_tpu import build_sam2_video_predictor


def main(
    video_path="/root/reference/sam2/notebooks/videos/bedroom",
    checkpoint=None,
    variant="hiera_l",
    output_path="outputs/video_demo.mp4",
    max_frames=None,
):
    predictor = build_sam2_video_predictor(variant, checkpoint)
    predictor.speedup()

    if max_frames is not None:
        import os as _os
        from PIL import Image as _Image
        names = sorted(_os.listdir(video_path), key=lambda p: int(_os.path.splitext(p)[0]))
        names = names[: int(max_frames)]
        video_path = np.stack([
            np.array(_Image.open(_os.path.join(video_path, n)).convert("RGB"))
            for n in names
        ])
    state = predictor.init_state(video_path)
    predictor.add_new_points_or_box(
        state,
        frame_idx=0,
        obj_id=1,
        points=np.array([[210, 350]], np.float32),
        labels=np.array([1], np.int32),
    )

    results = []
    for frame_idx, obj_ids, masks in predictor.propagate_in_video(state):
        results.append((frame_idx, np.asarray(masks)))

    from draw import gen_video_writer, save_masks

    h, w = state["video_height"], state["video_width"]
    write, release = gen_video_writer(output_path, 24.0, w, h)
    frames = state["images"]
    import cv2

    for frame_idx, masks in results:
        frame = cv2.resize(np.asarray(frames[frame_idx]), (w, h))
        save_masks(frame, [masks[i, 0] for i in range(masks.shape[0])], write)
    release()
    print(f"saved {len(results)} frames to {output_path}")


if __name__ == "__main__":
    argv = [None if a in ("", "none", "None") else a for a in sys.argv[1:]]
    main(*argv)
