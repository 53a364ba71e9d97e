"""Video frame loading (TPU-native re-design of sam2/sam2/utils/misc.py:172-309).

Key departure: the reference decodes the whole video into a normalized fp32
tensor [T,3,1024,1024] resident on GPU (or CPU-offloaded). Here frames are kept
as uint8 [T, S, S, 3] host arrays (4x smaller) and normalization happens inside
the compiled encode graph on device; an optional background-thread loader
streams decode ahead of tracking (replacing AsyncVideoFrameLoader,
misc.py:104-149).
"""

from __future__ import annotations

import os
import threading
from typing import List, Optional, Tuple

import numpy as np


def _resize_uint8(img: np.ndarray, size: int) -> np.ndarray:
    """Resize HWC uint8 RGB to (size, size) with area/bilinear interpolation."""
    try:
        import cv2

        interp = cv2.INTER_AREA if img.shape[0] > size else cv2.INTER_LINEAR
        return cv2.resize(img, (size, size), interpolation=interp)
    except ImportError:
        from PIL import Image

        return np.asarray(Image.fromarray(img).resize((size, size), Image.BILINEAR))


def _load_jpeg_dir(path: str, image_size: int):
    """JPEG-directory videos named <frame_index>.jpg (misc.py:213-277)."""
    from PIL import Image

    names = [
        p
        for p in os.listdir(path)
        if os.path.splitext(p)[-1].lower() in (".jpg", ".jpeg", ".png")
    ]
    if not names:
        raise RuntimeError(f"no images found in {path}")
    try:
        names.sort(key=lambda p: int(os.path.splitext(p)[0]))
    except ValueError:
        # non-integer stems: order by the trailing digit run (frame_2 before
        # frame_10 — a lexicographic fallback would shuffle frames silently);
        # refuse undigited names instead of guessing an order
        import re as _re

        def frame_no(p):
            m = _re.search(r"(\d+)\D*$", os.path.splitext(p)[0])
            if m is None:
                raise RuntimeError(
                    f"cannot order frame file {p!r} in {path}: filenames "
                    f"must contain a frame number (reference misc.py:213 "
                    f"requires bare integer stems)"
                )
            return int(m.group(1))

        keys = [frame_no(p) for p in names]
        if len(set(keys)) != len(keys):
            # e.g. clip1_0001.jpg and clip2_0001.jpg: the trailing digit
            # run no longer identifies a frame — refuse rather than let
            # os.listdir order decide the interleave silently
            dup = sorted({k for k in keys if keys.count(k) > 1})[:3]
            raise RuntimeError(
                f"ambiguous frame ordering in {path}: multiple files share "
                f"frame number(s) {dup}; use unique per-frame numbers"
            )
        names.sort(key=frame_no)
    paths = [os.path.join(path, n) for n in names]

    # fast path: native threaded libjpeg decode+resize (csrc/sam2io.cpp)
    if all(p.lower().endswith((".jpg", ".jpeg")) for p in paths):
        from sam2_opt_tpu.io import native

        dims = native.jpeg_dims(paths[0])
        if dims is not None:
            frames = native.decode_jpeg_batch(paths, image_size)
            if frames is not None:
                return frames, dims[0], dims[1]

    frames = []
    video_h = video_w = None
    for p in paths:
        img = np.asarray(Image.open(p).convert("RGB"))
        if video_h is None:
            video_h, video_w = img.shape[:2]
        frames.append(_resize_uint8(img, image_size))
    return np.stack(frames), video_h, video_w


def _load_mp4(path: str, image_size: int):
    """mp4 videos via OpenCV (the reference uses decord, misc.py:280-309)."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open video {path}")
    frames = []
    video_h = video_w = None
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if video_h is None:
            video_h, video_w = frame.shape[:2]
        frames.append(_resize_uint8(frame, image_size))
    cap.release()
    if not frames:
        raise RuntimeError(f"no frames decoded from {path}")
    return np.stack(frames), video_h, video_w


class FrameSource:
    """Uniform access to loaded frames: uint8 [T, S, S, 3] host array."""

    def __init__(self, frames: np.ndarray, video_height: int, video_width: int):
        self.frames = frames
        self.video_height = video_height
        self.video_width = video_width

    def __len__(self) -> int:
        return self.frames.shape[0]

    def __getitem__(self, idx: int) -> np.ndarray:
        return self.frames[idx]


def load_video_frames(
    video_path,
    image_size: int = 1024,
    offload_video_to_cpu: bool = True,  # frames are host-resident by design
    async_loading_frames: bool = False,
    **_compat,
) -> Tuple[FrameSource, int, int]:
    """Load a video (mp4 file, JPEG directory, or ndarray [T,H,W,3]) resized to
    the model resolution. Returns (FrameSource, video_height, video_width)."""
    if isinstance(video_path, np.ndarray):
        arr = video_path
        assert arr.ndim == 4 and arr.shape[-1] == 3
        vh, vw = arr.shape[1:3]
        if np.issubdtype(arr.dtype, np.floating):
            # accept float frames in [0,1] or [0,255] — a bare astype(uint8)
            # would floor normalized frames to all-black. Threshold at 2.0
            # (not 1.0) so normalized frames with slight overshoot (e.g.
            # 1.003 from augmentation) are still read as unit-range instead
            # of flooring to black; a genuine [0,255] video with max < 2 is
            # indistinguishable from black either way
            amax = float(arr.max())
            scale = 255.0 if amax < 2.0 else 1.0
            if 1.0 < amax < 2.0:
                import logging

                logging.getLogger(__name__).warning(
                    "float video with max=%.3f is ambiguous between a "
                    "slightly-overshooting [0,1] video and a near-black "
                    "[0,255] one; treating it as unit-range (x255). Pass "
                    "uint8 frames to avoid the reinterpretation.", amax,
                )
            arr = np.clip(np.rint(arr * scale), 0, 255).astype(np.uint8)
        if arr.shape[1] != image_size or arr.shape[2] != image_size:
            arr = np.stack([_resize_uint8(f, image_size) for f in arr])
        return FrameSource(arr.astype(np.uint8), vh, vw), vh, vw
    if isinstance(video_path, str) and os.path.isdir(video_path):
        frames, vh, vw = _load_jpeg_dir(video_path, image_size)
    elif isinstance(video_path, str):
        frames, vh, vw = _load_mp4(video_path, image_size)
    else:
        raise NotImplementedError(f"unsupported video_path {type(video_path)}")
    return FrameSource(frames, vh, vw), vh, vw
