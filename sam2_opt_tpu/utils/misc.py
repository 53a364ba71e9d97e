"""Misc predictor utilities (re-design of sam2/sam2/utils/misc.py).

The video-loading entry points live in sam2_opt_tpu.io.video; this module
carries the mask/point helpers and the async frame loader.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional

import numpy as np


def keystr_to_dotted(key: str) -> str:
    """jax keystr "['a']['b'][3]['weight']" -> torch-style "a.b.3.weight".
    Single shared implementation (used by the optimizer's param patterns,
    training checkpoint filtering, and the native checkpoint inspector)."""
    import re

    parts = re.findall(r"\[([^\]]+)\]", key)
    return ".".join(p.strip("'\"") for p in parts)


def mask_to_box(masks):
    """[B, 1, H, W] mask -> [B, 1, 4] xyxy box (reference misc.py:66-92)."""
    import jax.numpy as jnp

    B, _, h, w = masks.shape
    m = masks[:, 0]
    xs = jnp.arange(w, dtype=jnp.int32)
    ys = jnp.arange(h, dtype=jnp.int32)
    any_y = jnp.any(m, axis=2)  # [B, h]
    any_x = jnp.any(m, axis=1)  # [B, w]
    x_min = jnp.min(jnp.where(any_x, xs[None], w), axis=1)
    x_max = jnp.max(jnp.where(any_x, xs[None], -1), axis=1)
    y_min = jnp.min(jnp.where(any_y, ys[None], h), axis=1)
    y_max = jnp.max(jnp.where(any_y, ys[None], -1), axis=1)
    return jnp.stack([x_min, y_min, x_max, y_max], axis=-1)[:, None, :]


def concat_points(old_point_inputs: Optional[Dict], new_points, new_labels) -> Dict:
    """Append new points to previous ones (reference misc.py:341-349)."""
    if old_point_inputs is None:
        points, labels = new_points, new_labels
    else:
        points = np.concatenate(
            [old_point_inputs["point_coords"], new_points], axis=1
        )
        labels = np.concatenate(
            [old_point_inputs["point_labels"], new_labels], axis=1
        )
    return {"point_coords": points, "point_labels": labels}


def get_connected_components(mask):
    """8-connectivity labels+areas (the CUDA `_C.get_connected_componnets`
    surface, csrc/connected_components.cu:213) backed by the pure-XLA kernel."""
    import jax.numpy as jnp

    from sam2_opt_tpu.ops.connected_components import connected_components

    m = jnp.asarray(mask)
    squeeze = False
    if m.ndim == 4:  # [N,1,H,W]
        m = m[:, 0]
        squeeze = True
    labels, areas = connected_components(m.astype(bool))
    if squeeze:
        labels, areas = labels[:, None], areas[:, None]
    return labels, areas


def fill_holes_in_mask_scores(mask, max_area: int):
    """reference misc.py:312-337 (graceful wrapper over the XLA kernel)."""
    from sam2_opt_tpu.ops.connected_components import (
        fill_holes_in_mask_scores as _fill,
    )

    try:
        return _fill(mask, max_area)
    except Exception as e:  # pragma: no cover — parity with the CUDA fallback
        import warnings

        warnings.warn(
            f"{e}\n\nSkipping hole filling due to the error above.",
            category=UserWarning,
            stacklevel=2,
        )
        return mask


class AsyncVideoFrameLoader:
    """Background-thread frame loader (reference misc.py:104-149): decodes
    frames ahead of the tracking loop and re-raises worker exceptions on the
    consumer thread."""

    def __init__(self, paths, image_size: int, lookahead: int = 32):
        from sam2_opt_tpu.io.video import _resize_uint8

        self.paths = list(paths)
        self.image_size = image_size
        self.lookahead = max(int(lookahead), 1)
        self.frames: Dict[int, np.ndarray] = {}
        self._consumed = -1  # highest index already returned to the consumer
        self.exception: Optional[BaseException] = None
        self._cv = threading.Condition()
        self._resize = _resize_uint8

        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _decode(self, idx: int) -> np.ndarray:
        from PIL import Image

        img = np.asarray(Image.open(self.paths[idx]).convert("RGB"))
        return self._resize(img, self.image_size)

    def _worker(self):
        try:
            i, n = 0, len(self.paths)
            while i < n:
                # bounded lookahead: stay at most `lookahead` frames ahead of
                # the consumer, evicting frames it has moved past — a 10k-
                # frame video must not be fully resident
                with self._cv:
                    while (
                        i - self._consumed > self.lookahead
                        and self.exception is None
                    ):
                        self._cv.wait(timeout=60)
                    # a consumer seek may have moved the window PAST i (the
                    # skipped frames are decoded on demand by the consumer):
                    # follow it instead of grinding through stale frames
                    i = max(i, self._consumed + 1)
                    if i >= n:
                        break
                frame = self._decode(i)
                with self._cv:
                    self.frames[i] = frame
                    for k in [k for k in self.frames
                              if k < self._consumed - 1]:
                        del self.frames[k]
                    self._cv.notify_all()
                i += 1
        except BaseException as e:  # trampoline to the consumer (misc.py:125-149)
            with self._cv:
                self.exception = e
                self._cv.notify_all()

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int) -> np.ndarray:
        if not 0 <= idx < len(self.paths):
            raise IndexError(idx)
        with self._cv:
            if self.exception is not None:
                raise self.exception
            if idx in self.frames:
                self._consumed = max(self._consumed, idx)
                self._cv.notify_all()
                return self.frames[idx]
            # Not prefetched. Two on-demand cases, both decoded here (outside
            # the lock) so the worker keeps streaming:
            #  - behind the window (evicted / skipped by an earlier seek);
            #  - a forward SEEK beyond the prefetch window — waiting would
            #    deadlock: the worker parks until `_consumed` advances, and
            #    `_consumed` only advances when a frame is returned. Advance
            #    the window to the seek target so the worker follows.
            on_demand = (idx <= self._consumed
                         or idx - self._consumed > self.lookahead)
            if on_demand:
                self._consumed = max(self._consumed, idx)
                self._cv.notify_all()
        if on_demand:
            return self._decode(idx)
        with self._cv:
            while idx not in self.frames and self.exception is None:
                if idx <= self._consumed:
                    # another consumer seeked past idx while we waited; the
                    # worker follows _consumed and may never decode idx —
                    # fall back to on-demand instead of waiting forever
                    break
                self._cv.wait(timeout=60)
            if self.exception is not None:
                raise self.exception
            if idx in self.frames:
                self._consumed = max(self._consumed, idx)
                self._cv.notify_all()
                return self.frames[idx]
        return self._decode(idx)
