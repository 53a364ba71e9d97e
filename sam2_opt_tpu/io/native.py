"""ctypes bindings for the native sam2io library (csrc/sam2io.cpp).

Builds the shared library on first use (make -C csrc) and degrades to pure
Python gracefully — every entry point has a numpy/PIL fallback, preserving
the reference's "native fast path with graceful fallback" contract
(utils/misc.py:321-337).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_LIB = None
_LIB_LOCK = threading.Lock()
_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
)


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB or None
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB or None
        so = os.path.join(_CSRC, "libsam2io.so")
        if not os.path.exists(so):
            try:
                subprocess.run(
                    ["make", "-C", _CSRC, "-s"], check=True,
                    capture_output=True, timeout=120,
                )
            except Exception:
                _LIB = False
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _LIB = False
            return None
        lib.decode_jpeg_resize.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int,
        ]
        lib.decode_jpeg_resize.restype = ctypes.c_int
        lib.jpeg_dims.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.jpeg_dims.restype = ctypes.c_int
        lib.decode_jpeg_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.decode_jpeg_batch.restype = ctypes.c_int
        lib.rle_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
        ]
        lib.rle_encode.restype = ctypes.c_int
        lib.rle_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.mask_to_box.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
        return lib


def available() -> bool:
    return _load() is not None


def jpeg_dims(path: str):
    """(h, w) of a JPEG, or None on failure/unavailable."""
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.jpeg_dims(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def decode_jpeg_batch(paths: List[str], size: int,
                      num_threads: Optional[int] = None) -> Optional[np.ndarray]:
    """Threaded native decode of JPEGs into [N, size, size, 3] uint8;
    None if the native lib is unavailable or any file failed."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    joined = "\n".join(paths).encode()
    nt = num_threads or min(8, os.cpu_count() or 1)
    failures = lib.decode_jpeg_batch(
        joined, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size, size, nt,
    )
    if failures:
        return None
    return out


def rle_encode(mask: np.ndarray) -> Optional[dict]:
    """pycoco uncompressed RLE of a bool [H, W] mask via native code."""
    lib = _load()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m.shape
    buf = np.empty(h * w + 2, np.uint32)
    n = lib.rle_encode(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), buf.size,
    )
    if n < 0:
        return None
    # encoder invariant: counts always starts with a background run
    # (possibly 0 when the first pixel is foreground)
    counts = buf[:n].tolist()
    return {"size": [h, w], "counts": counts}


def rle_decode(rle: dict) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    h, w = rle["size"]
    counts = np.asarray(rle["counts"], np.uint32)
    out = np.zeros((h, w), np.uint8)
    lib.rle_decode(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        len(counts), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)


def mask_to_box(mask: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask.astype(np.uint8))
    box = np.zeros(4, np.int32)
    lib.mask_to_box(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        m.shape[0], m.shape[1],
        box.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return box
