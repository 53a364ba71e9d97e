"""Native sam2io library tests: build, RLE parity, JPEG decode, loader path."""

import os

import numpy as np
import pytest

from sam2_opt_tpu.io import native
from sam2_opt_tpu.utils import amg as A


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native sam2io could not be built")
    return True


def test_rle_parity_with_python(lib_available):
    rng = np.random.default_rng(0)
    for shape in [(33, 57), (64, 64)]:
        mask = rng.random(shape) > 0.5
        ours = native.rle_encode(mask)
        ref = A.mask_to_rle(mask[None])[0]
        assert ours["size"] == ref["size"]
        assert ours["counts"] == ref["counts"]
        back = native.rle_decode(ours)
        assert np.array_equal(back, mask)


def test_mask_to_box(lib_available):
    m = np.zeros((20, 30), bool)
    m[3:9, 5:25] = True
    assert native.mask_to_box(m).tolist() == [5, 3, 24, 8]
    assert native.mask_to_box(np.zeros((4, 4), bool)).tolist() == [0, 0, 0, 0]


def test_jpeg_decode_matches_pil(lib_available, tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    # low-frequency image so JPEG loss is small
    base = rng.random((8, 8, 3)) * 255
    img = np.kron(base, np.ones((16, 16, 1))).astype(np.uint8)  # 128x128
    p = str(tmp_path / "a.jpg")
    Image.fromarray(img).save(p, quality=95)

    assert native.jpeg_dims(p) == (128, 128)
    out = native.decode_jpeg_batch([p], 64)
    assert out is not None and out.shape == (1, 64, 64, 3)

    ref = np.asarray(Image.open(p).convert("RGB").resize((64, 64), Image.BILINEAR))
    diff = np.abs(out[0].astype(int) - ref.astype(int)).mean()
    assert diff < 8.0, diff  # same content modulo resampling differences


def test_video_loader_uses_native(lib_available, tmp_path):
    from PIL import Image

    from sam2_opt_tpu.io.video import load_video_frames

    d = tmp_path / "vid"
    os.makedirs(d)
    rng = np.random.default_rng(2)
    for t in range(5):
        Image.fromarray((rng.random((60, 80, 3)) * 255).astype(np.uint8)).save(
            d / f"{t}.jpg"
        )
    frames, h, w = load_video_frames(str(d), image_size=64)
    assert (h, w) == (60, 80)
    assert frames.frames.shape == (5, 64, 64, 3)
