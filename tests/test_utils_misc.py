"""misc utils, predictor variants, and checkpoint IO tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam2_opt_tpu.utils.misc import (
    AsyncVideoFrameLoader,
    concat_points,
    get_connected_components,
    mask_to_box,
)


def test_mask_to_box():
    m = np.zeros((2, 1, 16, 20), bool)
    m[0, 0, 3:9, 5:15] = True
    boxes = np.asarray(mask_to_box(jnp.asarray(m)))
    assert boxes[0, 0].tolist() == [5, 3, 14, 8]


def test_concat_points():
    p1 = {"point_coords": np.zeros((1, 2, 2)), "point_labels": np.ones((1, 2))}
    out = concat_points(p1, np.ones((1, 1, 2)), np.zeros((1, 1)))
    assert out["point_coords"].shape == (1, 3, 2)
    out2 = concat_points(None, np.ones((1, 1, 2)), np.zeros((1, 1)))
    assert out2["point_coords"].shape == (1, 1, 2)


def test_connected_components_wrapper():
    m = np.zeros((1, 1, 32, 32), bool)
    m[0, 0, 2:6, 2:6] = True
    m[0, 0, 20:30, 20:30] = True
    labels, areas = get_connected_components(m)
    labels = np.asarray(labels)[0, 0]
    areas = np.asarray(areas)[0, 0]
    assert len(np.unique(labels[labels > 0])) == 2
    assert set(np.unique(areas[areas > 0]).tolist()) == {16, 100}


def test_async_frame_loader(tmp_path):
    from PIL import Image

    paths = []
    for t in range(4):
        p = str(tmp_path / f"{t}.jpg")
        Image.fromarray(
            (np.random.default_rng(t).random((40, 50, 3)) * 255).astype(np.uint8)
        ).save(p)
        paths.append(p)
    loader = AsyncVideoFrameLoader(paths, image_size=32)
    assert len(loader) == 4
    assert loader[3].shape == (32, 32, 3)
    assert loader[0].shape == (32, 32, 3)


def test_async_frame_loader_error_trampoline(tmp_path):
    loader = AsyncVideoFrameLoader([str(tmp_path / "missing.jpg")], image_size=32)
    with pytest.raises(Exception):
        loader[0]


def test_variant_selection(monkeypatch):
    from sam2_opt_tpu.predictors.variants import (
        SAM2VideoPredictorDAM4SAM,
        SAM2VideoPredictorLegacy,
        select_video_predictor_cls,
    )
    from sam2_opt_tpu.predictors.video import SAM2VideoPredictor

    monkeypatch.delenv("SAM2_VERSION_TRACK", raising=False)
    assert select_video_predictor_cls() is SAM2VideoPredictor
    monkeypatch.setenv("SAM2_VERSION_TRACK", "dam4sam")
    # dam4sam and legacy are fully implemented tracks
    assert select_video_predictor_cls() is SAM2VideoPredictorDAM4SAM
    assert issubclass(SAM2VideoPredictorDAM4SAM, SAM2VideoPredictor)
    monkeypatch.setenv("SAM2_VERSION_TRACK", "legacy")
    assert select_video_predictor_cls() is SAM2VideoPredictorLegacy
    assert issubclass(SAM2VideoPredictorLegacy, SAM2VideoPredictor)


def test_model_config_dotted_override_pins_rope_feat_sizes():
    """An explicit memory_attention.rope_feat_sizes override must survive the
    image_size/grid re-sync instead of being silently clobbered back to
    (grid, grid); without the override the sync still applies."""
    from sam2_opt_tpu.config import model_config

    cfg = model_config(
        "hiera_t", **{"memory_attention.rope_feat_sizes": (32, 32)}
    )
    assert cfg.memory_attention.rope_feat_sizes == (32, 32)

    synced = model_config("hiera_t", image_size=128)
    grid = 128 // synced.backbone_stride
    assert synced.memory_attention.rope_feat_sizes == (grid, grid)


def test_params_native_roundtrip(tmp_path, tiny128_params):
    from sam2_opt_tpu.io.checkpoints import load_params, save_params

    params = tiny128_params
    path = str(tmp_path / "params")
    save_params(path, params)
    restored = load_params(path)
    a = np.asarray(params["no_obj_ptr"])
    b = np.asarray(restored["no_obj_ptr"])
    assert np.array_equal(a, b)
    # int-keyed levels preserved
    assert np.array_equal(
        np.asarray(params["image_encoder"]["trunk"]["blocks"][0]["norm1"]["weight"]),
        np.asarray(restored["image_encoder"]["trunk"]["blocks"][0]["norm1"]["weight"]),
    )


def test_obj_ptr_capacity_grows_beyond_max(tiny128_cfg, tiny128_params):
    """With >=2 past cond frames the reference attends to cond pointers PLUS
    up to (max_obj_ptrs-1) non-cond pointers — more than
    max_obj_ptrs_in_encoder total (sam2_base_official.py:886-948). The padded
    pointer capacity must grow (in buckets of 8), not silently truncate."""
    import jax.numpy as jnp

    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.video import SAM2VideoPredictor

    vp = SAM2VideoPredictor(SAM2Model(tiny128_params, tiny128_cfg))
    cfg = vp.cfg
    g = cfg.image_embedding_size

    def out(i):
        return {
            "maskmem_features": jnp.zeros((1, g, g, cfg.mem_dim), jnp.bfloat16),
            "obj_ptr": jnp.full((1, cfg.hidden_dim), float(i), jnp.float32),
            "pred_masks": None,
            "object_score_logits": jnp.zeros((1, 1), jnp.float32),
        }

    od = {
        "cond_frame_outputs": {0: out(0), 2: out(2), 4: out(4)},
        "non_cond_frame_outputs": {t: out(t) for t in range(5, 30)},
    }
    mem = vp._gather_memory({"num_frames": 40}, od, 30, reverse=False)
    # 3 cond pointers + (16 - 1) non-cond pointers, none dropped
    assert int(np.asarray(mem.ptr_valid).sum()) == 18
    assert len(mem.ptrs) == 24  # next bucket of 8 above 18

    # a single cond frame stays at the default capacity
    od1 = {
        "cond_frame_outputs": {0: out(0)},
        "non_cond_frame_outputs": {t: out(t) for t in range(5, 30)},
    }
    mem1 = vp._gather_memory({"num_frames": 40}, od1, 30, reverse=False)
    assert len(mem1.ptrs) == tiny128_cfg.max_obj_ptrs_in_encoder
    assert int(np.asarray(mem1.ptr_valid).sum()) == 16


def test_load_video_frames_float_ndarray():
    """Float frames in [0,1] (the graph's own format) and [0,255] must not be
    truncated to black by a bare uint8 cast."""
    from sam2_opt_tpu.io.video import load_video_frames

    rng = np.random.default_rng(0)
    base = rng.random((2, 64, 64, 3)).astype(np.float32)

    src01, vh, vw = load_video_frames(base, image_size=64)
    assert (vh, vw) == (64, 64)
    np.testing.assert_allclose(
        np.asarray(src01.frames), np.rint(base * 255), atol=1
    )

    src255, _, _ = load_video_frames(base * 255.0, image_size=64)
    np.testing.assert_allclose(
        np.asarray(src255.frames), np.rint(base * 255), atol=1
    )


def test_jpeg_dir_numeric_suffix_ordering(tmp_path):
    """frame_2.jpg must precede frame_10.jpg (trailing-digit ordering, not
    lexicographic); undigited names raise instead of silently shuffling."""
    from PIL import Image

    from sam2_opt_tpu.io.video import _load_jpeg_dir

    d = tmp_path / "frames"
    d.mkdir()
    for i in (1, 2, 10, 11):
        Image.fromarray(np.full((8, 8, 3), i, np.uint8)).save(
            d / f"frame_{i}.jpg"
        )
    frames, vh, vw = _load_jpeg_dir(str(d), 8)
    order = [int(np.asarray(f).mean().round()) for f in frames]
    assert order == sorted(order), order

    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(d / "cover.jpg")
    with pytest.raises(RuntimeError, match="frame number"):
        _load_jpeg_dir(str(d), 8)


def test_image_predict_multi_box_keeps_all_masks(tiny128_cfg, tiny128_params):
    """predict() mirrors the reference's squeeze(0) (:451-454): two boxes
    return two mask sets; a single prompt drops the leading axis. Also:
    set_image_batch accepts heterogeneous image sizes (per-image resize
    before stacking, like SAM2Transforms.forward_batch)."""
    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.image import SAM2ImagePredictor

    p = SAM2ImagePredictor(SAM2Model(tiny128_params, tiny128_cfg))
    rng = np.random.default_rng(0)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    p.set_image(img)

    boxes = np.array([[5, 5, 30, 30], [32, 32, 60, 60]], np.float32)
    masks, ious, low = p.predict(box=boxes, multimask_output=False)
    assert masks.shape[0] == 2 and masks.shape[-2:] == (64, 64)
    assert ious.shape[0] == 2 and low.shape[0] == 2

    m1, i1, l1 = p.predict(box=boxes[:1], multimask_output=False)
    assert m1.ndim == 3  # single prompt: leading axis squeezed

    # heterogeneous batch sizes
    img2 = (rng.random((48, 96, 3)) * 255).astype(np.uint8)
    p.set_image_batch([img, img2])
    bm, bi, bl = p.predict_batch(
        point_coords_batch=[np.array([[10.0, 10.0]]), np.array([[20.0, 20.0]])],
        point_labels_batch=[np.array([1]), np.array([1])],
        multimask_output=False,
    )
    assert bm[0].shape[-2:] == (64, 64) and bm[1].shape[-2:] == (48, 96)


def test_sprinkle_components_use_original_mask():
    """Sprinkle suppression evaluates components of the ORIGINAL logits
    (reference transforms.py:86-106 builds mask_flat once): a small island
    adjacent to a filled hole must still be suppressed."""
    from sam2_opt_tpu.ops.connected_components import fill_holes_and_sprinkles

    m = np.full((1, 16, 16), -5.0, np.float32)
    m[0, 4:8, 4:8] = 5.0        # big foreground blob (16 px)
    m[0, 5:7, 5:7] = -5.0       # 4-px hole inside it
    m[0, 5:7, 8:10] = 5.0       # 4-px island touching the blob? no: gap
    # place a separate small island adjacent to (but separated from) the hole
    m2 = np.full((1, 16, 16), -5.0, np.float32)
    m2[0, 4, 4:6] = 5.0         # 2-px island
    m2[0, 4, 6] = -5.0          # 1-px "hole" column adjacent (background)
    m2[0, 4, 7:9] = 5.0         # another 2-px island
    # hole fill (area<=1) turns column 6 positive, which would BRIDGE the two
    # islands into one 5-px component if sprinkles were computed after filling
    out = np.asarray(fill_holes_and_sprinkles(
        __import__("jax.numpy", fromlist=["x"]).asarray(m2),
        mask_threshold=0.0, max_hole_area=1.0, max_sprinkle_area=3.0,
    ))
    # both original 2-px islands are suppressed despite the filled bridge
    assert (out[0, 4, 4:6] < 0).all() and (out[0, 4, 7:9] < 0).all()


def test_async_loader_bounded_lookahead_and_bounds(tmp_path):
    """The async loader keeps at most ~lookahead frames resident ahead of the
    consumer (a long video must not be fully decoded into RAM), serves
    evicted frames by on-demand decode, and raises IndexError out of range."""
    import time

    from PIL import Image

    paths = []
    for i in range(12):
        p = tmp_path / f"{i:03d}.jpg"
        Image.fromarray(np.full((8, 8, 3), i * 20, np.uint8)).save(p)
        paths.append(str(p))

    loader = AsyncVideoFrameLoader(paths, image_size=8, lookahead=3)
    # without consumption the worker must stall near the lookahead bound
    deadline = time.time() + 10
    while time.time() < deadline and len(loader.frames) < 4:
        time.sleep(0.05)
    time.sleep(0.3)
    assert len(loader.frames) <= 6, "worker decoded far past the lookahead"

    # consuming in order lets it advance; values are the expected frames
    for i in range(12):
        f = loader[i]
        assert abs(int(np.asarray(f).mean().round()) - min(i * 20, 255)) <= 1
    # frames behind the consumer were evicted, but remain readable on demand
    assert len(loader.frames) <= 6
    f0 = loader[0]
    assert int(np.asarray(f0).mean().round()) == 0

    with pytest.raises(IndexError):
        loader[12]
    with pytest.raises(IndexError):
        loader[-1]


def test_async_loader_forward_seek_no_deadlock(tmp_path):
    """Requesting a frame beyond the prefetch window is a SEEK, not a
    deadlock: the consumer gets the frame on demand and the worker follows
    the moved window (regression: both sides used to wait on each other
    forever — the worker for `_consumed` to advance, the consumer for the
    out-of-window frame to appear)."""
    import time

    from PIL import Image

    paths = []
    for i in range(12):
        p = tmp_path / f"{i:03d}.jpg"
        Image.fromarray(np.full((8, 8, 3), i * 20, np.uint8)).save(p)
        paths.append(str(p))

    loader = AsyncVideoFrameLoader(paths, image_size=8, lookahead=3)
    t0 = time.time()
    f9 = loader[9]  # far beyond the fresh loader's window [0..3]
    assert time.time() - t0 < 30, "forward seek hung"
    assert abs(int(np.asarray(f9).mean().round()) - 180) <= 1
    # the window followed the seek: subsequent frames stream normally
    f10 = loader[10]
    assert abs(int(np.asarray(f10).mean().round()) - 200) <= 1
    # backward reads (skipped by the seek) decode on demand
    f2 = loader[2]
    assert abs(int(np.asarray(f2).mean().round()) - 40) <= 1


def test_jpeg_dir_duplicate_frame_numbers_raise(tmp_path):
    """clip1_0001.jpg vs clip2_0001.jpg share a trailing frame number — the
    interleave would be os.listdir-order-dependent, so refuse (regression:
    stable sort silently picked filesystem enumeration order)."""
    from PIL import Image

    from sam2_opt_tpu.io.video import _load_jpeg_dir

    d = tmp_path / "frames"
    d.mkdir()
    for clip in ("clip1", "clip2"):
        for i in (1, 2):
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
                d / f"{clip}_{i:04d}.jpg"
            )
    with pytest.raises(RuntimeError, match="ambiguous"):
        _load_jpeg_dir(str(d), 8)


def test_load_video_frames_unit_range_overshoot():
    """[0,1] frames with slight overshoot (e.g. 1.003 from augmentation) must
    still be read as unit-range, not floored to near-black by a [0,255]
    interpretation (regression: threshold was exactly 1.0+1e-6)."""
    from sam2_opt_tpu.io.video import load_video_frames

    rng = np.random.default_rng(1)
    base = rng.random((2, 64, 64, 3)).astype(np.float32) * 1.003
    src, _, _ = load_video_frames(base, image_size=64)
    np.testing.assert_allclose(
        np.asarray(src.frames), np.clip(np.rint(base * 255), 0, 255), atol=1
    )
