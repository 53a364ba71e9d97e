"""Hiera encoder graph fast paths: space-to-depth patch embed and the
window-attention routing knobs (models/hiera.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam2_opt_tpu.models import hiera
from sam2_opt_tpu.ops import common as ops


def test_patch_embed_s2d_matches_direct_conv():
    """The space-to-depth patch embed (pad kernel to 8x8, s2d by 4, 2x2 conv)
    must compute the identical sums as the direct 7x7 stride-4 pad-3 conv —
    the added tap is zero-weighted and the trailing pad row is sliced off."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 32)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(32) * 0.01, jnp.float32)
    p = {"proj": {"weight": w, "bias": b}}
    for hw in (64, 128):
        x = jnp.asarray(rng.standard_normal((1, hw, hw, 3)), jnp.float32)
        ref = ops.conv2d(p["proj"], x, stride=(4, 4), padding=[(3, 3), (3, 3)])
        out = hiera._patch_embed_s2d(p, x)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_packed_window_route_matches_default(monkeypatch):
    """SAM2_TPU_PACKED_WINDOW=<n> routes bf16 windows of <= n tokens through
    the packed block-diagonal kernel; the result must match the default
    route. (The packed kernel measured SLOWER on v5e and defaults off — the
    flag is kept for other TPU generations, so the route must stay correct.)"""
    rng = np.random.default_rng(1)
    C, heads = 64, 2
    p = {
        "qkv": {"weight": jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.1,
                                      jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(3 * C) * 0.01,
                                    jnp.float32)},
        "proj": {"weight": jnp.asarray(rng.standard_normal((C, C)) * 0.1,
                                       jnp.float32),
                 "bias": jnp.asarray(rng.standard_normal(C) * 0.01,
                                     jnp.float32)},
    }
    x = jnp.asarray(rng.standard_normal((4, 4, 4, C)), jnp.bfloat16)  # S=16
    monkeypatch.setenv("SAM2_TPU_FLASH", "1")
    monkeypatch.delenv("SAM2_TPU_PACKED_WINDOW", raising=False)
    base = np.asarray(hiera.multiscale_attention(p, x, heads), np.float32)
    monkeypatch.setenv("SAM2_TPU_PACKED_WINDOW", "16")
    packed = np.asarray(hiera.multiscale_attention(p, x, heads), np.float32)
    err = np.abs(packed - base).max() / (np.abs(base).max() + 1e-9)
    assert err < 0.05, err


def test_split_window_min_knob(monkeypatch):
    """SAM2_TPU_SPLIT_WINDOW_MIN lowers the split-qkv gate; routing S=16
    windows through the split path must stay numerically consistent with the
    interleaved default."""
    rng = np.random.default_rng(2)
    C, heads = 64, 2
    p = {
        "qkv": {"weight": jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.1,
                                      jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(3 * C) * 0.01,
                                    jnp.float32)},
        "proj": {"weight": jnp.asarray(rng.standard_normal((C, C)) * 0.1,
                                       jnp.float32),
                 "bias": jnp.asarray(rng.standard_normal(C) * 0.01,
                                     jnp.float32)},
    }
    x = jnp.asarray(rng.standard_normal((4, 4, 4, C)), jnp.bfloat16)
    monkeypatch.setenv("SAM2_TPU_FLASH", "1")
    base = np.asarray(hiera.multiscale_attention(p, x, heads), np.float32)
    monkeypatch.setenv("SAM2_TPU_SPLIT_WINDOW_MIN", "16")
    split = np.asarray(hiera.multiscale_attention(p, x, heads), np.float32)
    err = np.abs(split - base).max() / (np.abs(base).max() + 1e-9)
    assert err < 0.05, err
