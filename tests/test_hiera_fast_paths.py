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


def test_fused_mlp_kernel_matches_unfused():
    """kernels/fused_mlp.py computes the identical MLP (fp32 check incl. the
    hidden-split grid used when the weight panels exceed the VMEM budget)."""
    from sam2_opt_tpu.kernels.fused_mlp import fused_mlp, _reference_mlp

    rng = np.random.default_rng(5)
    for (n, c, h, bh) in [(384, 144, 576, 0), (256, 288, 1152, 384),
                          (130, 64, 256, 0)]:
        x = jnp.asarray(rng.standard_normal((n, c)) * 0.5, jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((c, h)) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal(h) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((h, c)) * 0.05, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
        ref = _reference_mlp(x, w1, b1, w2, b2)
        out = fused_mlp(x, w1, b1, w2, b2, block_tokens=128, block_hidden=bh,
                        interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_fused_mlp_grad_matches_unfused():
    from sam2_opt_tpu.kernels.fused_mlp import fused_mlp, _reference_mlp

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((64, 32)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((32, 128)) * 0.05, jnp.float32)
    b1 = jnp.zeros((128,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((128, 32)) * 0.05, jnp.float32)
    b2 = jnp.zeros((32,), jnp.float32)
    f1 = lambda *a: jnp.sum(jnp.sin(fused_mlp(*a, block_tokens=32,
                                              interpret=True)))
    f2 = lambda *a: jnp.sum(jnp.sin(_reference_mlp(*a)))
    g1 = jax.grad(f1, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g2 = jax.grad(f2, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_mlp_route_matches_default(monkeypatch):
    """SAM2_TPU_FUSED_MLP=1 routes bf16 block MLPs through the Pallas fused
    kernel (a measured NEGATIVE on v5e, default off — flag kept for other
    TPU generations, so the route must stay correct)."""
    rng = np.random.default_rng(7)
    C = 64
    p = {
        "norm2": {"weight": jnp.ones((C,), jnp.float32),
                  "bias": jnp.zeros((C,), jnp.float32)},
        "mlp": {"layers": [
            {"weight": jnp.asarray(rng.standard_normal((C, 4 * C)) * 0.05,
                                   jnp.float32),
             "bias": jnp.zeros((4 * C,), jnp.float32)},
            {"weight": jnp.asarray(rng.standard_normal((4 * C, C)) * 0.05,
                                   jnp.float32),
             "bias": jnp.zeros((C,), jnp.float32)},
        ]},
    }
    x = jnp.asarray(rng.standard_normal((2, 8, 8, C)), jnp.bfloat16)
    monkeypatch.delenv("SAM2_TPU_FUSED_MLP", raising=False)
    base = np.asarray(hiera._block_mlp(p, x), np.float32)
    monkeypatch.setenv("SAM2_TPU_FUSED_MLP", "1")
    fused = np.asarray(hiera._block_mlp(p, x), np.float32)
    err = np.abs(fused - base).max() / (np.abs(base).max() + 1e-9)
    assert err < 0.05, err


def test_hiera_max_blocks_prefix_matches_full():
    """hiera(max_blocks=n) (the per-stage profiler's entry) must compute the
    same prefix the full trunk computes: truncating at a stage end equals
    that stage's pyramid output, and a mid-stage truncation returns a tensor
    of the stage's spatial shape."""
    from sam2_opt_tpu.config import model_config
    from sam2_opt_tpu.models.init import init_params

    cfg = model_config("hiera_t")
    params = init_params(cfg, jax.random.PRNGKey(0))
    tp = params["image_encoder"]["trunk"]
    hcfg = cfg.trunk
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 128, 128, 3)), jnp.float32
    )

    full = hiera.hiera(tp, x, hcfg)
    end0 = hcfg.stage_ends[0]
    pre = hiera.hiera(tp, x, hcfg, max_blocks=end0 + 1)
    assert len(pre) == 1
    np.testing.assert_allclose(
        np.asarray(pre[-1], np.float32), np.asarray(full[0], np.float32),
        rtol=1e-5, atol=1e-5,
    )

    mid = hiera.hiera(tp, x, hcfg, max_blocks=end0 + 2)  # 1 block into stage 2
    assert mid[-1].shape[-1] == full[1].shape[-1]  # stage-2 channel width
    assert hiera.hiera(tp, x, hcfg, max_blocks=0)[-1].shape[1] == x.shape[1] // 4


def test_global_in_window_route_matches_default(monkeypatch):
    """SAM2_TPU_GLOBAL_IN_WINDOW=1 keeps global-attention blocks on the
    window-ordered token layout inside a window run (a measured NEGATIVE on
    v5e, default off — flag kept for other TPU generations, so the route
    must stay correct): outputs must match the default round-trip path to
    reorder precision, and the route must actually skip unpartitions."""
    from sam2_opt_tpu.config import model_config
    from sam2_opt_tpu.models.init import init_params

    # hiera_t with stage-3 windows shrunk to 8 so they divide the 16x16
    # stage-3 feature map of a 256px input: blocks 4/6/8 form a window run
    # around the global blocks 5/7/9.
    cfg = model_config(
        "hiera_t", **{"trunk.window_spec": (8, 4, 8, 4), "trunk.embed_dim": 32}
    )
    params = init_params(cfg, jax.random.PRNGKey(3))
    tp = params["image_encoder"]["trunk"]
    x = jnp.asarray(np.random.default_rng(4).random((1, 256, 256, 3)),
                    jnp.float32)

    unparts = []
    real_unpartition = ops.window_unpartition

    def counting_unpartition(*a, **k):
        unparts.append(1)
        return real_unpartition(*a, **k)

    monkeypatch.setattr(ops, "window_unpartition", counting_unpartition)
    monkeypatch.setattr(hiera.ops, "window_unpartition", counting_unpartition)

    monkeypatch.delenv("SAM2_TPU_GLOBAL_IN_WINDOW", raising=False)
    base = hiera.hiera(tp, x, cfg.trunk)
    n_base = len(unparts)

    unparts.clear()
    monkeypatch.setenv("SAM2_TPU_GLOBAL_IN_WINDOW", "1")
    giw = hiera.hiera(tp, x, cfg.trunk)
    n_giw = len(unparts)

    assert n_giw < n_base, (n_giw, n_base)  # route actually taken
    assert len(giw) == len(base)
    for a, b in zip(giw, base):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-5, atol=2e-5,
        )


def test_fused_mlp_route_skips_int8_layers(monkeypatch):
    """SAM2_TPU_FUSED_MLP=1 with int8-quantized MLP weights ({w_int8,
    w_scale} in place of weight) must fall back to ops.mlp's quantized
    dispatch instead of KeyError-ing on the raw-weight read (regression:
    speedup('int8') + the fused-MLP flag crashed at trace time)."""
    rng = np.random.default_rng(9)
    C = 64
    w1 = rng.standard_normal((C, 4 * C)).astype(np.float32) * 0.05
    w2 = rng.standard_normal((4 * C, C)).astype(np.float32) * 0.05

    def q(w):
        scale = np.abs(w).max(axis=0) / 127.0 + 1e-12
        return {
            "w_int8": jnp.asarray(np.round(w / scale).astype(np.int8)),
            "w_scale": jnp.asarray(scale, jnp.float32),
            "bias": jnp.zeros((w.shape[1],), jnp.float32),
        }

    p_f32 = {
        "norm2": {"weight": jnp.ones((C,), jnp.float32),
                  "bias": jnp.zeros((C,), jnp.float32)},
        "mlp": {"layers": [
            {"weight": jnp.asarray(w1), "bias": jnp.zeros((4 * C,), jnp.float32)},
            {"weight": jnp.asarray(w2), "bias": jnp.zeros((C,), jnp.float32)},
        ]},
    }
    p_int8 = {"norm2": p_f32["norm2"], "mlp": {"layers": [q(w1), q(w2)]}}

    x = jnp.asarray(rng.standard_normal((2, 8, 8, C)), jnp.bfloat16)
    monkeypatch.setenv("SAM2_TPU_FUSED_MLP", "1")
    got = np.asarray(hiera._block_mlp(p_int8, x), np.float32)  # must not raise
    ref = np.asarray(hiera._block_mlp(p_f32, x), np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.1, err
