"""Flash-attention kernel vs unfused SDPA (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam2_opt_tpu.kernels.flash_attention import flash_attention
from sam2_opt_tpu.ops.common import scaled_dot_product_attention


@pytest.mark.parametrize(
    "B,H,Sq,Skv,D,masked",
    [
        (1, 2, 256, 256, 64, False),
        (1, 1, 256, 640, 72, True),     # unaligned head dim + kv mask
        (2, 1, 128, 384, 256, True),
    ],
)
def test_flash_matches_sdpa(B, H, Sq, Skv, D, masked):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, Sq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    mask = None
    mask_b = None
    if masked:
        m = rng.random((B, Skv)) > 0.3
        m[:, :4] = True  # no fully-masked rows
        mask = jnp.asarray(m)
        mask_b = mask[:, None, None, :]
    ref = scaled_dot_product_attention(q, k, v, mask=mask_b)
    out = flash_attention(q, k, v, kv_mask=mask, block_q=128, block_k=128,
                          interpret=True)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 2e-5, err


def test_window_kernel_matches_sdpa():
    """kernels/window_attention.py (opt-in via SAM2_TPU_WINDOW_KERNEL=1)
    must match SDPA on windowed shapes; run in Pallas interpret mode on CPU."""
    from sam2_opt_tpu.kernels.window_attention import window_attention
    from sam2_opt_tpu.ops.common import scaled_dot_product_attention

    rng = np.random.default_rng(11)
    N, S, D = 8, 64, 96
    q = jnp.asarray(rng.standard_normal((N, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((N, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, S, D)), jnp.float32)
    out = window_attention(q, k, v, interpret=True)
    ref = scaled_dot_product_attention(q[:, None], k[:, None], v[:, None])[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_or_sdpa_window_flag(monkeypatch):
    """The SAM2_TPU_WINDOW_KERNEL=1 dispatch path is wired and numerically
    consistent with the default path."""
    import sam2_opt_tpu.kernels.window_attention as wk
    from sam2_opt_tpu.ops import common as ops

    rng = np.random.default_rng(12)
    B, H, S, D = 2, 2, 64, 32
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    base = ops.flash_or_sdpa(q, k, v)

    orig = wk.window_attention
    monkeypatch.setattr(
        wk, "window_attention",
        lambda *a, **kw: orig(*a, interpret=True, **kw),
    )
    monkeypatch.setenv("SAM2_TPU_WINDOW_KERNEL", "1")
    monkeypatch.setenv("SAM2_TPU_FLASH", "1")
    out = ops.flash_or_sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_flash_gradients_match_sdpa():
    """The flash kernel's custom VJP (softmax-recompute backward) must match
    SDPA gradients — without it, training on TPU (where flash is the default
    attention) fails to differentiate at all."""
    from sam2_opt_tpu.kernels.flash_attention import flash_attention
    from sam2_opt_tpu.ops.common import scaled_dot_product_attention

    rng = np.random.default_rng(13)
    B, H, Sq, Skv, D = 1, 2, 128, 192, 64
    q = jnp.asarray(rng.standard_normal((B, H, Sq, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Skv, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Skv, D)) * 0.3, jnp.float32)
    m = np.ones((B, Skv), bool)
    m[:, 150:] = False
    mask = jnp.asarray(m)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, kv_mask=mask, block_q=128, block_k=128,
                            interpret=True)
        return jnp.sum(o * o)

    def loss_sdpa(q, k, v):
        o = scaled_dot_product_attention(q, k, v, mask=mask[:, None, None, :])
        return jnp.sum(o * o)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(loss_sdpa, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gs, "qkv"):
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 1e-4, f"d{name} err {err}"


def test_fast_softmax_bf16_close_to_fp32(monkeypatch):
    """bf16-logit SDPA (the default bf16 compute path) must stay close to the
    fp32-logit result, and fp32 inputs must be byte-identical regardless of
    the flag (the parity path is untouched)."""
    from sam2_opt_tpu.ops import common as ops

    rng = np.random.default_rng(14)
    q32 = jnp.asarray(rng.standard_normal((2, 4, 64, 32)), jnp.float32)
    k32 = jnp.asarray(rng.standard_normal((2, 4, 64, 32)), jnp.float32)
    v32 = jnp.asarray(rng.standard_normal((2, 4, 64, 32)), jnp.float32)

    monkeypatch.setenv("SAM2_TPU_FAST_SOFTMAX", "1")
    ref32 = ops.scaled_dot_product_attention(q32, k32, v32)
    monkeypatch.setenv("SAM2_TPU_FAST_SOFTMAX", "0")
    assert np.array_equal(
        np.asarray(ref32),
        np.asarray(ops.scaled_dot_product_attention(q32, k32, v32)),
    )

    monkeypatch.setenv("SAM2_TPU_FAST_SOFTMAX", "1")
    out_fast = ops.scaled_dot_product_attention(
        q32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16),
        v32.astype(jnp.bfloat16),
    )
    err = np.abs(np.asarray(out_fast, np.float32) - np.asarray(ref32)).max()
    assert err < 0.1, err  # bf16 rounding through logits+softmax, not junk
