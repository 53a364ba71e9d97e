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
