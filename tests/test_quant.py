"""Int8 quantization tests: weight roundtrip accuracy, tree rewrite, and the
quantized encoder forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam2_opt_tpu.config import model_config
from sam2_opt_tpu.models.init import init_params
from sam2_opt_tpu.ops.common import linear
from sam2_opt_tpu.quant.int8 import (
    is_quantized,
    quantize_params,
    quantize_weight,
    quantized_linear,
)


def test_weight_quant_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 128)).astype(np.float32)
    q, scale = quantize_weight(w)
    deq = q.astype(np.float32) * scale
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01  # 7-bit resolution


def test_quantized_linear_weight_only():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((32, 64)).astype(np.float32)
    b = rng.standard_normal(64).astype(np.float32)
    x = rng.standard_normal((4, 32)).astype(np.float32)
    q, s = quantize_weight(w)
    p = {"w_int8": jnp.asarray(q), "w_scale": jnp.asarray(s),
         "bias": jnp.asarray(b)}
    y_q = np.asarray(quantized_linear(p, jnp.asarray(x)))
    y_f = x @ w + b
    rel = np.abs(y_q - y_f).max() / np.abs(y_f).max()
    assert rel < 0.03, rel


def test_quantized_linear_int8_activations():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((32, 64)).astype(np.float32)
    x = rng.standard_normal((4, 32)).astype(np.float32)
    q, s = quantize_weight(w)
    p = {
        "w_int8": jnp.asarray(q),
        "w_scale": jnp.asarray(s),
        "act_scale": jnp.asarray(np.abs(x).max() / 127.0, jnp.float32),
    }
    y_q = np.asarray(quantized_linear(p, jnp.asarray(x)))
    y_f = x @ w
    rel = np.abs(y_q - y_f).max() / np.abs(y_f).max()
    assert rel < 0.05


def test_quantize_params_tree_and_forward(tiny128_cfg, tiny128_params):
    cfg = tiny128_cfg
    params = tiny128_params
    qparams = quantize_params(params)
    # trunk qkv quantized; decoder untouched
    blk = qparams["image_encoder"]["trunk"]["blocks"][0]["attn"]["qkv"]
    assert is_quantized(blk)
    assert not is_quantized(
        qparams["sam_mask_decoder"]["transformer"]["layers"][0]["self_attn"]["q_proj"]
    )

    # forward parity within int8 tolerance
    from sam2_opt_tpu.models import sam2_base as base

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((1, 128, 128, 3)), jnp.float32)
    out_f = base.forward_image(params, cfg, base.image_normalize(img))
    out_q = base.forward_image(qparams, cfg, base.image_normalize(img))
    a = np.asarray(out_f["backbone_fpn"][2])
    b = np.asarray(out_q["backbone_fpn"][2])
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.15, rel  # int8 weight noise through 12 blocks
