"""Core numeric primitives (channels-last / NHWC throughout).

These are the TPU-idiomatic equivalents of the torch building blocks used by
the reference model. Parameters follow the converted-torch convention:
linear weights are stored as [in, out] (transposed from torch), conv kernels as
HWIO, conv-transpose kernels as HWOI; see sam2_opt_tpu/io/torch_convert.py.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def linear(p, x):
    """x @ W + b with W [in, out]. Transparently handles int8-quantized
    weights produced by sam2_opt_tpu.quant.int8.quantize_params."""
    if "w_int8" in p:
        from sam2_opt_tpu.quant.int8 import quantized_linear

        return quantized_linear(p, x)
    y = jnp.matmul(x, p["weight"], preferred_element_type=x.dtype)
    if "bias" in p:
        y = y + p["bias"]
    return y


def layer_norm(p, x, eps: float = 1e-5):
    """LayerNorm over the last axis (torch nn.LayerNorm semantics).

    fp32 inputs use the exact two-pass form (parity path). Low-precision
    inputs keep the elementwise math in the input dtype with fp32 reduction
    accumulators only — avoids materializing fp32 copies of activations in
    HBM (the encode path is bandwidth-bound).
    """
    if x.dtype == jnp.float32:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        return y * p["weight"] + p["bias"]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    m2 = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    scale = (jax.lax.rsqrt(var + eps) * p["weight"].astype(jnp.float32)).astype(x.dtype)
    shift = (p["bias"].astype(jnp.float32) - mean * jax.lax.rsqrt(var + eps)
             * p["weight"].astype(jnp.float32)).astype(x.dtype)
    return x * scale + shift


def layer_norm_2d(p, x, eps: float = 1e-6):
    """Reference LayerNorm2d (sam2_utils.py:141): normalizes over the channel
    axis only. Input here is NHWC, so this is identical to `layer_norm` but with
    the reference's default eps of 1e-6."""
    return layer_norm(p, x, eps=eps)


def mlp(p, x, num_layers: int, activation=jax.nn.relu, sigmoid_output: bool = False):
    """Reference MLP (sam2_utils.py:112): Linear stack with activation between."""
    for i in range(num_layers):
        x = linear(p["layers"][i], x)
        if i < num_layers - 1:
            x = activation(x)
    if sigmoid_output:
        x = jax.nn.sigmoid(x)
    return x


def drop_path(x, rng, drop_prob: float = 0.0, training: bool = False,
              scale_by_keep: bool = True):
    """Stochastic depth (reference sam2_utils.py:92-107 DropPath). Identity at
    inference or drop_prob 0."""
    if drop_prob == 0.0 or not training:
        return x
    keep_prob = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jax.random.bernoulli(rng, keep_prob, shape).astype(x.dtype)
    if keep_prob > 0.0 and scale_by_keep:
        keep = keep / keep_prob
    return x * keep


def gelu(x):
    """torch nn.GELU default = exact erf formulation (fp32 parity path).
    Under bf16 compute the tanh approximation is used — its ~1e-3 relative
    deviation is below bf16 rounding noise and the erf transcendental is
    measurably slower on the VPU."""
    if x.dtype == jnp.float32:
        return jax.nn.gelu(x, approximate=False)
    return jax.nn.gelu(x, approximate=True)


def conv2d(
    p,
    x,
    stride: Tuple[int, int] = (1, 1),
    padding="SAME",
    feature_group_count: int = 1,
):
    """NHWC conv with HWIO kernel. `padding` is either a lax padding string or
    explicit [(lo,hi),(lo,hi)]."""
    y = jax.lax.conv_general_dilated(
        x,
        p["weight"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv2d_nonoverlap(p, x):
    """Non-overlapping strided conv (kernel == stride, no padding) as
    space-to-depth + matmul. Mathematically identical to conv2d but avoids
    XLA's space-to-batch conv pass (which CHECK-fails on the backprop-filter
    form of these convs) and feeds the MXU a dense matmul."""
    w = p["weight"]  # [kh, kw, C, O]
    kh, kw, C, O = w.shape
    B, H, W, _ = x.shape
    patches = x.reshape(B, H // kh, kh, W // kw, kw, C)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
        B, H // kh, W // kw, kh * kw * C
    )
    y = jnp.matmul(patches, w.reshape(kh * kw * C, O).astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv_transpose2d(p, x, stride: Tuple[int, int] = (2, 2)):
    """NHWC transposed conv with HWOI kernel, matching torch ConvTranspose2d
    with kernel_size == stride and no padding (the only form used by the
    reference mask decoder, mask_decoder.py:66-76)."""
    y = jax.lax.conv_transpose(
        x,
        p["weight"].astype(x.dtype),  # [kh, kw, out, in] (converted from torch IOHW)
        strides=stride,
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def max_pool2d(x, window: Tuple[int, int], stride: Tuple[int, int]):
    """NHWC max pool, ceil_mode=False (torch default)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *stride, 1),
        padding="VALID",
    )


def window_partition(x, window_size: int):
    """[B,H,W,C] -> [B*nW, ws, ws, C] with zero padding on the bottom/right
    (reference backbones/utils.py:16-36). Returns (windows, (Hp, Wp))."""
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window_size, window_size, Wp // window_size, window_size, C)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, C)
    return windows, (Hp, Wp)


def window_unpartition(windows, window_size: int, pad_hw, hw):
    """Inverse of window_partition (reference backbones/utils.py:39-60)."""
    Hp, Wp = pad_hw
    H, W = hw
    C = windows.shape[-1]
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.reshape(
        B, Hp // window_size, Wp // window_size, window_size, window_size, C
    )
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, :H, :W, :]


def interpolate(x, size: Tuple[int, int], method: str = "bilinear", antialias: bool = False):
    """NHWC spatial resize matching torch F.interpolate(align_corners=False).

    jax.image.resize uses half-pixel sampling which matches torch's
    align_corners=False; 'nearest' matches torch's legacy nearest (floor)
    indexing via explicit index computation.
    """
    B, H, W, C = x.shape
    h, w = size
    if method == "nearest":
        # torch 'nearest': src_idx = floor(dst_idx * scale)
        rows = jnp.floor(jnp.arange(h) * (H / h)).astype(jnp.int32)
        cols = jnp.floor(jnp.arange(w) * (W / w)).astype(jnp.int32)
        return x[:, rows][:, :, cols]
    jax_method = {"bilinear": "linear", "bicubic": "cubic"}[method]
    return jax.image.resize(x, (B, h, w, C), method=jax_method, antialias=antialias)


def upsample2x_nearest(x):
    """Exact 2x nearest upsample (used by the FPN top-down path)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


def use_flash_attention() -> bool:
    """Whether to route large attentions through the Pallas flash kernel.

    SAM2_TPU_FLASH=1/0 forces; default: only on TPU backends (the CPU parity
    path keeps exact unfused SDPA)."""
    import os

    v = os.environ.get("SAM2_TPU_FLASH", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    return jax.default_backend() in ("tpu", "axon")


def use_window_kernel() -> bool:
    """Opt-in Pallas fused window-attention kernel (SAM2_TPU_WINDOW_KERNEL=1).
    Off by default: on v5e it measured SLOWER than XLA's fused SDPA for
    Hiera's small windows (see doc/benchmark.md), kept behind the flag for
    re-evaluation on other TPU generations."""
    import os

    return os.environ.get("SAM2_TPU_WINDOW_KERNEL", "0") == "1"


def flash_or_sdpa(q, k, v, kv_mask=None, min_seq: int = 1024):
    """Dispatch on [B, heads, seq, head_dim]: Pallas flash kernel for large
    sequences on TPU; optional Pallas window kernel for small unmasked
    windows; else unfused SDPA. kv_mask: [B, Skv] bool or None."""
    if use_flash_attention() and q.shape[-2] * k.shape[-2] >= min_seq * min_seq:
        from sam2_opt_tpu.kernels.flash_attention import flash_attention

        return flash_attention(q, k, v, kv_mask=kv_mask)
    if (
        kv_mask is None
        and use_window_kernel()
        and use_flash_attention()
        and q.shape[-2] == k.shape[-2]
        and q.shape[-2] <= 1024
    ):
        from sam2_opt_tpu.kernels.window_attention import window_attention

        B, H, S, D = q.shape
        flat = lambda x: x.reshape(B * H, S, D)
        out = window_attention(flat(q), flat(k), flat(v))
        return out.reshape(B, H, S, D)
    mask = None if kv_mask is None else kv_mask[:, None, None, :]
    return scaled_dot_product_attention(q, k, v, mask=mask)


def use_fast_softmax() -> bool:
    """bf16 attention logits on the bf16 compute path (SAM2_TPU_FAST_SOFTMAX,
    default on). Measured on v5e: hiera-L encode 24.8 -> 22.3 ms — the fp32
    logit tensors of the ~1000 windowed attentions are pure HBM traffic.
    fp32 inputs always keep fp32 logits (the parity path is untouched);
    accuracy is gated by tests/test_accuracy_gate.py."""
    import os

    return os.environ.get("SAM2_TPU_FAST_SOFTMAX", "1") != "0"


def scaled_dot_product_attention(q, k, v, mask=None):
    """torch SDPA semantics on [..., heads, seq, head_dim] tensors.

    `mask` (optional) is a boolean array broadcastable to [..., q_len, kv_len];
    True = attend. Softmax runs in fp32 for fp32 inputs (parity path); bf16
    inputs keep bf16 logits by default (see use_fast_softmax) — bf16 shares
    fp32's exponent range so max-subtraction stays overflow-safe.
    """
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)
    acc = (
        q.dtype
        if q.dtype == jnp.bfloat16 and use_fast_softmax()
        else jnp.float32
    )
    logits = jnp.einsum("...qd,...kd->...qk", q, k, preferred_element_type=acc)
    logits = logits * jnp.asarray(scale, acc)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.asarray(-jnp.inf, acc))
    probs = jax.nn.softmax(logits, axis=-1)
    # With fully-masked rows softmax yields NaN; guard (matches masked padding rows
    # never being read downstream, but keeps NaNs from propagating through matmul).
    if mask is not None:
        probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    return jnp.einsum("...qk,...kd->...qd", probs.astype(v.dtype), v)


def separate_heads(x, num_heads: int):
    """[B, N, C] -> [B, heads, N, C/heads]"""
    B, N, C = x.shape
    return x.reshape(B, N, num_heads, C // num_heads).transpose(0, 2, 1, 3)


def recombine_heads(x):
    """[B, heads, N, Ch] -> [B, N, C]"""
    B, H, N, Ch = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, N, H * Ch)


def attention(p, q, k, v, num_heads: int, mask=None):
    """Reference `Attention` module (sam/transformer.py:222): q/k/v projections,
    SDPA, output projection. Inputs [B, N, C]."""
    q = linear(p["q_proj"], q)
    k = linear(p["k_proj"], k)
    v = linear(p["v_proj"], v)
    q = separate_heads(q, num_heads)
    k = separate_heads(k, num_heads)
    v = separate_heads(v, num_heads)
    out = scaled_dot_product_attention(q, k, v, mask=mask)
    return linear(p["out_proj"], recombine_heads(out))
