"""Memory encoder (TPU-native functional form, NHWC).

Re-design of sam2/sam2/modeling/memory_encoder.py:19-251: mask downsampler
(stride-16 conv stack), pixel-feature projection, ConvNeXt-style fuser, output
projection to mem_dim, and sine positional encoding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sam2_opt_tpu.config import MemoryEncoderConfig
from sam2_opt_tpu.ops import common as ops
from sam2_opt_tpu.ops import posenc


def mask_downsampler(p, x, cfg: MemoryEncoderConfig):
    """[B, 1024, 1024, 1] -> [B, 64, 64, 256]
    (reference memory_encoder.py:19-60): 4x (conv s2 k3 p1 + LayerNorm2d + GELU)
    then a 1x1 projection."""
    import math

    num_layers = int(
        math.log2(cfg.mask_total_stride) // math.log2(cfg.mask_downsampler_stride)
    )
    pad = cfg.mask_downsampler_padding
    idx = 0
    for _ in range(num_layers):
        x = ops.conv2d(
            p["encoder"][idx],
            x,
            stride=(cfg.mask_downsampler_stride,) * 2,
            padding=[(pad, pad), (pad, pad)],
        )
        x = ops.layer_norm_2d(p["encoder"][idx + 1], x)
        x = ops.gelu(x)
        idx += 3
    return ops.conv2d(p["encoder"][idx], x)


def cx_block(p, x, cfg: MemoryEncoderConfig):
    """ConvNeXt block (reference memory_encoder.py:64-119): depthwise 7x7 conv,
    channel LayerNorm, pointwise MLP x4, layer-scale gamma, residual."""
    dim = x.shape[-1]
    inp = x
    pad = cfg.cx_padding
    x = ops.conv2d(
        p["dwconv"], x, padding=[(pad, pad), (pad, pad)], feature_group_count=dim
    )
    x = ops.layer_norm_2d(p["norm"], x)
    x = ops.linear(p["pwconv1"], x)
    x = ops.gelu(x)
    x = ops.linear(p["pwconv2"], x)
    x = p["gamma"] * x
    return inp + x


def memory_encoder(p, cfg: MemoryEncoderConfig, pix_feat, masks, *, apply_sigmoid: bool = False):
    """(pix_feat [B,64,64,256] NHWC, masks [B,1024,1024,1]) ->
    (memory features [B,64,64,64], pos [1,64,64,64]).

    `apply_sigmoid` mirrors the reference's skip_mask_sigmoid=False path
    (memory_encoder.py:217-230); SAM2Base always pre-scales, so default False.
    """
    if apply_sigmoid:
        masks = jax.nn.sigmoid(masks)
    m = mask_downsampler(p["mask_downsampler"], masks, cfg)
    x = ops.conv2d(p["pix_feat_proj"], pix_feat)
    x = x + m
    for i in range(cfg.fuser_num_layers):
        x = cx_block(p["fuser"]["layers"][i], x, cfg)
    x = ops.conv2d(p["out_proj"], x)
    h, w = x.shape[1], x.shape[2]
    pos = posenc.sine_pos_embed_2d(h, w, cfg.pos_num_feats)[None].astype(x.dtype)
    return x, pos
