"""Hiera hierarchical ViT trunk + FPN neck (TPU-native, NHWC, pure functions).

Functional re-design of the reference trunk/neck
(sam2/sam2/modeling/backbones/hieradet.py, image_encoder.py). Everything is a
pure function of (params, inputs) with static shapes, so the whole image
encoder jit-compiles to a single XLA program.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from sam2_opt_tpu.config import HieraConfig, FpnNeckConfig
from sam2_opt_tpu.ops import common as ops
from sam2_opt_tpu.ops import posenc


def _do_pool(x, stride: Tuple[int, int]):
    """Max-pool in NHWC (reference hieradet.py:25 do_pool)."""
    return ops.max_pool2d(x, stride, stride)


def multiscale_attention(p, x, num_heads: int, q_stride=None):
    """Windowed/global attention with optional query pooling
    (reference hieradet.py:39-81). x: [B, H, W, C] -> [B, H', W', C_out]."""
    B, H, W, _ = x.shape
    qkv = ops.linear(p["qkv"], x.reshape(B, H * W, -1))
    qkv = qkv.reshape(B, H * W, 3, num_heads, -1)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

    if q_stride is not None:
        q = q.reshape(B, H, W, -1)
        q = _do_pool(q, q_stride)
        H, W = q.shape[1], q.shape[2]
        q = q.reshape(B, H * W, num_heads, -1)

    # Pallas flash kernel for the global-attention blocks (4096^2 softmax kept
    # in VMEM); windowed attention stays on fused XLA SDPA, which measured
    # faster than a per-window kernel (see kernels/window_attention.py).
    out = ops.flash_or_sdpa(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
    ).transpose(0, 2, 1, 3)
    out = out.reshape(B, H, W, -1)
    return ops.linear(p["proj"], out)


def multiscale_block(p, x, spec: dict, q_stride: Tuple[int, int], mlp_ratio: float):
    """One Hiera block (reference hieradet.py:84-166)."""
    dim, dim_out = spec["dim"], spec["dim_out"]
    window_size = spec["window_size"]
    has_pool = spec["q_pool"]

    shortcut = x
    x = ops.layer_norm(p["norm1"], x, eps=1e-6)

    if dim != dim_out:
        shortcut = ops.linear(p["proj"], x)
        if has_pool:
            shortcut = _do_pool(shortcut, q_stride)

    H, W = x.shape[1], x.shape[2]
    pad_hw = (H, W)
    if window_size > 0:
        x, pad_hw = ops.window_partition(x, window_size)

    x = multiscale_attention(
        p["attn"], x, spec["num_heads"], q_stride=q_stride if has_pool else None
    )

    out_ws = window_size
    if has_pool:
        out_ws = window_size // q_stride[0]
        H, W = shortcut.shape[1], shortcut.shape[2]
        if out_ws > 0:
            pad_h = (out_ws - H % out_ws) % out_ws
            pad_w = (out_ws - W % out_ws) % out_ws
            pad_hw = (H + pad_h, W + pad_w)

    if window_size > 0:
        x = ops.window_unpartition(x, out_ws, pad_hw, (H, W))

    x = shortcut + x
    x = x + ops.mlp(
        p["mlp"], ops.layer_norm(p["norm2"], x, eps=1e-6), num_layers=2, activation=ops.gelu
    )
    return x


def hiera_pos_embed(p, h: int, w: int, cfg: HieraConfig):
    """Interpolated global+window positional embedding
    (reference hieradet.py:273-281). Returns [1, h, w, C]."""
    pos = p["pos_embed"]  # [1, bh, bw, C]
    C = pos.shape[-1]
    pos = jax.image.resize(pos, (1, h, w, C), method="cubic", antialias=False)
    win = p["pos_embed_window"]  # [1, ws, ws, C]
    reps = (1, h // win.shape[1], w // win.shape[2], 1)
    pos = pos + jnp.tile(win, reps)
    return pos


def hiera(p, x, cfg: HieraConfig) -> List[jnp.ndarray]:
    """Full trunk: [B, H, W, 3] image -> 4-scale NHWC feature pyramid,
    highest resolution first (reference hieradet.py:283-299)."""
    x = ops.conv2d(
        p["patch_embed"]["proj"],
        x,
        stride=cfg.patch_stride,
        padding=[(cfg.patch_padding[0],) * 2, (cfg.patch_padding[1],) * 2],
    )
    x = x + hiera_pos_embed(p, x.shape[1], x.shape[2], cfg).astype(x.dtype)

    plan = cfg.block_plan()
    stage_ends = set(cfg.stage_ends)
    outputs = []
    for i, spec in enumerate(plan):
        x = multiscale_block(p["blocks"][i], x, spec, cfg.q_stride, cfg.mlp_ratio)
        if i in stage_ends:
            outputs.append(x)
    return outputs


def fpn_neck(p, xs: List[jnp.ndarray], cfg: FpnNeckConfig):
    """FPN neck (reference image_encoder.py:45-134). xs highest-res first.

    Returns (features, pos) lists in the same order (highest-res first), NHWC.
    Lateral 1x1 convs; top-down 2x-nearest fusion only on `fpn_top_down_levels`.
    """
    n = len(xs) - 1
    out = [None] * len(xs)
    pos = [None] * len(xs)
    prev = None
    for i in range(n, -1, -1):
        lateral = ops.conv2d(p["convs"][n - i]["conv"], xs[i])
        if i in cfg.fpn_top_down_levels and prev is not None:
            top_down = ops.upsample2x_nearest(prev.astype(jnp.float32)).astype(
                lateral.dtype
            )
            prev = lateral + top_down
            if cfg.fuse_type == "avg":
                prev = prev / 2
        else:
            prev = lateral
        out[i] = prev
        h, w = prev.shape[1], prev.shape[2]
        pe = posenc.sine_pos_embed_2d(h, w, cfg.pos_num_feats)
        pos[i] = jnp.broadcast_to(pe[None], (prev.shape[0], h, w, pe.shape[-1])).astype(
            prev.dtype
        )
    return out, pos


def image_encoder(p, x, trunk_cfg: HieraConfig, neck_cfg: FpnNeckConfig, scalp: int = 1):
    """Trunk + neck with `scalp` lowest-res levels dropped
    (reference image_encoder.py:14-42). Returns dict of NHWC tensors."""
    features, pos = fpn_neck(p["neck"], hiera(p["trunk"], x, trunk_cfg), neck_cfg)
    if scalp > 0:
        features, pos = features[:-scalp], pos[:-scalp]
    return {
        "vision_features": features[-1],
        "vision_pos_enc": pos,
        "backbone_fpn": features,
    }
