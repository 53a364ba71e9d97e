"""Memory encoder (TPU-native functional form, NHWC).

Re-design of sam2/sam2/modeling/memory_encoder.py:19-251: mask downsampler
(stride-16 conv stack), pixel-feature projection, ConvNeXt-style fuser, output
projection to mem_dim, and sine positional encoding.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

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


@functools.lru_cache(maxsize=None)
def _packed_conv_indices(p_in: int, c_in: int, c_out: int, k: int = 3):
    """Index map re-expressing a k3/s2/p1 conv on the FINE grid as a 2x2 conv
    on a phase-packed coarse grid (see `mask_downsampler_packed`).

    The packed HWIO kernel entry [ki, kj, qi*(p_in*c_in)+qj*c_in+ci,
    pi*(p_out*c_out)+pj*c_out+co] takes tap (di, dj) of the original kernel
    where the fine input offset f = 2*p - 1 + d lands in coarse block
    b-1+ki at phase q = f mod p_in. Each slot has at most one source tap, so
    the packed kernel is a gather from the flat original kernel (+1 shifted;
    slot 0 = structural zero).
    """
    p_out = p_in // 2
    idx = np.zeros((2, 2, p_in * p_in * c_in, p_out * p_out * c_out), np.int64)
    ci = np.arange(c_in)[:, None]
    co = np.arange(c_out)[None, :]
    for pi in range(p_out):
        for di in range(k):
            fi = 2 * pi - 1 + di
            ki, qi = (0, fi + p_in) if fi < 0 else (1, fi)
            for pj in range(p_out):
                for dj in range(k):
                    fj = 2 * pj - 1 + dj
                    kj, qj = (0, fj + p_in) if fj < 0 else (1, fj)
                    flat = ((di * k + dj) * c_in + ci) * c_out + co
                    in_base = (qi * p_in + qj) * c_in
                    out_base = (pi * p_out + pj) * c_out
                    idx[ki, kj, in_base:in_base + c_in,
                        out_base:out_base + c_out] = flat + 1
    return idx


@functools.lru_cache(maxsize=None)
def _packed_conv_inverse_indices(p_in: int, c_in: int, c_out: int, k: int = 3):
    """Adjoint map of `_packed_conv_indices`: for each original kernel tap
    (flat [k,k,c_in,c_out] order), the p_out² flat positions in the packed
    kernel that read it. The gather's backward then becomes a gather+sum
    instead of a scatter-add (TPU scatters serialize; measured as the
    memory-encoder backward hot spot)."""
    p_out = p_in // 2
    fwd = _packed_conv_indices(p_in, c_in, c_out, k)  # values = flat tap + 1
    flat_fwd = fwd.reshape(-1)
    order = np.argsort(flat_fwd, kind="stable")
    vals = flat_fwd[order]
    n_taps = k * k * c_in * c_out
    inv = np.zeros((n_taps, p_out * p_out), np.int64)
    # every tap appears exactly p_out*p_out times (one per output phase)
    start = np.searchsorted(vals, np.arange(1, n_taps + 1))
    for t in range(n_taps):
        inv[t] = order[start[t]:start[t] + p_out * p_out]
    return inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _packed_weight(wflat1, p_in: int, c_in: int, c_out: int, k: int):
    """Phase-packed kernel from the zero-prepended flat weights — a pure
    gather whose custom backward is ALSO a gather (+sum over the p_out²
    duplicated slots) rather than XLA's scatter-add adjoint."""
    idx = jnp.asarray(_packed_conv_indices(p_in, c_in, c_out, k))
    return wflat1[idx]


def _packed_weight_fwd(wflat1, p_in, c_in, c_out, k):
    return _packed_weight(wflat1, p_in, c_in, c_out, k), None


def _packed_weight_bwd(p_in, c_in, c_out, k, _res, g):
    inv = jnp.asarray(_packed_conv_inverse_indices(p_in, c_in, c_out, k))
    dtaps = jnp.take(g.reshape(-1), inv, axis=0).sum(axis=1)
    # slot 0 of wflat1 is the structural zero; its cotangent is discarded by
    # the concat upstream anyway
    return (jnp.concatenate([jnp.zeros((1,), dtaps.dtype), dtaps]),)


_packed_weight.defvjp(_packed_weight_fwd, _packed_weight_bwd)


def _pack_conv(p_conv, p_in: int, c_in: int, c_out: int, k: int = 3):
    """Gather the phase-packed [2,2,p_in²·c_in,p_out²·c_out] HWIO kernel (and
    phase-tiled bias) from the canonical [k,k,c_in,c_out] conv params."""
    w = p_conv["weight"].reshape(-1)
    wflat1 = jnp.concatenate([jnp.zeros((1,), w.dtype), w])
    w = _packed_weight(wflat1, p_in, c_in, c_out, k)
    p_out = p_in // 2
    b = jnp.tile(p_conv["bias"], p_out * p_out)
    return w, b


def mask_downsampler_packed(p, x, cfg: MemoryEncoderConfig):
    """Phase-packed (space-to-depth) mask downsampler — same math, TPU layout.

    The canonical stack convolves a 1-channel 1024² mask through channels
    1→4→16→64 — at ≤64 channels the TPU's 128-lane registers are ~1-50%
    occupied and the measured cost is ~0.84 ms for ~2 GFLOP of work. Here the
    mask is space-to-depth'd by 16 up front ([B,64,64,256], channel =
    16×16 spatial phase) and every k3/s2 fine-grid conv becomes an exact 2x2
    coarse-grid conv with a 256-wide contraction (`_packed_conv_indices`);
    activations stay at [B,64,64,256] with full lanes throughout.
    LayerNorm2d/GELU apply per fine position = per contiguous channel group.
    Exact to reordered-summation rounding; parity-tested against
    `mask_downsampler` in tests/test_parity_modules.py.
    """
    num_layers = int(
        np.log2(cfg.mask_total_stride) / np.log2(cfg.mask_downsampler_stride)
    )
    B, H, W, C = x.shape
    P = cfg.mask_total_stride
    # s2d(16): [B,H,W,1] -> [B,H/P,W/P,P*P] with channel = pi*P+pj
    x = x.reshape(B, H // P, P, W // P, P).transpose(0, 1, 3, 2, 4)
    x = x.reshape(B, H // P, W // P, P * P)
    hb, wb = H // P, W // P
    c_in, p_in, idx = 1, P, 0
    for _ in range(num_layers):
        c_out, p_out = c_in * 4, p_in // 2
        w, b = _pack_conv(p["encoder"][idx], p_in, c_in, c_out,
                          cfg.mask_downsampler_kernel)
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(1, 1),
            padding=[(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(x.dtype)
        x = x.reshape(B, hb, wb, p_out * p_out, c_out)
        x = ops.layer_norm_2d(p["encoder"][idx + 1], x)
        x = ops.gelu(x).reshape(B, hb, wb, p_out * p_out * c_out)
        c_in, p_in = c_out, p_out
        idx += 3
    # p_in == 1 now: packed layout == natural [B,64,64,256]
    return ops.conv2d(p["encoder"][idx], x)


def _use_packed_maskdown(cfg: MemoryEncoderConfig) -> bool:
    if os.environ.get("SAM2_TPU_PACKED_MASKDOWN", "1") != "1":
        return False
    return (
        cfg.mask_downsampler_kernel == 3
        and cfg.mask_downsampler_stride == 2
        and cfg.mask_downsampler_padding == 1
    )


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
    if _use_packed_maskdown(cfg) and masks.shape[1] % cfg.mask_total_stride == 0 \
            and masks.shape[2] % cfg.mask_total_stride == 0:
        m = mask_downsampler_packed(p["mask_downsampler"], masks, cfg)
    else:
        m = mask_downsampler(p["mask_downsampler"], masks, cfg)
    x = ops.conv2d(p["pix_feat_proj"], pix_feat)
    x = x + m
    for i in range(cfg.fuser_num_layers):
        x = cx_block(p["fuser"]["layers"][i], x, cfg)
    x = ops.conv2d(p["out_proj"], x)
    h, w = x.shape[1], x.shape[2]
    pos = posenc.sine_pos_embed_2d(h, w, cfg.pos_num_feats)[None].astype(x.dtype)
    return x, pos
