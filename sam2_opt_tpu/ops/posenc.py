"""Positional encodings: 2-D sine PE, random-fourier PE, 1-D sine PE, axial RoPE.

Numerically matches the reference implementations in
sam2/sam2/modeling/position_encoding_fix.py and sam2/sam2/modeling/sam2_utils.py.
All tables are pure functions of static shapes, so under jit they constant-fold.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def sine_pos_embed_2d(
    h: int,
    w: int,
    num_pos_feats: int,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
) -> jnp.ndarray:
    """2-D sine positional embedding, returns [H, W, C] (channels-last).

    Matches reference PositionEmbeddingSine.forward
    (position_encoding_fix.py:79-112): 1-indexed row/col positions normalized by
    the last position, interleaved sin/cos per axis, y-half first.
    """
    half = num_pos_feats // 2
    if scale is None:
        scale = 2 * math.pi
    y_embed = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    x_embed = jnp.ones((h, 1)) * jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / half)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    # interleave sin(even) / cos(odd)
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3)
    pos_x = pos_x.reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=3)
    pos_y = pos_y.reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)  # [H, W, C]


def get_1d_sine_pe(pos_inds, dim: int, temperature: float = 10000.0):
    """1-D sine PE (reference sam2_utils.py:64): cat(sin, cos), NOT interleaved."""
    pe_dim = dim // 2
    dim_t = jnp.arange(pe_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / pe_dim)
    pos = pos_inds[..., None].astype(jnp.float32) / dim_t
    return jnp.concatenate([jnp.sin(pos), jnp.cos(pos)], axis=-1)


def random_fourier_encode(gaussian_matrix, coords):
    """Random-fourier features for coords normalized to [0,1]
    (reference PositionEmbeddingRandom._pe_encoding, position_encoding_fix.py:129)."""
    coords = 2.0 * coords - 1.0
    coords = coords @ gaussian_matrix.astype(coords.dtype)
    coords = 2.0 * jnp.pi * coords
    return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)


def random_fourier_grid(gaussian_matrix, h: int, w: int):
    """Dense PE grid [H, W, C] (reference PositionEmbeddingRandom.forward)."""
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)  # [H, W, 2] (x, y)
    return random_fourier_encode(gaussian_matrix, grid)


def axial_rope_cos_sin(dim: int, end_x: int, end_y: int, theta: float = 10000.0):
    """Axial RoPE tables [end_x*end_y, dim] (reference
    position_encoding_fix.py:166-183). Row-major ordering: t_x = t % end_x,
    t_y = t // end_x; first half of the channel axis carries x-frequencies."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = np.arange(end_x * end_y, dtype=np.float32)
    t_x = t % end_x
    t_y = np.floor(t / end_x)
    freqs_x = np.outer(t_x, freqs)
    freqs_y = np.outer(t_y, freqs)
    freqs_all = np.concatenate([freqs_x, freqs_y], axis=-1)  # [N, dim]
    # return numpy (not jnp) so callers may cache across jit traces safely
    return np.cos(freqs_all), np.sin(freqs_all)


def apply_rotary(x, cos, sin):
    """Rotate interleaved (even, odd) channel pairs (reference
    position_encoding_fix.py:192-205). x: [..., seq, dim]; cos/sin: [seq, dim]
    tables of which only even-indexed columns are used."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c = cos[..., 0::2]
    s = sin[..., 0::2]
    even = x1 * c - x2 * s
    odd = x1 * s + x2 * c
    out = jnp.stack([even, odd], axis=-1)
    return out.reshape(x.shape)


def rope_half_tables(dim: int, end_x: int, end_y: int, theta: float = 10000.0):
    """Per-PAIR RoPE tables [N, dim//2] (numpy) for the de-interleaved
    ("split") channel layout: pair i's (cos, sin) — i.e. the even-indexed
    columns of axial_rope_cos_sin's full tables."""
    cos, sin = axial_rope_cos_sin(dim, end_x, end_y, theta)
    return np.ascontiguousarray(cos[:, 0::2]), np.ascontiguousarray(sin[:, 0::2])


def split_perm(head_dim: int, num_heads: int = 1) -> np.ndarray:
    """Channel permutation mapping the interleaved pair layout
    (x0, y0, x1, y1, ...) to the de-interleaved split layout
    (x0, x1, ..., y0, y1, ...), per head.

    TPU-native trick: stride-2 lane slices (x[..., 0::2]) cost a cross-lane
    shuffle on the VPU; applying this permutation to the OUTPUT channels of
    the q/k projection weights instead makes rotation two contiguous
    half-width vector ops. Because q and k are permuted identically, q·kᵀ —
    and therefore the attention output — is unchanged."""
    base = np.concatenate([np.arange(0, head_dim, 2), np.arange(1, head_dim, 2)])
    return np.concatenate(
        [h * head_dim + base for h in range(num_heads)]
    ).astype(np.int32)


def apply_rotary_split(x, cos_half, sin_half):
    """Rotation in the split layout: x [..., seq, dim] whose first dim/2
    channels are the pair-first halves (see split_perm); cos/sin [seq, dim/2].
    Equivalent to apply_rotary on the interleaved layout, without any
    stride-2 lane shuffles."""
    d_half = cos_half.shape[-1]
    x1 = x[..., :d_half]
    x2 = x[..., d_half : 2 * d_half]
    out = jnp.concatenate(
        [x1 * cos_half - x2 * sin_half, x1 * sin_half + x2 * cos_half], axis=-1
    )
    if x.shape[-1] > 2 * d_half:
        out = jnp.concatenate([out, x[..., 2 * d_half :]], axis=-1)
    return out
