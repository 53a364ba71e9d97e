"""SAM prompt encoder (TPU-native functional form).

Re-design of sam2/sam2/modeling/sam/prompt_encoder.py:19-246. Point prompts are
encoded with random-fourier PE plus label-conditional learned embeddings via
jnp.where (the reference already uses the where-formulation for ONNX
friendliness — it is exactly what XLA wants too). Mask prompts go through the
small downscaling conv stack.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from sam2_opt_tpu.config import SAM2Config
from sam2_opt_tpu.ops import common as ops
from sam2_opt_tpu.ops import posenc


def embed_points(p, coords, labels, input_image_size: Tuple[int, int], pad: bool = True):
    """[B,P,2] coords (model-frame pixels) + [B,P] labels -> [B,P(+1),C].

    Labels: 1 pos, 0 neg, 2/3 box corners, -1 padding
    (reference prompt_encoder.py:124-166).
    """
    B = coords.shape[0]
    coords = coords + 0.5
    if pad:
        coords = jnp.concatenate([coords, jnp.zeros((B, 1, 2), coords.dtype)], axis=1)
        labels = jnp.concatenate(
            [labels, -jnp.ones((B, 1), labels.dtype)], axis=1
        )
    h, w = input_image_size
    norm = coords / jnp.asarray([w, h], dtype=coords.dtype)
    pe = posenc.random_fourier_encode(
        p["pe_layer"]["positional_encoding_gaussian_matrix"], norm
    )
    lab = labels[..., None]
    point_embedding = jnp.where(
        lab == -1, jnp.zeros_like(pe) + p["not_a_point_embed"]["weight"][0], pe
    )
    for i in range(4):
        point_embedding = jnp.where(
            lab == i,
            point_embedding + p["point_embeddings"][i]["weight"][0],
            point_embedding,
        )
    return point_embedding


def embed_masks(p, masks):
    """Dense mask prompt [B,256,256,1] NHWC -> [B,64,64,C]
    (reference prompt_encoder.py:59-67 mask_downscaling)."""
    x = ops.conv2d_nonoverlap(p["mask_downscaling"][0], masks)
    x = ops.layer_norm_2d(p["mask_downscaling"][1], x)
    x = ops.gelu(x)
    x = ops.conv2d_nonoverlap(p["mask_downscaling"][3], x)
    x = ops.layer_norm_2d(p["mask_downscaling"][4], x)
    x = ops.gelu(x)
    return ops.conv2d(p["mask_downscaling"][6], x)


def no_mask_dense(p, batch: int, embed_size: Tuple[int, int]):
    """Learned no-mask embedding broadcast to the dense grid."""
    w = p["no_mask_embed"]["weight"][0]
    return jnp.broadcast_to(
        w[None, None, None, :], (batch, embed_size[0], embed_size[1], w.shape[0])
    )


def get_dense_pe(p, embed_size: Tuple[int, int]):
    """Dense positional encoding grid [1,H,W,C] (reference prompt_encoder.py:113)."""
    return posenc.random_fourier_grid(
        p["pe_layer"]["positional_encoding_gaussian_matrix"], *embed_size
    )[None]


def prompt_encoder(
    p,
    cfg: SAM2Config,
    coords,
    labels,
    mask_input=None,
):
    """Full prompt encoding: returns (sparse [B,P+1,C], dense [B,64,64,C] NHWC).

    `coords`/`labels` must always be present (callers pad with a single (-1)
    point when no clicks, matching sam2_base_official.py:396-399); a box is
    passed as two corner points with labels 2/3.
    """
    sparse = embed_points(
        p, coords, labels, (cfg.image_size, cfg.image_size), pad=True
    )
    size = (cfg.image_embedding_size, cfg.image_embedding_size)
    if mask_input is not None:
        dense = embed_masks(p, mask_input)
    else:
        dense = no_mask_dense(p, coords.shape[0], size)
    return sparse, dense
