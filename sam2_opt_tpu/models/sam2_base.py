"""SAM2 core model: image encoding, SAM heads, memory encode/condition.

Functional re-design of sam2/sam2/modeling/sam2_base_official.py. Everything
here is a pure function of (params, config, arrays) with static shapes, forming
the jittable seams that `speedup()` compiles:

    forward_image         (reference sam2_base_official.py:548-582)
    forward_sam_heads     (reference :338-494)
    encode_new_memory     (reference :978-1026)
    condition_features    (reference :797-976 step 2 + memory_attention)
    use_mask_as_output    (reference :496-546)

Feature layout is NHWC throughout; masks are [B, M, H, W].
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from sam2_opt_tpu.config import SAM2Config
from sam2_opt_tpu.models import hiera as hiera_mod
from sam2_opt_tpu.models import mask_decoder as md
from sam2_opt_tpu.models import memory_attention as ma
from sam2_opt_tpu.models import memory_encoder as me
from sam2_opt_tpu.models import prompt_encoder as pe
from sam2_opt_tpu.ops import common as ops
from sam2_opt_tpu.ops import posenc

# A large negative placeholder score for missing objects
# (reference sam2_base_official.py:21).
NO_OBJ_SCORE = -1024.0


def resize_hw(x, size: Tuple[int, int], method: str = "bilinear", antialias: bool = False):
    """Resize the last two axes of [..., H, W] (torch F.interpolate semantics,
    align_corners=False)."""
    *lead, H, W = x.shape
    flat = x.reshape(-1, H, W, 1)
    out = ops.interpolate(flat, size, method=method, antialias=antialias)
    return out.reshape(*lead, *size)


def forward_image(p, cfg: SAM2Config, img):
    """Normalized image batch [B, S, S, 3] NHWC -> backbone features.

    Matches inference_image_torch (sam2_base_official.py:566-582): runs the
    image encoder and projects the two high-res FPN levels through the mask
    decoder's conv_s0/conv_s1.
    Returns dict with "backbone_fpn" (3 NHWC maps: [B,256,256,32],
    [B,128,128,64], [B,64,64,256]) and "vision_pos_enc" (3 NHWC maps, C=256).
    """
    out = hiera_mod.image_encoder(
        p["image_encoder"], img, cfg.trunk, cfg.neck, scalp=cfg.scalp
    )
    fpn = list(out["backbone_fpn"])
    if cfg.use_high_res_features_in_sam:
        fpn[0] = ops.conv2d(p["sam_mask_decoder"]["conv_s0"], fpn[0])
        fpn[1] = ops.conv2d(p["sam_mask_decoder"]["conv_s1"], fpn[1])
    return {"backbone_fpn": fpn, "vision_pos_enc": list(out["vision_pos_enc"])}


def image_normalize(img, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
    """ImageNet normalization of [..., 3] images scaled to [0, 1]
    (reference utils/transforms.py:27-31)."""
    mean = jnp.asarray(mean, dtype=img.dtype)
    std = jnp.asarray(std, dtype=img.dtype)
    return (img - mean) / std


def forward_sam_heads(
    p,
    cfg: SAM2Config,
    backbone_features,            # [B, 64, 64, 256] NHWC
    point_coords,                 # [B, P, 2] model-frame pixels
    point_labels,                 # [B, P] int32 (1 pos / 0 neg / 2,3 box / -1 pad)
    mask_inputs=None,             # [B, 256, 256, 1] NHWC mask-prompt logits or None
    high_res_features=None,       # (hrf0, hrf1) NHWC
    multimask_output: bool = False,
):
    """SAM prompt-encoder + mask-decoder heads (reference :338-494).

    Returns the reference 7-tuple: (low_res_multimasks, high_res_multimasks,
    ious, low_res_masks, high_res_masks, obj_ptr, object_score_logits), with
    masks in [B, M, H, W].
    """
    B = backbone_features.shape[0]
    sparse, dense = pe.prompt_encoder(
        p["sam_prompt_encoder"], cfg, point_coords, point_labels, mask_inputs
    )
    embed_size = (cfg.image_embedding_size, cfg.image_embedding_size)
    image_pe = pe.get_dense_pe(p["sam_prompt_encoder"], embed_size).astype(
        backbone_features.dtype
    )
    low_res_multimasks, ious, sam_output_tokens, object_score_logits = md.mask_decoder(
        p["sam_mask_decoder"],
        cfg,
        backbone_features,
        image_pe,
        sparse.astype(backbone_features.dtype),
        dense.astype(backbone_features.dtype),
        multimask_output=multimask_output,
        high_res_features=high_res_features,
        repeat_image=False,
    )
    if cfg.pred_obj_scores:
        is_obj_appearing = object_score_logits > 0  # [B, 1]
        low_res_multimasks = jnp.where(
            is_obj_appearing[:, None, None], low_res_multimasks, NO_OBJ_SCORE
        )
    low_res_multimasks = low_res_multimasks.astype(jnp.float32)
    high_res_multimasks = resize_hw(
        low_res_multimasks, (cfg.image_size, cfg.image_size), "bilinear"
    )

    sam_output_token = sam_output_tokens[:, 0]
    if multimask_output:
        best = jnp.argmax(ious, axis=-1)  # [B]
        low_res_masks = jnp.take_along_axis(
            low_res_multimasks, best[:, None, None, None], axis=1
        )
        # select-then-resize == resize-then-select (resize is per-channel),
        # and it lets XLA drop the unselected channels' 1024² upsample when
        # the caller discards high_res_multimasks (the tracking graph does:
        # video_core._finalize) — measured 137 -> 33 us per frame step
        high_res_masks = resize_hw(
            low_res_masks, (cfg.image_size, cfg.image_size), "bilinear"
        )
        if sam_output_tokens.shape[1] > 1:
            sam_output_token = jnp.take_along_axis(
                sam_output_tokens, best[:, None, None], axis=1
            )[:, 0]
    else:
        low_res_masks, high_res_masks = low_res_multimasks, high_res_multimasks

    # obj_ptr_proj: MLP for SAM 2.1, plain Linear for use_mlp=False, Identity
    # when pointers are unused (reference :317-325)
    if not cfg.use_obj_ptrs_in_encoder:
        obj_ptr = sam_output_token
    elif cfg.use_mlp_for_obj_ptr_proj:
        obj_ptr = ops.mlp(p["obj_ptr_proj"], sam_output_token, 3)
    else:
        obj_ptr = ops.linear(p["obj_ptr_proj"], sam_output_token)
    if cfg.pred_obj_scores:
        lambda_is_obj = (
            jax.nn.sigmoid(object_score_logits)
            if cfg.soft_no_obj_ptr
            else (object_score_logits > 0).astype(obj_ptr.dtype)
        )
        if cfg.fixed_no_obj_ptr:
            obj_ptr = lambda_is_obj * obj_ptr
        obj_ptr = obj_ptr + (1.0 - lambda_is_obj) * p["no_obj_ptr"][0]

    return (
        low_res_multimasks,
        high_res_multimasks,
        ious,
        low_res_masks,
        high_res_masks,
        obj_ptr,
        object_score_logits,
    )


def use_mask_as_output(p, cfg: SAM2Config, backbone_features, high_res_features,
                       mask_inputs):
    """GT-mask passthrough (reference :496-546): +-10 logits from the binary
    input mask; obj_ptr still produced by the SAM decoder from the mask."""
    out_scale, out_bias = 20.0, -10.0
    mask_inputs_float = mask_inputs.astype(jnp.float32)  # [B, 1, H, W]
    high_res_masks = mask_inputs_float * out_scale + out_bias
    low_res_masks = resize_hw(
        high_res_masks,
        (high_res_masks.shape[-2] // 4, high_res_masks.shape[-1] // 4),
        "bilinear",
        antialias=True,
    )
    B = mask_inputs.shape[0]
    ious = jnp.ones((B, 1), jnp.float32)
    if not cfg.use_obj_ptrs_in_encoder:
        obj_ptr = jnp.zeros((B, cfg.hidden_dim), jnp.float32)
    else:
        # Downsample the mask to the low-res prompt grid through the learned
        # stride-4 conv (reference :112, :523) and run the SAM heads on it.
        mask_nhwc = jnp.transpose(mask_inputs_float, (0, 2, 3, 1))
        sam_mask_prompt = ops.conv2d_nonoverlap(p["mask_downsample"], mask_nhwc)
        coords = jnp.zeros((B, 1, 2), jnp.float32)
        labels = -jnp.ones((B, 1), jnp.int32)
        _, _, _, _, _, obj_ptr, _ = forward_sam_heads(
            p, cfg, backbone_features, coords, labels,
            mask_inputs=sam_mask_prompt, high_res_features=high_res_features,
        )
    is_obj_appearing = jnp.any(
        mask_inputs_float.reshape(B, -1) > 0.0, axis=1, keepdims=True
    )
    lambda_is_obj = is_obj_appearing.astype(jnp.float32)
    object_score_logits = out_scale * lambda_is_obj + out_bias
    if cfg.pred_obj_scores:
        if cfg.fixed_no_obj_ptr:
            obj_ptr = lambda_is_obj * obj_ptr
        obj_ptr = obj_ptr + (1.0 - lambda_is_obj) * p["no_obj_ptr"][0]
    return (
        low_res_masks,
        high_res_masks,
        ious,
        low_res_masks,
        high_res_masks,
        obj_ptr,
        object_score_logits,
    )


def encode_new_memory(
    p,
    cfg: SAM2Config,
    pix_feat,               # [B, 64, 64, 256] NHWC current-frame features
    pred_masks_high_res,    # [B, 1, 1024, 1024] mask logits
    object_score_logits,    # [B, 1]
    is_mask_from_pts: bool = False,
):
    """Encode prediction into a memory slot (reference :978-1026).

    Returns (maskmem_features [B,64,64,mem_dim] NHWC, maskmem_pos [1,64,64,mem_dim]).
    """
    binarize = cfg.binarize_mask_from_pts_for_mem_enc and is_mask_from_pts
    if binarize:
        mask_for_mem = (pred_masks_high_res > 0).astype(pix_feat.dtype)
    else:
        mask_for_mem = jax.nn.sigmoid(pred_masks_high_res).astype(pix_feat.dtype)
    if cfg.sigmoid_scale_for_mem_enc != 1.0:
        mask_for_mem = mask_for_mem * cfg.sigmoid_scale_for_mem_enc
    if cfg.sigmoid_bias_for_mem_enc != 0.0:
        mask_for_mem = mask_for_mem + cfg.sigmoid_bias_for_mem_enc
    mask_nhwc = jnp.transpose(mask_for_mem, (0, 2, 3, 1))  # [B, H, W, 1]
    feats, pos = me.memory_encoder(
        p["memory_encoder"], cfg.memory_encoder, pix_feat, mask_nhwc
    )
    if cfg.no_obj_embed_spatial:
        is_obj_appearing = (object_score_logits > 0).astype(feats.dtype)  # [B,1]
        feats = feats + (1.0 - is_obj_appearing[:, None, None, :][..., 0:1]) * (
            p["no_obj_embed_spatial"][0]
        )
    return feats, pos


def condition_features(
    p,
    cfg: SAM2Config,
    curr_feat,       # [B, 64, 64, 256] NHWC current-frame top-level features
    curr_pos,        # [B, 64, 64, 256] NHWC positional encoding
    memory,          # [B, S, mem_dim] padded memory tokens
    memory_pos,      # [B, S, mem_dim] positional (incl. tpos) embeddings
    kv_mask,         # [B, S] bool validity
    num_frame_tokens: int,
):
    """Cross-attend current features to the memory bank (reference :963-976).
    Returns conditioned [B, 64, 64, 256] NHWC."""
    B, H, W, C = curr_feat.shape
    out = ma.memory_attention(
        p["memory_attention"],
        cfg.memory_attention,
        curr_feat.reshape(B, H * W, C),
        memory,
        curr_pos.reshape(B, H * W, C),
        memory_pos,
        kv_mask=kv_mask,
        num_frame_tokens=num_frame_tokens,
    )
    return out.reshape(B, H, W, C)


def no_mem_features(p, curr_feat):
    """Initial-frame fast path: add the learned no-memory embedding
    (reference :953-957). curr_feat [B, H, W, C] NHWC."""
    return curr_feat + p["no_mem_embed"][0, 0]


def apply_non_overlapping_constraints(pred_masks):
    """Keep only the argmax object per pixel (reference :1191-1207).
    pred_masks: [N_obj, 1, H, W]."""
    if pred_masks.shape[0] == 1:
        return pred_masks
    max_obj_inds = jnp.argmax(pred_masks, axis=0, keepdims=True)
    batch_obj_inds = jnp.arange(pred_masks.shape[0])[:, None, None, None]
    keep = max_obj_inds == batch_obj_inds
    return jnp.where(keep, pred_masks, jnp.clip(pred_masks, None, -10.0))
