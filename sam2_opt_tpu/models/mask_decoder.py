"""SAM mask decoder + two-way transformer (TPU-native functional form).

Re-design of sam2/sam2/modeling/sam/transformer.py:51-294 and
sam/mask_decoder.py:16-382. The decoder core `predict_masks` takes the same
five tensors as the reference's export seam (src, tokens, pos_src, hrf0, hrf1)
so that it compiles to one XLA program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sam2_opt_tpu.config import SAM2Config
from sam2_opt_tpu.ops import common as ops


def two_way_block(p, queries, keys, query_pe, key_pe, num_heads: int,
                  skip_first_layer_pe: bool):
    """Reference TwoWayAttentionBlock.forward (transformer.py:188-219)."""
    if skip_first_layer_pe:
        queries = ops.attention(p["self_attn"], queries, queries, queries, num_heads)
    else:
        q = queries + query_pe
        queries = queries + ops.attention(p["self_attn"], q, q, queries, num_heads)
    queries = ops.layer_norm(p["norm1"], queries)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + ops.attention(
        p["cross_attn_token_to_image"], q, k, keys, num_heads
    )
    queries = ops.layer_norm(p["norm2"], queries)

    queries = queries + ops.mlp(p["mlp"], queries, num_layers=2, activation=jax.nn.relu)
    queries = ops.layer_norm(p["norm3"], queries)

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + ops.attention(
        p["cross_attn_image_to_token"], k, q, queries, num_heads
    )
    keys = ops.layer_norm(p["norm4"], keys)
    return queries, keys


def two_way_transformer(p, image_embedding, image_pe, point_embedding,
                        depth: int, num_heads: int):
    """Reference TwoWayTransformer.forward (transformer.py:97-141).

    image_embedding/image_pe: [B, N_img, C] (pre-flattened); point_embedding:
    [B, N_pts, C]. Returns (queries, keys).
    """
    queries = point_embedding
    keys = image_embedding
    for i in range(depth):
        queries, keys = two_way_block(
            p["layers"][i], queries, keys, point_embedding, image_pe, num_heads,
            skip_first_layer_pe=(i == 0),
        )
    q = queries + point_embedding
    k = keys + image_pe
    queries = queries + ops.attention(
        p["final_attn_token_to_image"], q, k, keys, num_heads
    )
    queries = ops.layer_norm(p["norm_final_attn"], queries)
    return queries, keys


def predict_masks(
    p,
    cfg: SAM2Config,
    src,            # [B, 64, 64, 256] NHWC image embedding + dense prompt
    tokens,         # [B, T, 256] output tokens ++ sparse prompts
    pos_src,        # [B, 64, 64, 256] NHWC dense PE
    high_res_feature0,  # [B, 256, 256, 32] NHWC
    high_res_feature1,  # [B, 128, 128, 64] NHWC
):
    """Decoder core (reference mask_decoder.py:262-316, inference_predict_masks).

    Returns (masks [B,4,256,256], iou_pred [B,4], mask_tokens_out [B,4,C],
    object_score_logits [B,1]).
    """
    B, H, W, C = src.shape
    s = 1 if cfg.pred_obj_scores else 0
    num_mask_tokens = cfg.num_multimask_outputs + 1

    hs, src_out = two_way_transformer(
        p["transformer"],
        src.reshape(B, H * W, C),
        pos_src.reshape(B, H * W, C),
        tokens,
        depth=cfg.sam_mask_decoder_depth,
        num_heads=cfg.sam_mask_decoder_num_heads,
    )
    iou_token_out = hs[:, s, :]
    mask_tokens_out = hs[:, s + 1 : s + 1 + num_mask_tokens, :]

    src_img = src_out.reshape(B, H, W, C)
    dc1, ln1, _, dc2, _ = (
        p["output_upscaling"][0],
        p["output_upscaling"][1],
        None,
        p["output_upscaling"][3],
        None,
    )
    up = ops.conv_transpose2d(dc1, src_img) + high_res_feature1
    up = ops.gelu(ops.layer_norm_2d(ln1, up))
    up = ops.gelu(ops.conv_transpose2d(dc2, up) + high_res_feature0)

    hyper_in = jnp.stack(
        [
            ops.mlp(p["output_hypernetworks_mlps"][i], mask_tokens_out[:, i, :], 3)
            for i in range(num_mask_tokens)
        ],
        axis=1,
    )  # [B, M, c_up]
    masks = jnp.einsum(
        "bmc,bhwc->bmhw", hyper_in, up, preferred_element_type=jnp.float32
    ).astype(src.dtype)

    iou_pred = ops.mlp(
        p["iou_prediction_head"],
        iou_token_out,
        cfg.iou_head_depth,
        sigmoid_output=cfg.iou_prediction_use_sigmoid,
    )
    if cfg.pred_obj_scores:
        if cfg.pred_obj_scores_mlp:
            object_score_logits = ops.mlp(p["pred_obj_score_head"], hs[:, 0, :], 3)
        else:
            object_score_logits = ops.linear(p["pred_obj_score_head"], hs[:, 0, :])
    else:
        object_score_logits = 10.0 * jnp.ones((B, 1), iou_pred.dtype)
    return masks, iou_pred, mask_tokens_out, object_score_logits


def build_decoder_tokens(p, cfg: SAM2Config, sparse_prompt_embeddings):
    """Assemble [obj_score?, iou, mask x4] output tokens ++ sparse prompts
    (reference mask_decoder.py:184-202)."""
    parts = []
    if cfg.pred_obj_scores:
        parts.append(p["obj_score_token"]["weight"])
    parts.append(p["iou_token"]["weight"])
    parts.append(p["mask_tokens"]["weight"])
    output_tokens = jnp.concatenate(parts, axis=0)
    B = sparse_prompt_embeddings.shape[0]
    output_tokens = jnp.broadcast_to(
        output_tokens[None], (B, *output_tokens.shape)
    ).astype(sparse_prompt_embeddings.dtype)
    return jnp.concatenate([output_tokens, sparse_prompt_embeddings], axis=1)


def mask_decoder(
    p,
    cfg: SAM2Config,
    image_embeddings,   # [B,64,64,256] NHWC
    image_pe,           # [1,64,64,256] NHWC
    sparse_prompt_embeddings,  # [B,P,256]
    dense_prompt_embeddings,   # [B,64,64,256] NHWC
    multimask_output: bool,
    high_res_features,  # (hrf0 [B,256,256,32], hrf1 [B,128,128,64]) NHWC
    repeat_image: bool = False,
):
    """Full decoder forward (reference mask_decoder.py:116-224).

    Returns (masks, iou_pred, sam_tokens_out, object_score_logits); mask/iou
    slicing by `multimask_output` is static.
    """
    tokens = build_decoder_tokens(p, cfg, sparse_prompt_embeddings)
    B = tokens.shape[0]
    src = image_embeddings
    if repeat_image and image_embeddings.shape[0] != B:
        reps = B // image_embeddings.shape[0]
        src = jnp.repeat(image_embeddings, reps, axis=0)
    src = src + dense_prompt_embeddings
    pos_src = jnp.broadcast_to(image_pe, src.shape)
    hrf0, hrf1 = high_res_features
    if repeat_image and hrf0.shape[0] != B:
        reps = B // hrf0.shape[0]
        hrf0 = jnp.repeat(hrf0, reps, axis=0)
        hrf1 = jnp.repeat(hrf1, reps, axis=0)

    masks, iou_pred, mask_tokens_out, object_score_logits = predict_masks(
        p, cfg, src, tokens, pos_src, hrf0, hrf1
    )

    if multimask_output:
        out_masks = masks[:, 1:, :, :]
        out_iou = iou_pred[:, 1:]
    elif cfg.dynamic_multimask_via_stability:
        out_masks, out_iou = _dynamic_multimask_via_stability(
            cfg, masks, iou_pred,
            delta=cfg.dynamic_multimask_stability_delta,
            thresh=cfg.dynamic_multimask_stability_thresh,
        )
    else:
        out_masks = masks[:, 0:1, :, :]
        out_iou = iou_pred[:, 0:1]

    if multimask_output and cfg.use_multimask_token_for_obj_ptr:
        sam_tokens_out = mask_tokens_out[:, 1:]
    else:
        sam_tokens_out = mask_tokens_out[:, 0:1]
    return out_masks, out_iou, sam_tokens_out, object_score_logits


def _stability_scores(masks, delta: float):
    flat = masks.reshape(*masks.shape[:-2], -1)
    area_i = jnp.sum(flat > delta, axis=-1).astype(jnp.float32)
    area_u = jnp.sum(flat > -delta, axis=-1).astype(jnp.float32)
    return jnp.where(area_u > 0, area_i / area_u, 1.0)


def _dynamic_multimask_via_stability(cfg: SAM2Config, all_masks, all_iou,
                                     delta: float = 0.05, thresh: float = 0.98):
    """Single-mask output with dynamic fallback to the best multimask slot when
    the single-mask stability is low (reference mask_decoder.py:346-382)."""
    multimask = all_masks[:, 1:, :, :]
    multi_iou = all_iou[:, 1:]
    best = jnp.argmax(multi_iou, axis=-1)
    best_masks = jnp.take_along_axis(multimask, best[:, None, None, None], axis=1)
    best_iou = jnp.take_along_axis(multi_iou, best[:, None], axis=1)

    single_masks = all_masks[:, 0:1, :, :]
    single_iou = all_iou[:, 0:1]
    stable = _stability_scores(single_masks, delta) >= thresh  # [B,1]
    masks_out = jnp.where(stable[..., None, None], single_masks, best_masks)
    iou_out = jnp.where(stable, single_iou, best_iou)
    return masks_out, iou_out
