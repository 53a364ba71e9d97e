"""Jittable video tracking core.

TPU-first re-design of the reference per-frame tracking step
(sam2_base_official.py:797-1179 `_prepare_memory_conditioned_features` +
`track_step`). The host-side predictor selects which memories participate
(frame-index arithmetic, dicts — cheap Python); this module is the single
compiled graph that consumes a fixed-capacity memory layout:

    spatial memory : [S_slots, 4096, mem_dim]  + per-slot tpos index + validity
    object pointers: [P_cap, C]                + per-ptr tpos value  + validity

All positional embeddings that the reference stores per frame (maskmem_pos_enc,
current-frame sine PE) are shape-constants here and fold into the graph.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sam2_opt_tpu.config import SAM2Config
from sam2_opt_tpu.models import sam2_base as base
from sam2_opt_tpu.ops import common as ops
from sam2_opt_tpu.ops import posenc


class MemoryInput(NamedTuple):
    """Fixed-capacity memory bank view for one tracking step, batched over
    objects (B = number of objects tracked together; the reference loops
    objects at B=1 — batching them is the idiomatic TPU win).

    `feats` and `ptrs` are TUPLES of per-slot arrays (stacked inside the
    compiled graph): slots are stored as separate buffers in the tracking
    state, and fusing the gather into the jit avoids a per-frame eager stack.
    """

    feats: tuple            # S x [B, g, g, mem_dim] spatial memory features
    tpos_idx: jnp.ndarray   # [B, S] int32 index into maskmem_tpos_enc
    valid: jnp.ndarray      # [B, S] bool
    ptrs: tuple             # P x [B, C] object pointers
    ptr_pos: jnp.ndarray    # [B, P] float32 normalized temporal distance
    ptr_valid: jnp.ndarray  # [B, P] bool


def _memory_tokens(p, cfg: SAM2Config, mem: MemoryInput, dtype):
    """Assemble padded kv tokens + positions + mask for memory attention.

    Mirrors sam2_base_official.py:870-948: spatial tokens get the (constant)
    memory-encoder sine PE plus the learned temporal slot embedding; pointer
    tokens get the 1-D sine temporal PE through obj_ptr_tpos_proj and are split
    into C/mem_dim tokens each.
    """
    # slots may arrive as nested tuples (per-slot tuples of per-object [1,...]
    # arrays) so that ALL stacking happens inside the compiled graph — on
    # dispatch-latency-bound backends host-side concats dominate otherwise
    feats = tuple(
        jnp.concatenate(f, axis=0) if isinstance(f, (tuple, list)) else f
        for f in mem.feats
    )
    ptrs_in = tuple(
        jnp.concatenate(x, axis=0) if isinstance(x, (tuple, list)) else x
        for x in mem.ptrs
    )
    S = len(feats)
    B = feats[0].shape[0]
    D = feats[0].shape[-1]
    gh, gw = feats[0].shape[1], feats[0].shape[2]
    L = gh * gw
    C = cfg.hidden_dim
    tokens_per_ptr = C // D

    stacked = jnp.stack([f.reshape(B, L, D) for f in feats], axis=1)
    spatial = stacked.reshape(B, S * L, D).astype(dtype)
    mem_pe = posenc.sine_pos_embed_2d(gh, gw, D).reshape(1, 1, L, D).astype(dtype)
    tpos = p["maskmem_tpos_enc"][mem.tpos_idx][:, :, :, 0]  # [B, S, 1, D]
    spatial_pos = (mem_pe + tpos.astype(dtype)).reshape(B, S * L, D)

    # object pointers -> mem_dim-sized tokens; temporal PE per the config
    # flags (reference :928-936: sine(dim=C) + proj for SAM 2.1; sine(dim=D)
    # + identity when proj_tpos_enc_in_obj_ptrs=False; zeros when
    # add_tpos_enc_to_obj_ptrs=False)
    ptrs = jnp.stack([jnp.asarray(x, jnp.float32) for x in ptrs_in], axis=1)
    P = ptrs.shape[1]
    if not cfg.add_tpos_enc_to_obj_ptrs:
        ptr_pe = jnp.zeros((B, P, D), dtype)
    elif cfg.proj_tpos_enc_in_obj_ptrs:
        ptr_pe = posenc.get_1d_sine_pe(mem.ptr_pos, dim=C)  # [B, P, C]
        ptr_pe = ops.linear(p["obj_ptr_tpos_proj"], ptr_pe.astype(dtype))  # [B, P, D]
    else:
        ptr_pe = posenc.get_1d_sine_pe(mem.ptr_pos, dim=D).astype(dtype)
    ptr_tokens = ptrs.astype(dtype).reshape(B, -1, tokens_per_ptr, D).reshape(B, -1, D)
    ptr_pos_tokens = jnp.repeat(ptr_pe, tokens_per_ptr, axis=1)  # [B, P*t, D]

    tokens = jnp.concatenate([spatial, ptr_tokens], axis=1)
    positions = jnp.concatenate([spatial_pos, ptr_pos_tokens], axis=1)
    kv_mask = jnp.concatenate(
        [
            jnp.repeat(mem.valid, L, axis=1),
            jnp.repeat(mem.ptr_valid, tokens_per_ptr, axis=1),
        ],
        axis=1,
    )
    return tokens, positions, kv_mask, S * L


def condition_on_memory(p, cfg: SAM2Config, curr_feat, mem: MemoryInput):
    """Memory-conditioned current-frame features [1,64,64,C]
    (reference :797-976 non-init path)."""
    B, H, W, C = curr_feat.shape
    dtype = curr_feat.dtype
    tokens, positions, kv_mask, num_frame_tokens = _memory_tokens(p, cfg, mem, dtype)
    curr_pos = posenc.sine_pos_embed_2d(H, W, C).astype(dtype)[None]
    return base.condition_features(
        p, cfg, curr_feat, jnp.broadcast_to(curr_pos, curr_feat.shape),
        tokens, positions, kv_mask, num_frame_tokens,
    )


def _finalize(p, cfg: SAM2Config, raw_embed, sam_outputs, run_mem_encoder: bool,
              is_mask_from_pts: bool, fill_hole_area: int,
              keep_multimasks: bool = False):
    # NOTE: the memory encoder consumes the RAW current-frame features, not the
    # memory-conditioned ones (reference track_step :1167-1177 passes
    # current_vision_feats to _encode_memory_in_output).
    (
        _,
        _,
        ious,
        low_res_masks,
        high_res_masks,
        obj_ptr,
        object_score_logits,
    ) = sam_outputs
    # NOTE: hole filling intentionally happens OUTSIDE this graph (predictor
    # applies it as a separate compiled call, like the reference applies
    # fill_holes_in_mask_scores after track_step, misc.py:312 /
    # sam2_video_predictor_official.py:891-894). Keeping the
    # connected-components scatter out of the big fused graph also avoids a
    # backend bug observed on remote-attached TPUs.
    del fill_hole_area
    out = {
        "pred_masks": low_res_masks,
        "obj_ptr": obj_ptr.astype(jnp.float32),
        "object_score_logits": object_score_logits.astype(jnp.float32),
        "ious": ious.astype(jnp.float32),
    }
    if keep_multimasks:
        # all multimask slots for distractor analysis (dam4sam track,
        # reference sam2_base_dam4sam.py:447-501 returns (all_low_res_masks,
        # all_ious) extras)
        low_mm = sam_outputs[0]
        out["all_pred_masks"] = low_mm.astype(jnp.float32)
    if run_mem_encoder and cfg.num_maskmem > 0:
        maskmem, _ = base.encode_new_memory(
            p, cfg, raw_embed, high_res_masks, object_score_logits,
            is_mask_from_pts=is_mask_from_pts,
        )
        out["maskmem_features"] = maskmem.astype(jnp.bfloat16)
    return out


def track_step_init(
    p,
    cfg: SAM2Config,
    feats: Tuple,               # (hrf0, hrf1, embed) NHWC, batch 1
    point_coords,               # [1, P, 2] or None
    point_labels,               # [1, P] or None
    mask_inputs,                # [1, 1, 1024, 1024] binary or None
    prev_sam_mask_logits=None,  # [1, 1, 256, 256] or None
    multimask_output: bool = True,
    run_mem_encoder: bool = False,
    fill_hole_area: int = 0,
    keep_multimasks: bool = False,
):
    """Initial-conditioning-frame step: no-mem embedding fast path
    (reference :951-957 + track_step)."""
    hrf0, hrf1, embed = feats
    pix_feat = base.no_mem_features(p, embed)
    return _track_with_features(
        p, cfg, (hrf0, hrf1, pix_feat), embed, point_coords, point_labels,
        mask_inputs, prev_sam_mask_logits, multimask_output, run_mem_encoder,
        fill_hole_area, is_mask_from_pts=point_coords is not None,
        keep_multimasks=keep_multimasks,
    )


def track_step_conditioned(
    p,
    cfg: SAM2Config,
    feats: Tuple,
    mem: MemoryInput,
    point_coords=None,
    point_labels=None,
    prev_sam_mask_logits=None,
    multimask_output: bool = True,
    run_mem_encoder: bool = True,
    fill_hole_area: int = 0,
    keep_multimasks: bool = False,
    mask_inputs=None,
):
    """Tracked-frame step: memory attention + SAM heads + memory encoder
    (reference track_step :1114-1179, non-init branch). `mask_inputs` only
    reaches here when use_mask_input_as_output_without_sam=False (otherwise
    the predictor routes mask prompts to the memoryless graph, matching the
    reference's _use_mask_as_output branch)."""
    hrf0, hrf1, embed = feats
    pix_feat = condition_on_memory(p, cfg, embed, mem)
    return _track_with_features(
        p, cfg, (hrf0, hrf1, pix_feat), embed, point_coords, point_labels,
        mask_inputs,
        prev_sam_mask_logits, multimask_output, run_mem_encoder, fill_hole_area,
        is_mask_from_pts=point_coords is not None,
        keep_multimasks=keep_multimasks,
    )


def _track_with_features(
    p, cfg, feats, raw_embed, point_coords, point_labels, mask_inputs,
    prev_sam_mask_logits, multimask_output, run_mem_encoder, fill_hole_area,
    is_mask_from_pts, keep_multimasks=False,
):
    hrf0, hrf1, pix_feat = feats
    if mask_inputs is not None and cfg.use_mask_input_as_output_without_sam:
        # GT-mask passthrough. The reference runs the obj-ptr SAM-heads call
        # on the RAW backbone features — no no_mem_embed, no memory
        # conditioning — on init AND tracked frames alike
        # (sam2_base_official.py:1051-1058).
        sam_outputs = base.use_mask_as_output(
            p, cfg, raw_embed, (hrf0, hrf1), mask_inputs
        )
    else:
        if point_coords is None:
            B = pix_feat.shape[0]
            point_coords = jnp.zeros((B, 1, 2), jnp.float32)
            point_labels = -jnp.ones((B, 1), jnp.int32)
        mask_prompt = None
        if prev_sam_mask_logits is not None:
            mask_prompt = jnp.transpose(prev_sam_mask_logits, (0, 2, 3, 1)).astype(
                pix_feat.dtype
            )
        elif mask_inputs is not None:
            # use_mask_input_as_output_without_sam=False: the mask is a dense
            # SAM prompt, antialias-downsized to the prompt grid (reference
            # _forward_sam_heads :402-416)
            prompt_hw = (pix_feat.shape[1] * 4, pix_feat.shape[2] * 4)
            m = mask_inputs.astype(jnp.float32)
            if m.shape[-2:] != prompt_hw:
                m = base.resize_hw(m, prompt_hw, "bilinear", antialias=True)
            mask_prompt = jnp.transpose(m, (0, 2, 3, 1)).astype(pix_feat.dtype)
        sam_outputs = base.forward_sam_heads(
            p, cfg, pix_feat, point_coords, point_labels,
            mask_inputs=mask_prompt, high_res_features=(hrf0, hrf1),
            multimask_output=multimask_output,
        )
    return _finalize(
        p, cfg, raw_embed, sam_outputs, run_mem_encoder, is_mask_from_pts,
        fill_hole_area, keep_multimasks=keep_multimasks,
    )


def encode_memory_only(p, cfg: SAM2Config, embed, high_res_masks,
                       object_score_logits, is_mask_from_pts: bool):
    """Standalone memory-encoder run (reference _run_memory_encoder :911-945)."""
    maskmem, _ = base.encode_new_memory(
        p, cfg, embed, high_res_masks, object_score_logits,
        is_mask_from_pts=is_mask_from_pts,
    )
    return maskmem.astype(jnp.bfloat16)
