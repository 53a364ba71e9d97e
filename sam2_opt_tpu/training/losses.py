"""Segmentation losses (reference sam2/training/loss_fns.py).

Pure-jnp implementations of dice / sigmoid-focal / IoU losses and the
multi-step multi-mask combination used by SAM2 training: for each step's
multimask outputs, supervise the argmin-loss mask slot, plus the IoU head and
the occlusion (object-score) head.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp


def dice_loss(inputs, targets, num_objects, loss_on_multimask=False):
    """reference loss_fns.py:20-49. inputs/targets: [N, M, H, W] logits/binary."""
    probs = jax.nn.sigmoid(inputs)
    if loss_on_multimask:
        flat_p = probs.reshape(*probs.shape[:2], -1)
        flat_t = targets.reshape(*targets.shape[:2], -1)
    else:
        flat_p = probs.reshape(probs.shape[0], -1)
        flat_t = targets.reshape(targets.shape[0], -1)
    numerator = 2 * jnp.sum(flat_p * flat_t, axis=-1)
    denominator = jnp.sum(flat_p, axis=-1) + jnp.sum(flat_t, axis=-1)
    loss = 1 - (numerator + 1) / (denominator + 1)
    if loss_on_multimask:
        return loss / num_objects  # [N, M]
    return jnp.sum(loss) / num_objects


def sigmoid_focal_loss(inputs, targets, num_objects, alpha=0.25, gamma=2.0,
                       loss_on_multimask=False):
    """reference loss_fns.py:52-90."""
    prob = jax.nn.sigmoid(inputs)
    ce_loss = jnp.maximum(inputs, 0) - inputs * targets + jnp.log1p(
        jnp.exp(-jnp.abs(inputs))
    )
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce_loss * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    if loss_on_multimask:
        return jnp.mean(loss.reshape(*loss.shape[:2], -1), axis=-1) / num_objects
    return jnp.sum(jnp.mean(loss.reshape(loss.shape[0], -1), axis=-1)) / num_objects


def iou_loss(inputs, targets, pred_ious, num_objects, use_l1_loss=True):
    """L1 (or L2) between predicted IoU and actual IoU of thresholded masks
    (reference loss_fns.py:93-123). inputs/targets [N,M,H,W], pred_ious [N,M]."""
    pred_mask = (inputs.reshape(*inputs.shape[:2], -1) > 0).astype(jnp.float32)
    gt_mask = (targets.reshape(*targets.shape[:2], -1) > 0).astype(jnp.float32)
    area_i = jnp.sum(pred_mask * gt_mask, axis=-1)
    area_u = jnp.sum(pred_mask, axis=-1) + jnp.sum(gt_mask, axis=-1) - area_i
    actual_ious = area_i / jnp.clip(area_u, 1.0, None)
    if use_l1_loss:
        loss = jnp.abs(pred_ious - actual_ious)
    else:
        loss = (pred_ious - actual_ious) ** 2
    return loss / num_objects  # [N, M]


def multistep_multimasks_and_ious(
    outs_multimasks: List[jnp.ndarray],   # per step: [N, M, H, W] logits
    outs_ious: List[jnp.ndarray],         # per step: [N, M]
    outs_obj_scores: List[jnp.ndarray],   # per step: [N, 1]
    target_masks,                          # [N, 1, H, W] binary
    num_objects: float,
    weight_dict=None,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
    pred_obj_scores: bool = True,
    obj_valid=None,
) -> Dict[str, jnp.ndarray]:
    """reference MultiStepMultiMasksAndIous (loss_fns.py:126-307): per-step
    multimask losses, supervising the argmin-loss slot; weights follow the MOSE
    recipe {mask:20, dice:1, iou:1, class:1}.

    `obj_valid` ([N] bool, optional) marks real object slots: padded slots
    contribute ZERO to every loss term (the reference never materializes
    padded objects — it trains a flat obj->img index of real objects only,
    training/utils/data_utils.py:36-128; here the N axis is fixed-size for
    jit, so padding is masked out instead). `num_objects` should then be the
    count of valid objects.
    """
    if weight_dict is None:
        weight_dict = {"loss_mask": 20.0, "loss_dice": 1.0, "loss_iou": 1.0,
                       "loss_class": 1.0}
    losses = {"loss_mask": 0.0, "loss_dice": 0.0, "loss_iou": 0.0,
              "loss_class": 0.0}
    # loss math always in fp32, whatever the rollout's compute dtype: under
    # bf16 mixed-precision training (TrainConfig.compute_dtype) the logits
    # arrive bf16, and log-sigmoid/focal terms lose too much precision there
    # (torch autocast similarly pins binary_cross_entropy_with_logits to fp32)
    outs_multimasks = [m.astype(jnp.float32) for m in outs_multimasks]
    outs_ious = [i.astype(jnp.float32) for i in outs_ious]
    outs_obj_scores = [s.astype(jnp.float32) for s in outs_obj_scores]
    for masks, ious, obj_scores in zip(outs_multimasks, outs_ious, outs_obj_scores):
        target = jnp.broadcast_to(
            target_masks.astype(jnp.float32), masks.shape
        )
        target_obj = jnp.any(
            target_masks.reshape(target_masks.shape[0], -1) > 0, axis=-1,
            keepdims=True,
        ).astype(jnp.float32)

        loss_mm = sigmoid_focal_loss(
            masks, target, num_objects, focal_alpha, focal_gamma,
            loss_on_multimask=True,
        )
        loss_md = dice_loss(masks, target, num_objects, loss_on_multimask=True)
        loss_mi = iou_loss(masks, target, ious, num_objects)

        if pred_obj_scores:
            # per-object form ([N,1]) so padded slots can be masked below
            loss_class = sigmoid_focal_loss(
                obj_scores, target_obj, num_objects, alpha=-1.0, gamma=0.0,
                loss_on_multimask=True,
            )
            # mask losses only supervised where the object exists
            loss_mm = loss_mm * target_obj
            loss_md = loss_md * target_obj
            loss_mi = loss_mi * target_obj
        else:
            loss_class = jnp.zeros((masks.shape[0], 1), jnp.float32)

        if obj_valid is not None:
            v = obj_valid.astype(loss_mm.dtype)[:, None]  # [N,1]
            loss_mm = loss_mm * v
            loss_md = loss_md * v
            loss_mi = loss_mi * v
            loss_class = loss_class * v

        # supervise the slot with the lowest focal+dice loss — the IoU term is
        # deliberately NOT part of the selection, "to be consistent w/ SAM"
        # (reference loss_fns.py:268-281)
        combined = (
            loss_mm * weight_dict["loss_mask"]
            + loss_md * weight_dict["loss_dice"]
        )
        best = jnp.argmin(combined, axis=-1)  # [N]
        take = lambda x: jnp.take_along_axis(x, best[:, None], axis=-1)[:, 0]
        losses["loss_mask"] = losses["loss_mask"] + jnp.sum(take(loss_mm))
        losses["loss_dice"] = losses["loss_dice"] + jnp.sum(take(loss_md))
        # IoU head supervised on ALL slots (reference supervises all ious when
        # iou_use_l1_loss over selected... keep best-slot for simplicity, noted)
        losses["loss_iou"] = losses["loss_iou"] + jnp.sum(take(loss_mi))
        losses["loss_class"] = losses["loss_class"] + jnp.sum(loss_class)

    core = sum(weight_dict[k] * v for k, v in losses.items())
    losses["core_loss"] = core
    return losses
