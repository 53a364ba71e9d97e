"""Sharded SAM2 training step (image fine-tune core).

The TPU-native counterpart of the reference Trainer._run_step / SAM2Train
forward (training/trainer.py:845, training/model/sam2.py:107): one compiled
pjit step — forward (encode + SAM heads with a point prompt), multimask losses,
grads, optimizer update — data-parallel over the "data" mesh axis with
optional tensor parallelism over "model" (XLA inserts the collectives that
DDP/NCCL provided in the reference).

Round-1 scope note: this is the static-image SAM training core (the
`num_frames=1` degenerate case of SAM2Train). The full video prompt-simulation
loop (iterative correction clicks across frames) layers on top of this.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from sam2_opt_tpu.config import SAM2Config
from sam2_opt_tpu.models import sam2_base as base
from sam2_opt_tpu.training import losses as L
from sam2_opt_tpu.parallel import mesh as mesh_lib


class TrainState(NamedTuple):
    params: Dict
    opt_state: object
    step: jnp.ndarray


def sample_center_points(masks):
    """Differentiable-free center-of-mass click per mask (a simple stand-in for
    the reference's error-region sampling, sam2_utils.py:202-317).
    masks: [B, 1, H, W] binary -> coords [B, 1, 2] (x, y), labels [B, 1]."""
    B, _, H, W = masks.shape
    m = masks[:, 0].astype(jnp.float32)
    total = jnp.clip(jnp.sum(m, axis=(1, 2)), 1.0, None)
    ys = jnp.sum(m * jnp.arange(H)[None, :, None], axis=(1, 2)) / total
    xs = jnp.sum(m * jnp.arange(W)[None, None, :], axis=(1, 2)) / total
    coords = jnp.stack([xs, ys], axis=-1)[:, None, :]
    labels = jnp.ones((B, 1), jnp.int32)
    return coords, labels


def forward_loss(params, cfg: SAM2Config, images, gt_masks):
    """images [B,S,S,3] in [0,1]; gt_masks [B,1,S,S] binary. Returns scalar loss."""
    out = base.forward_image(params, cfg, base.image_normalize(images))
    hrf0, hrf1, embed = out["backbone_fpn"]
    embed = base.no_mem_features(params, embed)
    coords, labels = sample_center_points(gt_masks)
    coords = coords * (cfg.image_size / gt_masks.shape[-1])
    (
        low_res_multimasks,
        high_res_multimasks,
        ious,
        _low,
        _high,
        _ptr,
        object_score_logits,
    ) = base.forward_sam_heads(
        params, cfg, embed, coords, labels,
        high_res_features=(hrf0, hrf1), multimask_output=True,
    )
    target = base.resize_hw(
        gt_masks.astype(jnp.float32),
        (high_res_multimasks.shape[-2], high_res_multimasks.shape[-1]),
        "bilinear",
    )
    target = (target >= 0.5).astype(jnp.float32)
    num_objects = float(gt_masks.shape[0])
    loss_dict = L.multistep_multimasks_and_ious(
        [high_res_multimasks], [ious], [object_score_logits],
        target, num_objects, pred_obj_scores=cfg.pred_obj_scores,
    )
    return loss_dict["core_loss"], loss_dict


def make_optimizer(learning_rate: float = 1e-5, weight_decay: float = 0.1,
                   grad_clip: float = 0.1):
    """AdamW + global-norm clipping (reference optimizer.py defaults)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(learning_rate, weight_decay=weight_decay),
    )


def make_train_step(cfg: SAM2Config, optimizer, mesh=None):
    """Build the compiled train step. With a mesh, inputs are sharded on
    "data" and params follow the TP rule in parallel/mesh.py."""

    def step_fn(state: TrainState, images, gt_masks):
        def loss_fn(p):
            loss, aux = forward_loss(p, cfg, images, gt_masks)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_opt, state.step + 1)
        metrics = {
            "loss": loss,
            "loss_mask": aux["loss_mask"],
            "loss_dice": aux["loss_dice"],
            "loss_iou": aux["loss_iou"],
            "loss_class": aux["loss_class"],
        }
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    data_sh4 = mesh_lib.data_sharded(mesh, 4)
    return jax.jit(
        step_fn,
        donate_argnums=(0,),
        in_shardings=(None, data_sh4, data_sh4),
    )


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
