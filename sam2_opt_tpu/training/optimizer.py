"""Declarative optimizer builder: param groups, LLRD, per-step schedules.

Re-design of sam2/training/optimizer.py:1-502 on optax:
- unix-pattern -> param-group option mapping (map_scheduler_cfgs_to_param_groups)
- layer-wise learning-rate decay for the Hiera trunk (layer_decay_param_modifier
  :422, using the reference's get_layer_id rule, hieradet.py:301-314)
- schedulers stepped by `where` in [0,1) fraction of training
  (Optimizer.step_schedulers :52-76)
- gradient clipping (GradientClipper :380)
"""

from __future__ import annotations

import fnmatch
import math
import re
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from sam2_opt_tpu.utils.misc import keystr_to_dotted


# --------------------------------------------------------------------- #
# schedules by `where` fraction
# --------------------------------------------------------------------- #

def cosine_schedule(start: float, end: float):
    def fn(where: float) -> float:
        return end + 0.5 * (start - end) * (1 + math.cos(math.pi * where))

    return fn


def linear_schedule(start: float, end: float):
    def fn(where: float) -> float:
        return start + (end - start) * where

    return fn


def constant_schedule(value: float):
    return lambda where: value


def warmup_cosine_schedule(base: float, warmup_frac: float = 0.03,
                           end: float = 0.0, warmup_init: float = 0.0):
    cos = cosine_schedule(base, end)

    def fn(where: float) -> float:
        if where < warmup_frac:
            return warmup_init + (base - warmup_init) * (where / warmup_frac)
        return cos((where - warmup_frac) / max(1 - warmup_frac, 1e-8))

    return fn


# --------------------------------------------------------------------- #
# param groups
# --------------------------------------------------------------------- #

def _param_names(params) -> List[str]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [jax.tree_util.keystr(p) for p, _ in flat]




def hiera_layer_id(name: str, num_layers: int) -> int:
    """reference hieradet.py:301-314 get_layer_id."""
    if "rel_pos" in name:
        return num_layers + 1
    if "pos_embed" in name:
        return 0
    if "patch_embed" in name:
        return 0
    if "blocks" in name:
        m = re.search(r"blocks\.(\d+)", name)
        if m:
            return int(m.group(1)) + 1
    return num_layers + 1


def layer_decay_lr_scales(params, layer_decay: float, trunk_depth: int,
                          trunk_prefix: str = "image_encoder.trunk") -> Dict[str, float]:
    """Per-param lr multipliers implementing LLRD on the trunk
    (reference layer_decay_param_modifier, optimizer.py:422-472)."""
    num_layers = trunk_depth + 1
    scales = {}
    for key in _param_names(params):
        name = keystr_to_dotted(key)
        if name.startswith(trunk_prefix):
            rel = name[len(trunk_prefix) + 1 :]
            layer_id = hiera_layer_id(rel, trunk_depth)
            scales[name] = layer_decay ** (num_layers - layer_id)
        else:
            scales[name] = 1.0
    return scales


def default_weight_decay_mask(params):
    """True = apply weight decay. Matches the reference MOSE recipe exactly
    (sam2.1_hiera_b+_MOSE_finetune.yaml options.weight_decay): only
    '*bias*' params and LayerNorm/LayerNorm2d WEIGHTS are excluded. In this
    architecture every 1-D '.weight' is a LayerNorm scale (conv/linear
    weights are >=2-D), which also covers LN modules at numeric Sequential
    indices whose names carry no 'norm' keyword. Everything else — including
    layer-scale gamma, pos_embed, and embedding tokens — IS decayed, like
    the reference. The frozen PositionEmbeddingRandom gaussian matrix (a
    torch BUFFER, never optimized there) is excluded too."""

    def decide(path, leaf):
        name = keystr_to_dotted(jax.tree_util.keystr(path))
        if name.endswith("bias"):
            return False
        if name.endswith("weight") and getattr(leaf, "ndim", 0) == 1:
            return False  # LayerNorm / LayerNorm2d scale
        if "positional_encoding_gaussian_matrix" in name:
            return False  # buffer in torch, not a parameter
        return True

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves = [decide(p, l) for p, l in flat[0]]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), leaves
    )


class ScheduledOptimizer:
    """optax optimizer whose lr (and optionally wd) follow `where` in [0,1).

    Mirrors the reference Optimizer wrapper (optimizer.py:29-76): call
    `update(grads, state, params, where=...)`.
    """

    def __init__(
        self,
        params,
        lr_schedule: Callable[[float], float],
        weight_decay: float = 0.1,
        grad_clip_norm: Optional[float] = 0.1,
        layer_decay: Optional[float] = None,
        trunk_depth: int = 48,
        b1: float = 0.9,
        b2: float = 0.999,
        pattern_lr_overrides: Optional[Dict[str, float]] = None,
    ):
        self.lr_schedule = lr_schedule
        self._lr = jnp.asarray(lr_schedule(0.0), jnp.float32)

        lr_scales = None
        if layer_decay is not None or pattern_lr_overrides:
            scales = layer_decay_lr_scales(
                params, layer_decay if layer_decay is not None else 1.0,
                trunk_depth,
            )
            if pattern_lr_overrides:
                # SET semantics like the reference layer_decay_param_modifier
                # overrides (pattern '*pos_embed*' -> value 1.0 REPLACES the
                # decayed scale)
                for name in list(scales):
                    for pat, value in pattern_lr_overrides.items():
                        if fnmatch.fnmatch(name, pat):
                            scales[name] = value
            flat = jax.tree_util.tree_flatten_with_path(params)
            leaves = [
                scales[keystr_to_dotted(jax.tree_util.keystr(p))]
                for p, _ in flat[0]
            ]
            lr_scales = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(params), leaves
            )
        self.lr_scales = lr_scales

        chain = []
        if grad_clip_norm is not None:
            chain.append(optax.clip_by_global_norm(grad_clip_norm))
        chain.append(optax.scale_by_adam(b1=b1, b2=b2))
        if weight_decay:
            chain.append(
                optax.add_decayed_weights(
                    weight_decay, mask=default_weight_decay_mask(params)
                )
            )
        self._tx = optax.chain(*chain)

    def init(self, params):
        return self._tx.init(params)

    def lr_at(self, where: float) -> float:
        """Host-side schedule lookup; pass the result into the compiled
        update as a scalar array (avoids per-step recompilation)."""
        return float(self.lr_schedule(float(where)))

    def update(self, grads, state, params, lr):
        """lr: scalar (traced) learning rate."""
        updates, state = self._tx.update(grads, state, params)
        if self.lr_scales is not None:
            updates = jax.tree_util.tree_map(
                lambda u, s: u * (-lr * s), updates, self.lr_scales
            )
        else:
            updates = jax.tree_util.tree_map(lambda u: u * (-lr), updates)
        return updates, state


def build_optimizer(params, base_lr: float = 5e-6,
                    trunk_lr_scale: float = 0.6,
                    weight_decay: float = 0.1, grad_clip_norm: float = 0.1,
                    layer_decay: float = 0.9, warmup_frac: float = 0.03,
                    trunk_depth: int = 48) -> ScheduledOptimizer:
    """MOSE-finetune-style optimizer (reference
    configs/sam2.1_training/sam2.1_hiera_b+_MOSE_finetune.yaml:240-278):
    cosine base_lr -> base_lr/10; image_encoder.* at vision lr
    (trunk_lr_scale = vision_lr/base_lr = 3e-6/5e-6); LLRD 0.9 over the
    trunk with the '*pos_embed*' -> 1.0 override; AdamW wd 0.1 except
    biases + LayerNorm weights. (The short linear warmup has no yaml
    counterpart; fvcore starts the cosine directly — warmup_frac=0
    reproduces that exactly.)"""
    opt = ScheduledOptimizer(
        params,
        lr_schedule=warmup_cosine_schedule(
            base_lr, warmup_frac=warmup_frac, end=base_lr / 10.0
        ),
        weight_decay=weight_decay,
        grad_clip_norm=grad_clip_norm,
        layer_decay=layer_decay,
        trunk_depth=trunk_depth,
        pattern_lr_overrides={
            "*pos_embed*": 1.0,
            # torch buffer, never optimized in the reference
            "*positional_encoding_gaussian_matrix*": 0.0,
        },
    )
    if trunk_lr_scale and trunk_lr_scale != 1.0 and opt.lr_scales is not None:
        # separate vision lr for the image encoder (reference options.lr
        # param_names 'image_encoder.*'), multiplied ON TOP of LLRD
        flat = jax.tree_util.tree_flatten_with_path(opt.lr_scales)
        leaves = []
        for path, scale in flat[0]:
            name = keystr_to_dotted(jax.tree_util.keystr(path))
            leaves.append(
                scale * trunk_lr_scale if name.startswith("image_encoder")
                else scale
            )
        opt.lr_scales = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(opt.lr_scales), leaves
        )
    return opt
