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


def _keystr_to_torch_name(key: str) -> str:
    """"['image_encoder']['trunk']['blocks'][3]['norm1']['weight']" ->
    "image_encoder.trunk.blocks.3.norm1.weight" (matches reference patterns)."""
    parts = re.findall(r"\[([^\]]+)\]", key)
    return ".".join(p.strip("'\"") for p in parts)


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
        name = _keystr_to_torch_name(key)
        if name.startswith(trunk_prefix):
            rel = name[len(trunk_prefix) + 1 :]
            layer_id = hiera_layer_id(rel, trunk_depth)
            scales[name] = layer_decay ** (num_layers - layer_id)
        else:
            scales[name] = 1.0
    return scales


_NO_DECAY_SUFFIXES = ("bias", "gamma")
_NO_DECAY_KEYWORDS = (
    "norm", "pos_embed", "no_mem_embed", "no_mem_pos_enc", "no_obj_ptr",
    "maskmem_tpos_enc", "no_obj_embed_spatial", "point_embeddings",
    "not_a_point_embed", "no_mask_embed", "iou_token", "mask_tokens",
    "obj_score_token", "positional_encoding_gaussian_matrix",
)


def default_weight_decay_mask(params):
    """True = apply weight decay. Norm/bias/embedding params excluded,
    matching the reference's gpt-style param grouping."""

    def decide(path, _leaf):
        name = _keystr_to_torch_name(jax.tree_util.keystr(path))
        if name.endswith(_NO_DECAY_SUFFIXES):
            return False
        if any(k in name for k in _NO_DECAY_KEYWORDS):
            return False
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
                for name in list(scales):
                    for pat, mult in pattern_lr_overrides.items():
                        if fnmatch.fnmatch(name, pat):
                            scales[name] *= mult
            flat = jax.tree_util.tree_flatten_with_path(params)
            leaves = [
                scales[_keystr_to_torch_name(jax.tree_util.keystr(p))]
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


def build_optimizer(params, base_lr: float = 5e-6, trunk_lr_scale: float = None,
                    weight_decay: float = 0.1, grad_clip_norm: float = 0.1,
                    layer_decay: float = 0.8, warmup_frac: float = 0.03,
                    trunk_depth: int = 48) -> ScheduledOptimizer:
    """MOSE-finetune-style optimizer (reference
    configs/sam2.1_training/sam2.1_hiera_b+_MOSE_finetune.yaml)."""
    return ScheduledOptimizer(
        params,
        lr_schedule=warmup_cosine_schedule(base_lr, warmup_frac=warmup_frac),
        weight_decay=weight_decay,
        grad_clip_norm=grad_clip_norm,
        layer_decay=layer_decay,
        trunk_depth=trunk_depth,
    )
