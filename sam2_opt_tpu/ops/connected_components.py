"""Connected components + hole filling, pure XLA.

TPU-native replacement for the reference's CUDA union-find kernel
(sam2/sam2/csrc/connected_components.cu:213 `get_connected_componnets`, used by
utils/transforms.py:78-120 and utils/misc.py:312-337). There is no union-find
primitive on TPU; instead we run iterative min-label propagation:

    each sweep = 8-neighbor min  ->  segmented row cummin  ->  segmented col cummin

A component converges once its diameter (in row/col scan turns) is covered;
`num_iters` sweeps guarantee correct labels for any component whose shortest
internal path has <= num_iters direction changes. Hole-filling only needs tiny
components (area <= 8 in the video predictor, build_sam.py:121), for which the
default is ample headroom. This mirrors the reference's "best effort, skip on
failure" contract for this op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.int32(2**30)


def _segmented_cummin(values, resets, axis, reverse=False):
    """Running min along `axis` that restarts whenever resets is True."""
    axis = axis % values.ndim  # associative_scan(reverse=True) needs axis >= 0

    def combine(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, jnp.minimum(av, bv)), ar | br

    v, _ = jax.lax.associative_scan(
        combine, (values, resets), axis=axis, reverse=reverse
    )
    return v


def _row_col_pass(labels, mask, axis):
    """Propagate min labels along one axis within contiguous mask runs."""
    m = mask
    prev = jnp.roll(m, 1, axis=axis)
    idx = jnp.arange(m.shape[axis])
    shape = [1] * m.ndim
    shape[axis] = -1
    first = (idx == 0).reshape(shape)
    run_start_fwd = (~prev | first) | ~m
    labels = _segmented_cummin(labels, run_start_fwd, axis=axis)
    nxt = jnp.roll(m, -1, axis=axis)
    last = (idx == m.shape[axis] - 1).reshape(shape)
    run_start_bwd = (~nxt | last) | ~m
    labels = _segmented_cummin(labels, run_start_bwd, axis=axis, reverse=True)
    return jnp.where(m, labels, _INF)


def _neighbor_min(labels, mask):
    """One 8-connectivity min step (seeds diagonal propagation)."""
    H, W = labels.shape[-2], labels.shape[-1]
    padded = jnp.pad(labels, [(0, 0), (1, 1), (1, 1)], constant_values=2**30)
    best = labels
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            shifted = jax.lax.dynamic_slice(
                padded, (0, 1 + dy, 1 + dx), labels.shape
            )
            best = jnp.minimum(best, shifted)
    return jnp.where(mask, best, _INF)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def connected_components(mask, num_iters: int = 16):
    """8-connectivity CC labels and areas for a batch of binary masks.

    mask: [B, H, W] bool. Returns (labels [B,H,W] int32 with 0 = background and
    1..N component ids, areas [B,H,W] int32 = area of each pixel's component),
    matching the CUDA kernel's output contract (connected_components.cu:213).
    """
    B, H, W = mask.shape
    init = jnp.where(
        mask, jnp.arange(H * W, dtype=jnp.int32).reshape(1, H, W), _INF
    )

    def body(_, labels):
        labels = _neighbor_min(labels, mask)
        labels = _row_col_pass(labels, mask, axis=-1)
        labels = _row_col_pass(labels, mask, axis=-2)
        return labels

    labels = jax.lax.fori_loop(0, num_iters, body, init)

    flat = jnp.where(mask, labels, 0).reshape(B, H * W)
    ones = mask.reshape(B, H * W).astype(jnp.int32)
    counts = jax.vmap(
        lambda f, o: jnp.zeros((H * W,), jnp.int32).at[f].add(o)
    )(flat, ones)
    areas = jnp.take_along_axis(counts, flat, axis=1).reshape(B, H, W)
    areas = jnp.where(mask, areas, 0)
    labels_out = jnp.where(mask, labels + 1, 0)
    return labels_out, areas


def fill_holes_and_sprinkles(masks, mask_threshold: float, max_hole_area: float,
                             max_sprinkle_area: float, num_iters: int = 16):
    """Reference postprocess semantics (utils/transforms.py:86-106): holes are
    small background components (filled to threshold+10), sprinkles are small
    foreground components (suppressed to threshold-10). masks: [..., H, W]."""
    shape = masks.shape
    orig = masks.reshape(-1, shape[-2], shape[-1])
    # BOTH component maps are computed from the ORIGINAL logits (the
    # reference builds mask_flat once, before the hole-fill reassignment,
    # transforms.py:86-106) — running the sprinkle pass on hole-filled
    # logits would let a filled hole merge with a small island and push it
    # over the suppression threshold
    flat = orig
    if max_hole_area > 0:
        labels, areas = connected_components(
            orig <= mask_threshold, num_iters=num_iters
        )
        is_hole = (labels > 0) & (areas <= max_hole_area)
        flat = jnp.where(is_hole, mask_threshold + 10.0, flat)
    if max_sprinkle_area > 0:
        labels, areas = connected_components(
            orig > mask_threshold, num_iters=num_iters
        )
        is_sprinkle = (labels > 0) & (areas <= max_sprinkle_area)
        flat = jnp.where(is_sprinkle, mask_threshold - 10.0, flat)
    return flat.reshape(shape)


def fill_holes_in_mask_scores(mask, max_area: int, num_iters: int = 16):
    """Reference utils/misc.py:312-337: holes (background components with area
    <= max_area) get a small positive score 0.1. mask: [..., H, W] logits."""
    if max_area <= 0:
        return mask
    shape = mask.shape
    flat = mask.reshape(-1, shape[-2], shape[-1])
    labels, areas = connected_components(flat <= 0, num_iters=num_iters)
    is_hole = (labels > 0) & (areas <= max_area)
    flat = jnp.where(is_hole, 0.1, flat)
    return flat.reshape(shape)
