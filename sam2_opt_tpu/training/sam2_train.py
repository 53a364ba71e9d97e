"""SAM2 video training forward: simulated interactive tracking.

Re-design of sam2/training/model/sam2.py:25-541 (SAM2Train): per-video
training runs the tracker over T frames; initial conditioning frames get a
sampled point (or mask) prompt, later frames are tracked from memory, and
correction clicks are sampled from the error region between prediction and GT
(reference training/utils == sam2_utils.py:156-323 samplers).

TPU-first notes:
- the whole T-frame rollout is ONE jit graph (frames unrolled statically,
  optionally rematerialized with jax.checkpoint) — the reference's python
  loop over frames with backprop through all of it, minus host syncs;
- error-region click sampling uses jax.random.categorical over the error
  mask (the reference's sample_random_points_from_errors); the
  center-of-error (distance-transform) variant is host-side only and used
  for eval-style correction, not needed for the training gradient path.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from sam2_opt_tpu.config import SAM2Config
from sam2_opt_tpu.models import sam2_base as base
from sam2_opt_tpu.models import video_core as vc
from sam2_opt_tpu.ops import posenc
from sam2_opt_tpu.training import losses as L


def sample_random_points_from_errors(rng, gt_masks, pred_masks, num_pts: int = 1):
    """Sample correction clicks uniformly from the error region
    (reference sam2_utils.py:202-260). gt/pred: [B, 1, H, W] bool.
    Returns (coords [B, num_pts, 2] xy, labels [B, num_pts])."""
    B, _, H, W = gt_masks.shape
    gt = gt_masks[:, 0]
    pred = pred_masks[:, 0]
    fp = (~gt) & pred
    fn = gt & (~pred)
    error = fp | fn
    # when the prediction exactly matches GT, the reference samples a
    # NEGATIVE click from the BACKGROUND region (sam2_utils.py:236-242:
    # `pts_noise[..., 0] *= fp_masks | (all_correct & ~gt_masks)`) — a
    # positive fallback would supervise "positive click -> empty mask"
    any_error = jnp.any(error.reshape(B, -1), axis=-1, keepdims=True)
    pool = jnp.where(any_error[..., None].reshape(B, 1, 1), error, ~gt)
    logits = jnp.where(pool.reshape(B, -1), 0.0, -1e30)
    keys = jax.random.split(rng, num_pts)
    coords, labels = [], []
    for i in range(num_pts):
        idx = jax.random.categorical(keys[i], logits, axis=-1)  # [B]
        y = (idx // W).astype(jnp.float32)
        x = (idx % W).astype(jnp.float32)
        coords.append(jnp.stack([x, y], axis=-1))
        is_fn = jnp.take_along_axis(
            fn.reshape(B, -1), idx[:, None], axis=1
        )[:, 0]
        # clicks in FN (missing) regions are positive; FP regions and the
        # no-error background fallback are negative
        labels.append(jnp.where(is_fn, 1, 0).astype(jnp.int32))
    return jnp.stack(coords, axis=1), jnp.stack(labels, axis=1)


def sample_box_points(rng, masks, noise: float = 0.1, noise_bound: int = 20):
    """Box prompt (as corner points, labels 2/3) from a GT mask with optional
    jitter (reference sam2_utils.py:156-199). masks: [B, 1, H, W] bool."""
    B, _, H, W = masks.shape
    ys = jnp.any(masks[:, 0], axis=2)  # [B, H]
    xs = jnp.any(masks[:, 0], axis=1)  # [B, W]
    yi = jnp.arange(H)
    xi = jnp.arange(W)
    y0 = jnp.min(jnp.where(ys, yi, H), axis=1).astype(jnp.float32)
    y1 = jnp.max(jnp.where(ys, yi, -1), axis=1).astype(jnp.float32)
    x0 = jnp.min(jnp.where(xs, xi, W), axis=1).astype(jnp.float32)
    x1 = jnp.max(jnp.where(xs, xi, -1), axis=1).astype(jnp.float32)
    if noise > 0:
        bw = x1 - x0
        bh = y1 - y0
        mag = jnp.minimum(
            jnp.stack([bw, bh, bw, bh], -1) * noise, float(noise_bound)
        )
        jitter = jax.random.uniform(rng, (B, 4), minval=-1.0, maxval=1.0) * mag
        x0 = jnp.clip(x0 + jitter[:, 0], 0, W - 1)
        y0 = jnp.clip(y0 + jitter[:, 1], 0, H - 1)
        x1 = jnp.clip(x1 + jitter[:, 2], 0, W - 1)
        y1 = jnp.clip(y1 + jitter[:, 3], 0, H - 1)
    coords = jnp.stack(
        [jnp.stack([x0, y0], -1), jnp.stack([x1, y1], -1)], axis=1
    )  # [B, 2, 2]
    labels = jnp.broadcast_to(jnp.asarray([2, 3], jnp.int32)[None], (B, 2))
    return coords, labels


def get_next_point(gt_masks: "np.ndarray", pred_masks, method: str = "uniform"):
    """Host-side next-click sampler (reference sam2_utils.py:317 get_next_point):
    method "center" picks the center of the largest error region via a
    distance transform (cv2); "uniform" samples uniformly from the error
    region. Used for eval-style interactive correction outside the jit path.
    gt/pred: [B, 1, H, W] numpy bool. Returns (coords [B,1,2], labels [B,1])."""
    import numpy as np

    B, _, H, W = gt_masks.shape
    coords = np.zeros((B, 1, 2), np.float32)
    labels = np.zeros((B, 1), np.int32)
    for b in range(B):
        gt = gt_masks[b, 0].astype(bool)
        pred = (
            np.zeros_like(gt) if pred_masks is None else pred_masks[b, 0].astype(bool)
        )
        fp = ~gt & pred
        fn = gt & ~pred
        error = fp | fn
        pool = error if error.any() else gt
        if not pool.any():
            labels[b, 0] = -1
            continue
        if method == "center":
            import cv2

            dist = cv2.distanceTransform(
                pool.astype(np.uint8), cv2.DIST_L2, 0
            )
            y, x = np.unravel_index(np.argmax(dist), dist.shape)
        else:
            ys, xs = np.nonzero(pool)
            i = np.random.randint(len(ys))
            y, x = ys[i], xs[i]
        coords[b, 0] = (x, y)
        labels[b, 0] = 1 if (fn[y, x] or not error.any()) else 0
    return coords, labels


def _gt_point_prompt(rng, gt_masks):
    """First click: a positive point sampled from the GT mask."""
    zeros = jnp.zeros_like(gt_masks)
    return sample_random_points_from_errors(rng, gt_masks, zeros, num_pts=1)


def _init_prompt(rng, gt_masks, use_box: bool):
    """Initial prompt in a static [B, 2] layout: box mode uses the two jittered
    corner points (labels 2/3); point mode uses one GT click + one padding
    point (label -1) — matching how the reference mixes box/point prompts
    (model/sam2.py prob_to_use_box_input)."""
    if use_box:
        return sample_box_points(rng, gt_masks)
    coords, labels = _gt_point_prompt(rng, gt_masks)
    B = coords.shape[0]
    pad_c = jnp.zeros((B, 1, 2), jnp.float32)
    pad_l = -jnp.ones((B, 1), jnp.int32)
    return (
        jnp.concatenate([coords, pad_c], axis=1),
        jnp.concatenate([labels, pad_l], axis=1),
    )


def _training_memory(cfg: SAM2Config, frame_idx: int, num_frames: int,
                     cond_mems: Dict[int, jnp.ndarray],
                     noncond_mems: Dict[int, jnp.ndarray],
                     cond_ptrs: Dict[int, jnp.ndarray],
                     noncond_ptrs: Dict[int, jnp.ndarray],
                     mem_cap: int, ptr_cap: int):
    """Assemble a MemoryInput for one tracked frame, reproducing the
    reference training-mode memory selection EXACTLY
    (sam2_base_official.py:616-760, stride=1 in training):

    - every init-cond frame's memory participates forever, with temporal
      embedding row `num_maskmem - 1` (t_pos 0);
    - the last `num_maskmem - 1` NON-cond frames participate; a frame at
      distance d uses temporal embedding row `d - 1` (t_pos num_maskmem-d);
    - object pointers: all cond-frame pointers (training ignores
      only_obj_ptrs_in_the_past_for_eval) plus non-cond pointers at
      distances 1..max_obj_ptrs-1, each at normalized temporal position
      `(frame_idx - t) / (min(num_frames, max_obj_ptrs) - 1)`.

    `mem_cap`/`ptr_cap` are the static slot counts of the compiled variant.
    """
    D = cfg.mem_dim
    entries = []  # (tpos_row, feats)
    for t_c in sorted(cond_mems):
        entries.append((cfg.num_maskmem - 1, cond_mems[t_c]))
    for d in range(cfg.num_maskmem - 1, 0, -1):
        prev = frame_idx - d
        if prev in noncond_mems:
            entries.append((d - 1, noncond_mems[prev]))
    assert len(entries) <= mem_cap, (len(entries), mem_cap)
    any_mem = entries[0][1] if entries else next(iter(cond_mems.values()))
    B = any_mem.shape[0]
    feats, tpos, valid = [], [], []
    for i in range(mem_cap):
        if i < len(entries):
            tpos.append(entries[i][0])
            feats.append(entries[i][1])
            valid.append(True)
        else:
            tpos.append(0)
            feats.append(jnp.zeros_like(any_mem))
            valid.append(False)

    max_obj_ptrs = min(num_frames, cfg.max_obj_ptrs_in_encoder)
    t_diff_max = max(max_obj_ptrs - 1, 1)
    ptr_entries = []  # (normalized pos, ptr)
    for t_c in sorted(cond_ptrs):
        ptr_entries.append(((frame_idx - t_c) / t_diff_max, cond_ptrs[t_c]))
    for d in range(1, max_obj_ptrs):
        t = frame_idx - d
        if t < 0:
            break
        if t in noncond_ptrs:
            ptr_entries.append((d / t_diff_max, noncond_ptrs[t]))
    assert len(ptr_entries) <= ptr_cap, (len(ptr_entries), ptr_cap)
    any_ptr = ptr_entries[0][1] if ptr_entries else next(iter(cond_ptrs.values()))
    ptrs, ppos, pvalid = [], [], []
    for i in range(ptr_cap):
        if i < len(ptr_entries):
            ppos.append(ptr_entries[i][0])
            ptrs.append(ptr_entries[i][1])
            pvalid.append(True)
        else:
            ppos.append(0.0)
            ptrs.append(jnp.zeros_like(any_ptr))
            pvalid.append(False)

    def tile(x, dtype):
        return jnp.broadcast_to(jnp.asarray(x, dtype)[None], (B, len(x)))

    return vc.MemoryInput(
        feats=tuple(feats),
        tpos_idx=tile(tpos, jnp.int32),
        valid=tile(valid, bool),
        ptrs=tuple(ptrs),
        ptr_pos=tile(ppos, jnp.float32),
        ptr_valid=tile(pvalid, bool),
    )


def forward_tracking(
    params,
    cfg: SAM2Config,
    images,        # [T, S, S, 3] float in [0,1] (one video)
    gt_masks,      # [T, B_obj, S, S] bool
    rng,
    num_init_cond_frames: int = 1,
    use_box_input: bool = False,
    use_mask_input: bool = False,
    num_correction_clicks: int = 1,
    use_remat: bool = True,
    remat_frames: bool = False,
    frames_to_add_correction_pt: Tuple[int, ...] = (),
    obj_valid=None,
):
    """Simulated interactive tracking over T frames (reference
    model/sam2.py:269-447 forward_tracking + track_step).

    `use_box_input` / `use_mask_input` select the initial prompt form; the
    trainer samples them per step from prob_to_use_pt_input /
    prob_to_use_box_input (reference model/sam2.py:146-267) — static per
    compiled variant. `frames_to_add_correction_pt` lists EXTRA (non-init)
    tracked frames that receive iterative correction clicks (reference
    `frames_to_add_correction_pt`, model/sam2.py:255-265 + 405-447); init
    frames always get them under point input. Every correction step's
    outputs are supervised (reference _iter_correct_pt_sampling appends all
    steps to the multistep lists).

    Returns per-frame LISTS-of-steps of (high-res multimask logits, ious,
    object scores) plus per-frame targets for the loss.
    """
    T = images.shape[0]
    B = gt_masks.shape[1]
    S = cfg.image_size

    # batched backbone over all frames (reference :110 forward_image on
    # the flattened image batch)
    def encode(img):
        out = base.forward_image(params, cfg, base.image_normalize(img))
        return out["backbone_fpn"]

    encode_fn = jax.checkpoint(encode) if use_remat else encode
    feats_all = encode_fn(images)  # list of 3 maps [T, ...]

    outs_masks, outs_ious, outs_scores, target_list = [], [], [], []
    # reference training memory bookkeeping (sam2_base_official.py:616-760):
    # cond-frame memories/pointers persist for the whole rollout; non-cond
    # memories only matter within the last num_maskmem-1 frames (stride=1)
    cond_mems: Dict[int, jnp.ndarray] = {}
    noncond_mems: Dict[int, jnp.ndarray] = {}
    cond_ptrs: Dict[int, jnp.ndarray] = {}
    noncond_ptrs: Dict[int, jnp.ndarray] = {}
    # static slot counts shared by every tracked frame in this compiled variant
    mem_cap = num_init_cond_frames + cfg.num_maskmem - 1
    ptr_cap = num_init_cond_frames + min(T, cfg.max_obj_ptrs_in_encoder) - 1

    def frame_feats(t):
        f0 = jnp.repeat(feats_all[0][t : t + 1], B, axis=0)
        f1 = jnp.repeat(feats_all[1][t : t + 1], B, axis=0)
        f2 = jnp.repeat(feats_all[2][t : t + 1], B, axis=0)
        return f0, f1, f2

    for t in range(T):
        rng, k1, k2 = jax.random.split(rng, 3)
        gt_t = gt_masks[t][:, None]  # [B, 1, S, S]
        f0, f1, f2 = frame_feats(t)
        is_init = t < num_init_cond_frames

        # correction clicks apply on init frames under point input, AND on
        # any tracked frame listed in frames_to_add_correction_pt (reference
        # _iter_correct_pt_sampling :448-529 + model/sam2.py:405-447)
        correct_here = (
            (is_init and not use_mask_input)
            or (not is_init and t in frames_to_add_correction_pt)
        )
        n_clicks = num_correction_clicks if correct_here else 0
        # pre-split the correction keys with the EXACT same rng threading as
        # before the frame body became checkpointable (parity-sensitive)
        click_keys = []
        for _ in range(n_clicks):
            rng, kc = jax.random.split(rng)
            click_keys.append(kc)
        click_keys = jnp.stack(click_keys) if click_keys else None
        mem = None
        if not is_init:
            mem = _training_memory(
                cfg, t, T, cond_mems, noncond_mems, cond_ptrs, noncond_ptrs,
                mem_cap, ptr_cap,
            )

        # the whole per-frame step (memory conditioning + SAM heads +
        # correction clicks + memory encoder) as one function of arrays so
        # `remat_frames` can jax.checkpoint it: the backward pass then
        # recomputes one frame at a time instead of keeping every frame's
        # memory-attention/FFN intermediates live — together with
        # HieraConfig.remat_blocks this is what fits the hiera-b+ @1024²
        # 8-frame MOSE rollout on one 16 GB v5e chip
        def one_frame(params, f0, f1, f2, gt_t, mem, k1, click_keys,
                      _is_init=is_init, _n_clicks=n_clicks):
            if _is_init:
                pix_feat = base.no_mem_features(params, f2)
                if use_mask_input:
                    coords = labels = None
                else:
                    coords, labels = _init_prompt(k1, gt_t, use_box_input)
            else:
                pix_feat = vc.condition_on_memory(params, cfg, f2, mem)
                Bo = gt_t.shape[0]
                coords = jnp.zeros((Bo, 1, 2), jnp.float32)
                labels = -jnp.ones((Bo, 1), jnp.int32)

            def sam_step(coords, labels, mask_prompt=None):
                return base.forward_sam_heads(
                    params, cfg, pix_feat, coords, labels,
                    mask_inputs=mask_prompt, high_res_features=(f0, f1),
                    multimask_output=True,
                )

            if _is_init and use_mask_input:
                # GT-mask-as-prompt init frame (reference use_mask_input
                # path, sam2_base_official.py:496 _use_mask_as_output)
                outs = base.use_mask_as_output(
                    params, cfg, pix_feat, (f0, f1),
                    gt_t.astype(jnp.float32)
                )
            else:
                outs = sam_step(coords, labels)
            (low_mm, high_mm, ious, low_res, high_res, obj_ptr,
             obj_score) = outs
            step_masks = [high_mm]
            step_ious = [ious]
            step_scores = [obj_score]

            # every correction step is appended for loss supervision
            for ci in range(_n_clicks):
                pred_bin = high_res > 0
                c2, l2 = sample_random_points_from_errors(
                    click_keys[ci], gt_t, pred_bin
                )
                coords = jnp.concatenate([coords, c2], axis=1)
                labels = jnp.concatenate([labels, l2], axis=1)
                mask_prompt = jnp.transpose(
                    jnp.clip(low_res, -32.0, 32.0), (0, 2, 3, 1)
                )
                outs = sam_step(coords, labels, mask_prompt)
                (low_mm, high_mm, ious, low_res, high_res, obj_ptr,
                 obj_score) = outs
                step_masks.append(high_mm)
                step_ious.append(ious)
                step_scores.append(obj_score)

            # encode this frame into memory for the next frames;
            # is_mask_from_pts follows the reference: True iff this frame
            # had POINT inputs (model/sam2.py track_step passes point_inputs
            # to _encode_memory_in_output — mask-prompt init frames are
            # False, and plain tracked frames only become True via
            # correction clicks)
            had_points = (_is_init and not use_mask_input) or _n_clicks > 0
            maskmem, _ = base.encode_new_memory(
                params, cfg, f2, high_res, obj_score,
                is_mask_from_pts=had_points,
            )
            return (tuple(step_masks), tuple(step_ious),
                    tuple(step_scores), maskmem, obj_ptr)

        frame_fn = jax.checkpoint(one_frame) if remat_frames else one_frame
        step_masks, step_ious, step_scores, maskmem, obj_ptr = frame_fn(
            params, f0, f1, f2, gt_t, mem, k1, click_keys
        )
        outs_masks.append(list(step_masks))
        outs_ious.append(list(step_ious))
        outs_scores.append(list(step_scores))
        target_list.append(gt_t)
        if obj_valid is not None:
            # Padded object slots never enter memory (the reference trains
            # only real objects, training/utils/data_utils.py:36-128). The
            # object axis is the batch axis here, so this is belt-and-braces
            # — padded slots cannot contaminate real ones — but it keeps
            # their rollout inert and their loss exactly zero.
            vb = obj_valid.astype(maskmem.dtype)
            maskmem = maskmem * vb[:, None, None, None]
            obj_ptr = obj_ptr * vb[:, None].astype(obj_ptr.dtype)
        if is_init:
            cond_mems[t] = maskmem
            cond_ptrs[t] = obj_ptr
        else:
            noncond_mems[t] = maskmem
            noncond_ptrs[t] = obj_ptr
            # only the last num_maskmem-1 / max_obj_ptrs-1 non-cond entries
            # can ever be selected again — drop older ones from the graph
            for old in [k for k in noncond_mems if k <= t - cfg.num_maskmem]:
                noncond_mems.pop(old)
            for old in [
                k for k in noncond_ptrs
                if k <= t - min(T, cfg.max_obj_ptrs_in_encoder)
            ]:
                noncond_ptrs.pop(old)

    return outs_masks, outs_ious, outs_scores, target_list


def video_train_loss(params, cfg: SAM2Config, images, gt_masks, rng,
                     obj_valid=None, **kwargs):
    """Scalar training loss over one video (multistep multimask loss across
    frames, reference loss_fns.py:126 MultiStepMultiMasksAndIous). Every
    correction step of every frame is supervised, matching the reference's
    multistep lists.

    `obj_valid` ([N_obj] bool, optional): real-object mask from the data
    pipeline's fixed-size object padding. Padded slots are excluded from every
    loss term AND from the num_objects normalizer, so appending a padded slot
    leaves the loss unchanged (reference supervises only real objects,
    training/utils/data_utils.py:36-128)."""
    masks, ious, scores, targets = forward_tracking(
        params, cfg, images, gt_masks, rng, obj_valid=obj_valid, **kwargs
    )
    B = gt_masks.shape[1]
    if obj_valid is None:
        num_objects = float(B)
    else:
        num_objects = jnp.maximum(
            jnp.sum(obj_valid.astype(jnp.float32)), 1.0
        )
    total = 0.0
    aux = {"loss_mask": 0.0, "loss_dice": 0.0, "loss_iou": 0.0, "loss_class": 0.0}
    for m, i, s, tgt in zip(masks, ious, scores, targets):
        tgt_hr = tgt.astype(jnp.float32)
        ld = L.multistep_multimasks_and_ious(
            m, i, s, tgt_hr, num_objects,
            pred_obj_scores=cfg.pred_obj_scores,
            obj_valid=obj_valid,
        )
        total = total + ld["core_loss"]
        for k in aux:
            aux[k] = aux[k] + ld[k]
    # SUM over frames like the reference MultiStepMultiMasksAndIous.forward
    # (loss_fns.py:176-181) — dividing by T would shrink gradients T-fold
    # under the reference recipe's lr/clip hyperparameters
    return total, aux
