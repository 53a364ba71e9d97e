"""Training stack tests: optimizer/LLRD, data pipeline, losses, and an
end-to-end tiny train step with checkpoint save/resume."""

import os
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam2_opt_tpu.config import model_config
from sam2_opt_tpu.models.init import init_params
from sam2_opt_tpu.training import losses as L
from sam2_opt_tpu.training.optimizer import (
    build_optimizer,
    hiera_layer_id,
    layer_decay_lr_scales,
    warmup_cosine_schedule,
)
from sam2_opt_tpu.training.data import (
    PNGRawDataset,
    RandomUniformSampler,
    VOSDataset,
    collate_videos,
    data_loader,
)


def test_schedule_warmup_cosine():
    sched = warmup_cosine_schedule(1.0, warmup_frac=0.1)
    assert sched(0.0) == 0.0
    assert abs(sched(0.1) - 1.0) < 1e-6
    assert sched(0.5) < 1.0
    assert sched(1.0) < 1e-6


def test_hiera_layer_ids():
    assert hiera_layer_id("patch_embed.proj.weight", 48) == 0
    assert hiera_layer_id("pos_embed", 48) == 0
    assert hiera_layer_id("blocks.5.attn.qkv.weight", 48) == 6
    assert hiera_layer_id("unknown.thing", 48) == 49


def test_llrd_scales(tiny128_cfg, tiny128_params):
    cfg = tiny128_cfg
    params = tiny128_params
    scales = layer_decay_lr_scales(params, 0.8, cfg.trunk.depth)
    # earliest trunk layer decayed the most; non-trunk params unscaled
    assert scales["image_encoder.trunk.patch_embed.proj.weight"] == pytest.approx(
        0.8 ** (cfg.trunk.depth + 1)
    )
    assert scales["sam_mask_decoder.iou_token.weight"] == 1.0
    last = f"image_encoder.trunk.blocks.{cfg.trunk.depth-1}.mlp.layers.0.weight"
    assert scales[last] == pytest.approx(0.8)


def test_losses_shapes():
    rng = np.random.default_rng(0)
    masks = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
    ious = jnp.asarray(rng.random((2, 3)), jnp.float32)
    scores = jnp.asarray(rng.standard_normal((2, 1)), jnp.float32)
    target = jnp.asarray(rng.random((2, 1, 32, 32)) > 0.5)
    out = L.multistep_multimasks_and_ious([masks], [ious], [scores], target, 2.0)
    assert np.isfinite(float(out["core_loss"]))


def _make_davis_dataset(tmp_path, num_videos=2, num_frames=3, size=64):
    from PIL import Image

    img_root = tmp_path / "JPEGImages"
    gt_root = tmp_path / "Annotations"
    rng = np.random.default_rng(0)
    for v in range(num_videos):
        vd = img_root / f"video{v}"
        gd = gt_root / f"video{v}"
        os.makedirs(vd), os.makedirs(gd)
        for t in range(num_frames):
            img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(vd / f"{t:05d}.jpg")
            mask = np.zeros((size, size), np.uint8)
            mask[16:40, 8 + 2 * t : 32 + 2 * t] = 1
            Image.fromarray(mask).save(gd / f"{t:05d}.png")
    return str(img_root), str(gt_root)


def test_vos_dataset_and_loader(tmp_path):
    img_root, gt_root = _make_davis_dataset(tmp_path)
    raw = PNGRawDataset(img_root, gt_root)
    ds = VOSDataset(raw, RandomUniformSampler(num_frames=2), image_size=64,
                    max_num_objects=2)
    sample = ds[0]
    assert sample["images"].shape == (2, 64, 64, 3)
    assert sample["masks"].shape == (2, 2, 64, 64)
    assert sample["obj_valid"][0] and not sample["obj_valid"][1]
    batches = list(data_loader(ds, batch_size=2, drop_last=True))
    assert batches[0]["images"].shape == (2, 2, 64, 64, 3)


def test_train_step_end_to_end(tmp_path, tiny128_cfg, tiny128_params):
    """Tiny full train step: rollout, grads, update, checkpoint, resume."""
    from sam2_opt_tpu.training.trainer import TrainConfig, Trainer
    from sam2_opt_tpu.training.data import EvalSampler

    img_root, gt_root = _make_davis_dataset(tmp_path, num_videos=1,
                                            num_frames=2, size=128)
    cfg = tiny128_cfg
    # the compiled train step donates its params buffers — copy so the shared
    # session fixture stays alive for later tests
    params = jax.tree_util.tree_map(jnp.copy, tiny128_params)
    tcfg = TrainConfig(
        num_epochs=1, batch_size=1, num_frames=2, max_num_objects=1,
        checkpoint_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
        num_correction_clicks=1,
    )
    trainer = Trainer(cfg, params, tcfg)
    raw = PNGRawDataset(img_root, gt_root)
    ds = VOSDataset(raw, RandomUniformSampler(num_frames=2), image_size=128,
                    max_num_objects=1, hflip_prob=0.0)

    def loader_fn(epoch):
        return data_loader(ds, batch_size=1, shuffle=False, drop_last=False)

    trainer.run(loader_fn, steps_per_epoch=1)
    assert trainer.steps == 1
    assert trainer.ckpt.latest_step() is not None

    # resume path: fresh trainer picks up the checkpoint
    trainer2 = Trainer(cfg, init_params(cfg, jax.random.PRNGKey(1)), tcfg)
    assert trainer2.load_checkpoint()
    assert trainer2.steps == 1
    # params actually restored (differ from the fresh init)
    a = trainer2.params["no_obj_ptr"]
    b = trainer.params["no_obj_ptr"]
    assert np.allclose(np.asarray(a), np.asarray(b))


def test_correction_clicks_on_tracked_frame(tiny128_cfg, tiny128_params):
    """frames_to_add_correction_pt applies iterative clicks on a NON-init
    frame (reference model/sam2.py:255-265, 405-447): that frame's output
    list grows by num_correction_clicks supervised steps."""
    import functools

    from sam2_opt_tpu.training import sam2_train

    cfg = tiny128_cfg
    T = 2
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.random((T, 128, 128, 3)), jnp.float32)
    gt = np.zeros((T, 1, 128, 128), bool)
    gt[:, :, 30:90, 40:100] = True

    def fwd(correct_frames):
        return jax.jit(functools.partial(
            sam2_train.forward_tracking, tiny128_params, cfg,
            num_init_cond_frames=1, num_correction_clicks=2,
            frames_to_add_correction_pt=correct_frames, use_remat=False,
        ))(images, jnp.asarray(gt), jax.random.PRNGKey(0))

    masks, ious, scores, _ = fwd((1,))
    assert len(masks) == T
    assert len(masks[0]) == 3  # init frame: first step + 2 corrections
    assert len(masks[1]) == 3  # tracked frame in the correction list
    assert all(np.isfinite(np.asarray(i)).all() for i in ious[1])

    # control: without the correction list the tracked frame has ONE step
    masks2, *_ = fwd(())
    assert len(masks2[1]) == 1


def test_obj_valid_padded_slot_is_inert(tiny128_cfg, tiny128_params):
    """VERDICT r2 #3: appending a padded object slot (obj_valid=False) leaves
    the training loss unchanged — padded slots are excluded from every loss
    term and from the num_objects normalizer, and never enter memory
    (reference trains only real objects, training/utils/data_utils.py:36-128)."""
    import functools

    from sam2_opt_tpu.training import sam2_train

    cfg = tiny128_cfg
    T = 2
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.random((T, 128, 128, 3)), jnp.float32)
    gt = np.zeros((T, 1, 128, 128), bool)
    gt[:, :, 30:90, 40:100] = True

    # mask-prompt init + no correction clicks -> the rollout consumes no RNG,
    # so the only difference between the two runs is the padded slot
    loss_fn = jax.jit(functools.partial(
        sam2_train.video_train_loss, tiny128_params, cfg,
        use_mask_input=True, num_correction_clicks=0, use_remat=False,
    ))

    l1, aux1 = loss_fn(images, jnp.asarray(gt), jax.random.PRNGKey(0),
                       obj_valid=jnp.asarray([True]))
    gt_padded = np.concatenate([gt, np.zeros_like(gt)], axis=1)
    l2, aux2 = loss_fn(images, jnp.asarray(gt_padded), jax.random.PRNGKey(0),
                       obj_valid=jnp.asarray([True, False]))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for k in aux1:
        np.testing.assert_allclose(float(aux1[k]), float(aux2[k]), rtol=1e-6,
                                   err_msg=k)

    # and a padded slot is NOT free loss reduction: marking it valid changes
    # the normalizer, so the loss must differ
    l3, _ = loss_fn(images, jnp.asarray(gt_padded), jax.random.PRNGKey(0),
                    obj_valid=jnp.asarray([True, True]))
    assert abs(float(l3) - float(l1)) > 1e-6


def test_trainer_with_mesh(tmp_path, tiny128_cfg):
    """Trainer wired to a real mesh (VERDICT r1 #4, r2 #6): batch sharded on
    "data", params under the TP rule with tp=2 — the full VIDEO rollout
    (memory attention + SAM heads) runs under tensor parallelism, not just
    the encode path — 2 steps on a fixed batch with the loss decreasing."""
    from sam2_opt_tpu.parallel import mesh as mesh_lib
    from sam2_opt_tpu.training.trainer import TrainConfig, Trainer

    cfg = tiny128_cfg
    mesh = mesh_lib.make_mesh(dp=2, tp=2, devices=jax.devices("cpu")[:4])
    params = init_params(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(
        num_epochs=1, batch_size=2, num_frames=2, max_num_objects=1,
        checkpoint_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
        num_correction_clicks=0, base_lr=1e-4,
        prob_to_use_pt_input=1.0, prob_to_use_box_input=0.0,
    )
    trainer = Trainer(cfg, params, tcfg, mesh=mesh)
    # params were placed under the TP rule
    shardings = mesh_lib.param_shardings(mesh, trainer.params)
    for leaf, s in zip(
        jax.tree_util.tree_leaves(trainer.params),
        jax.tree_util.tree_leaves(shardings),
    ):
        assert leaf.sharding.is_equivalent_to(s, leaf.ndim)

    rng = np.random.default_rng(5)
    images = (rng.random((2, 2, 128, 128, 3)) * 255).astype(np.uint8)
    masks = np.zeros((2, 2, 1, 128, 128), bool)
    masks[:, :, :, 30:90, 40:100] = True
    batch = {"images": images, "masks": masks}

    losses = []
    orig_update = trainer.train_epoch
    for _ in range(2):
        avg = trainer.train_epoch(iter([batch]), total_steps=2,
                                  steps_per_epoch=1)
        losses.append(avg)
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[1] < losses[0], f"loss did not decrease: {losses}"


def test_grad_accum_matches_full_batch(tiny128_cfg, tiny128_params):
    """grad_accum_steps=2 must produce the same post-step params as the
    full-batch step on identical data (the knob trades activation memory for
    sequential micro-steps, not semantics). Mask-prompt init + 0 clicks so
    the rollout consumes no RNG and the comparison is exact up to fp
    reduction order."""
    from sam2_opt_tpu.training.optimizer import build_optimizer
    from sam2_opt_tpu.training.trainer import TrainConfig, build_train_step

    cfg = tiny128_cfg
    B, T = 4, 2
    rng = np.random.default_rng(11)
    images = jnp.asarray(rng.random((B, T, 128, 128, 3)), jnp.float32)
    masks = np.zeros((B, T, 1, 128, 128), bool)
    masks[:, :, :, 30:90, 40:100] = True
    masks = jnp.asarray(masks)
    ov = jnp.ones((B, 1), bool)
    key = jax.random.PRNGKey(0)
    lr = jnp.float32(1e-4)

    outs = {}
    for accum in (1, 2):
        params = jax.tree_util.tree_map(jnp.copy, tiny128_params)
        tcfg = TrainConfig(
            batch_size=B, num_frames=T, num_correction_clicks=0,
            grad_accum_steps=accum, remat="none",
        )
        optimizer = build_optimizer(params, trunk_depth=cfg.trunk.depth)
        step = build_train_step(cfg, tcfg, optimizer, use_mask=True)
        new_params, _, metrics = step(
            params, optimizer.init(params), images, masks, ov, key, lr
        )
        outs[accum] = (metrics["loss"], new_params)

    np.testing.assert_allclose(
        float(outs[1][0]), float(outs[2][0]), rtol=1e-5
    )
    flat1 = jax.tree_util.tree_leaves(outs[1][1])
    flat2 = jax.tree_util.tree_leaves(outs[2][1])
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-7
        )


def test_grad_accum_indivisible_batch_raises(tiny128_cfg, tiny128_params):
    """A batch size not divisible by grad_accum_steps must fail loudly at
    trace time — a silent full-batch fallback would run at accum-times the
    activation memory the user sized for."""
    import pytest

    from sam2_opt_tpu.training.optimizer import build_optimizer
    from sam2_opt_tpu.training.trainer import TrainConfig, build_train_step

    cfg = tiny128_cfg
    B, T = 3, 2
    rng = np.random.default_rng(13)
    images = jnp.asarray(rng.random((B, T, 128, 128, 3)), jnp.float32)
    masks = jnp.zeros((B, T, 1, 128, 128), bool)
    ov = jnp.ones((B, 1), bool)
    tcfg = TrainConfig(batch_size=B, num_frames=T, num_correction_clicks=0,
                       grad_accum_steps=2, remat="none")
    params = tiny128_params
    optimizer = build_optimizer(params, trunk_depth=cfg.trunk.depth)
    step = build_train_step(cfg, tcfg, optimizer, use_mask=True)
    with pytest.raises(ValueError, match="grad_accum_steps"):
        step(params, optimizer.init(params), images, masks, ov,
             jax.random.PRNGKey(0), jnp.float32(1e-4))


def test_remat_blocks_matches_encoder_remat(tiny128_cfg, tiny128_params):
    """remat="blocks" (per-trunk-block jax.checkpoint, the b+ @1024² memory
    knob) changes scheduling only — loss and gradients match the default
    encoder-remat step on the same data/key."""
    from sam2_opt_tpu.training.optimizer import build_optimizer
    from sam2_opt_tpu.training.trainer import TrainConfig, build_train_step

    cfg = tiny128_cfg
    B, T = 2, 2
    rng = np.random.default_rng(13)
    images = jnp.asarray(rng.random((B, T, 128, 128, 3)), jnp.float32)
    masks = np.zeros((B, T, 1, 128, 128), bool)
    masks[:, :, :, 20:80, 50:110] = True
    masks = jnp.asarray(masks)
    ov = jnp.ones((B, 1), bool)
    key = jax.random.PRNGKey(1)
    lr = jnp.float32(1e-4)

    outs = {}
    for remat in ("encoder", "blocks"):
        params = jax.tree_util.tree_map(jnp.copy, tiny128_params)
        tcfg = TrainConfig(
            batch_size=B, num_frames=T, num_correction_clicks=1, remat=remat,
        )
        optimizer = build_optimizer(params, trunk_depth=cfg.trunk.depth)
        step = build_train_step(cfg, tcfg, optimizer)
        new_params, _, metrics = step(
            params, optimizer.init(params), images, masks, ov, key, lr
        )
        outs[remat] = (metrics["loss"], new_params)

    np.testing.assert_allclose(
        float(outs["encoder"][0]), float(outs["blocks"][0]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(outs["encoder"][1]),
        jax.tree_util.tree_leaves(outs["blocks"][1]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-7
        )


def test_compute_dtype_bfloat16_mixed_precision(tiny128_cfg, tiny128_params):
    """compute_dtype="bfloat16" (the reference MOSE recipe's `amp: bfloat16`)
    runs the rollout in bf16 while master weights stay fp32 and the loss math
    is pinned to fp32 (losses.py): the post-step params must remain fp32,
    must have MOVED, and the loss must agree with the fp32 step to bf16
    rounding tolerance."""
    from sam2_opt_tpu.training.optimizer import build_optimizer
    from sam2_opt_tpu.training.trainer import TrainConfig, build_train_step

    cfg = tiny128_cfg
    B, T = 2, 2
    rng = np.random.default_rng(17)
    images = jnp.asarray(rng.random((B, T, 128, 128, 3)), jnp.float32)
    masks = np.zeros((B, T, 1, 128, 128), bool)
    masks[:, :, :, 20:80, 50:110] = True
    masks = jnp.asarray(masks)
    ov = jnp.ones((B, 1), bool)
    key = jax.random.PRNGKey(2)
    lr = jnp.float32(1e-4)

    outs = {}
    for dt in ("float32", "bfloat16"):
        params = jax.tree_util.tree_map(jnp.copy, tiny128_params)
        tcfg = TrainConfig(
            batch_size=B, num_frames=T, num_correction_clicks=1,
            compute_dtype=dt,
        )
        optimizer = build_optimizer(params, trunk_depth=cfg.trunk.depth)
        step = build_train_step(cfg, tcfg, optimizer)
        new_params, _, metrics = step(
            params, optimizer.init(params), images, masks, ov, key, lr
        )
        outs[dt] = (float(metrics["loss"]), new_params)

    l32, p32 = outs["float32"]
    l16, p16 = outs["bfloat16"]
    assert np.isfinite(l16)
    # bf16 rollout rounding shifts the loss a little, not qualitatively
    assert abs(l16 - l32) / max(abs(l32), 1e-6) < 0.1, (l16, l32)
    moved = False
    for a, b in zip(jax.tree_util.tree_leaves(tiny128_params),
                    jax.tree_util.tree_leaves(p16)):
        # master weights stay in the original (fp32) dtype under bf16 compute
        assert b.dtype == a.dtype
        assert np.isfinite(np.asarray(b)).all()
        moved = moved or not np.array_equal(np.asarray(a), np.asarray(b))
    assert moved, "bf16 step did not update the params"


def test_comms_dtype_bfloat16_matches_plain_bf16_step(tiny128_cfg,
                                                      tiny128_params):
    """comms_dtype="bfloat16" (the reference DDP comms-compression hook,
    trainer.py:300-311) owns the gradient reduction via shard_map: local
    per-shard grads are rounded to bf16, pmean'd across the data axis (the
    bf16 all-reduce), and upcast for the fp32 optimizer. On the 8-shard
    mesh with an rng-independent loss (mask input, no clicks) this must
    agree with the plain bf16 step up to bf16 reduction rounding. Also
    checks the incompatible-config errors raise."""
    import pytest

    from sam2_opt_tpu.parallel import mesh as mesh_lib
    from sam2_opt_tpu.training.optimizer import build_optimizer
    from sam2_opt_tpu.training.trainer import TrainConfig, build_train_step

    cfg = tiny128_cfg
    mesh = mesh_lib.make_mesh(dp=8, tp=1)
    B, T = 8, 2
    rng = np.random.default_rng(23)
    images = mesh_lib.put_global_batch(
        mesh, np.asarray(rng.random((B, T, 128, 128, 3)), np.float32))
    masks_np = np.zeros((B, T, 1, 128, 128), bool)
    masks_np[:, :, :, 20:80, 50:110] = True
    masks = mesh_lib.put_global_batch(mesh, masks_np)
    ov = mesh_lib.put_global_batch(mesh, np.ones((B, 1), bool))
    key = jax.random.PRNGKey(3)
    lr = jnp.float32(1e-4)

    class _PassthroughOpt:
        """updates = -grads, so (params_before - params_after) IS the
        reduced gradient: comparing raw gradients avoids Adam's sign-like
        normalization, where a near-zero grad flipped by bf16 rounding
        legitimately moves a param by a full +-lr (observed flake)."""

        def init(self, params):
            return ()

        def update(self, grads, state, params, lr):
            return jax.tree_util.tree_map(lambda g: -g, grads), state

    outs = {}
    for comms in (None, "bfloat16"):
        params = mesh_lib.shard_params(
            mesh, jax.tree_util.tree_map(jnp.copy, tiny128_params))
        tcfg = TrainConfig(
            batch_size=B, num_frames=T, num_correction_clicks=0,
            compute_dtype="bfloat16", comms_dtype=comms,
        )
        opt = _PassthroughOpt()
        step = build_train_step(cfg, tcfg, opt, mesh=mesh, use_mask=True)
        new_params, _, metrics = step(
            params, opt.init(params), images, masks, ov, key, lr
        )
        grads = jax.tree_util.tree_map(
            lambda p0, p1: np.asarray(p0, np.float64) -
                           np.asarray(p1, np.float64),
            tiny128_params, new_params)
        outs[comms] = (float(metrics["loss"]), grads)

    l_plain, g_plain = outs[None]
    l_comms, g_comms = outs["bfloat16"]
    # identical data, rng-free loss: only the gradient reduction dtype
    # differs (bf16-rounded partials vs f32 accumulation)
    assert abs(l_comms - l_plain) / max(abs(l_plain), 1e-6) < 1e-3
    # global gradient scale: leaves orders of magnitude below it carry
    # bf16-rounding noise, not signal — their relative error is meaningless
    # (observed: a ~1e-7-grad leaf under a ~1e-2 global scale differing
    # ~100% relatively while every significant leaf agreed)
    gmax = max(float(np.abs(x).max())
               for x in jax.tree_util.tree_leaves(g_plain))
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_comms)):
        # bf16 rounding of the reduced partials is ~0.4% relative; a
        # missing/incorrect pmean would be off 8x on significant leaves
        gscale = float(np.abs(a).max()) + 1e-30
        np.testing.assert_allclose(
            a, b, rtol=0.05, atol=0.02 * gscale + 1e-4 * gmax)

    opt = build_optimizer(tiny128_params, trunk_depth=cfg.trunk.depth)
    with pytest.raises(ValueError, match="comms_dtype"):
        build_train_step(
            cfg, TrainConfig(compute_dtype="float32",
                             comms_dtype="bfloat16"), opt)
    with pytest.raises(ValueError, match="data-parallel mesh"):
        build_train_step(
            cfg, TrainConfig(compute_dtype="bfloat16",
                             comms_dtype="bfloat16"), opt)


def test_coco_rle_roundtrip():
    from sam2_opt_tpu.training.data import decode_coco_rle, encode_coco_rle

    rng = np.random.default_rng(0)
    for shape in [(7, 5), (64, 48), (33, 33)]:
        mask = rng.random(shape) > 0.6
        rle = encode_coco_rle(mask)
        assert isinstance(rle["counts"], str)
        out = decode_coco_rle(rle)
        assert out.shape == shape
        assert (out == mask).all()
    # uncompressed list counts also decode (column-major, bg first)
    m = decode_coco_rle({"size": [2, 2], "counts": [1, 2, 1]})
    assert (m == np.array([[False, True], [True, False]])).all()
    # all-empty and all-full
    assert not decode_coco_rle(encode_coco_rle(np.zeros((4, 4), bool))).any()
    assert decode_coco_rle(encode_coco_rle(np.ones((4, 4), bool))).all()


def _make_sav_tree(tmp_path, num_frames=8, size=48, json_manifest=False):
    """Synthetic SA-V tree: 24fps JPEGs + 6fps annotations (every 4th frame)
    as either per-object PNG dirs or a JSON/RLE manifest."""
    import json as _json

    from PIL import Image

    from sam2_opt_tpu.training.data import encode_coco_rle

    root = tmp_path / "sav"
    vdir = root / "JPEGImages_24fps" / "sav_000001"
    os.makedirs(vdir)
    rng = np.random.default_rng(1)
    for t in range(num_frames):
        img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(vdir / f"{t:05d}.jpg")

    def obj_mask(obj, t):
        m = np.zeros((size, size), bool)
        m[8 * (obj + 1) : 8 * (obj + 2) + t, 4:40] = True
        return m

    ann_frames = [t for t in range(num_frames) if t % 4 == 0]
    if json_manifest:
        masklet = [
            [encode_coco_rle(obj_mask(o, t)) for o in range(2)]
            for t in ann_frames
        ]
        with open(root / "sav_000001.json", "w") as f:
            _json.dump({"masklet": masklet, "fps": 6}, f)
    else:
        for o in range(2):
            for t in ann_frames:
                d = root / "Annotations_6fps" / "sav_000001" / f"{o:03d}"
                os.makedirs(d, exist_ok=True)
                Image.fromarray(
                    obj_mask(o, t).astype(np.uint8) * 255
                ).save(d / f"{t:05d}.png")
    return str(root)


@pytest.mark.parametrize("json_manifest", [False, True])
def test_sav_dataset_loads_annotations(tmp_path, json_manifest):
    """SAVRawDataset must yield videos WITH per-object supervision, from
    both the per-object PNG tree and the JSON/RLE manifest (VERDICT r1 #5)."""
    from sam2_opt_tpu.training.data import SAVRawDataset, VOSDataset

    root = _make_sav_tree(tmp_path, json_manifest=json_manifest)
    raw = SAVRawDataset(root)
    assert len(raw) == 1
    video = raw.get_video(0)
    assert len(video.frames) == 2  # only annotated (every 4th) frames
    assert video.frame_ids == [0, 4]
    assert video.segment_loader is not None

    ds = VOSDataset(raw, RandomUniformSampler(num_frames=2), image_size=48,
                    max_num_objects=3, hflip_prob=0.0)
    sample = ds[0]
    assert sample["masks"].shape == (2, 3, 48, 48)
    assert sample["obj_valid"][:2].all() and not sample["obj_valid"][2]
    # supervision is non-empty and object-distinct
    assert sample["masks"][0, 0].any() and sample["masks"][0, 1].any()
    assert (sample["masks"][0, 0] != sample["masks"][0, 1]).any()


def test_video_augmentations_consistency():
    """Augs draw once per video: mask flips follow image flips; color jitter
    never touches masks; shapes preserved."""
    from sam2_opt_tpu.training.data import VideoAugmentations

    rng = np.random.default_rng(2)
    images = (rng.random((3, 32, 32, 3)) * 255).astype(np.uint8)
    masks = np.zeros((3, 2, 32, 32), bool)
    masks[:, 0, :, :16] = True

    aug = VideoAugmentations(hflip_prob=1.0, color_jitter_prob=1.0,
                             grayscale_prob=0.0, affine_prob=0.0)
    out_img, out_masks = aug(images, masks, random.Random(0))
    assert out_img.shape == images.shape and out_img.dtype == np.uint8
    assert out_masks[:, 0, :, 16:].all() and not out_masks[:, 0, :, :16].any()

    aug2 = VideoAugmentations(hflip_prob=0.0, color_jitter_prob=0.0,
                              grayscale_prob=1.0, affine_prob=0.0)
    g_img, g_masks = aug2(images, masks, random.Random(0))
    assert (g_img[..., 0] == g_img[..., 1]).all()
    assert (g_masks == masks).all()

    aug3 = VideoAugmentations(hflip_prob=0.0, color_jitter_prob=0.0,
                              grayscale_prob=0.0, affine_prob=1.0)
    a_img, a_masks = aug3(images, masks, random.Random(0))
    assert a_img.shape == images.shape and a_masks.shape == masks.shape


def test_mosaic_augmentation():
    """Mosaic (reference RandomMosaicVideoAPI, transforms.py:498-560): frame
    becomes a grid of downscaled self-copies; masks survive only in the
    target cell; one parameter draw per video (VERDICT r2 #8)."""
    from sam2_opt_tpu.training.data import VideoAugmentations

    rng_np = np.random.default_rng(4)
    images = (rng_np.random((2, 64, 64, 3)) * 255).astype(np.uint8)
    masks = np.zeros((2, 1, 64, 64), bool)
    masks[:, 0, 8:56, 8:56] = True

    aug = VideoAugmentations(
        hflip_prob=0.0, color_jitter_prob=0.0, grayscale_prob=0.0,
        affine_prob=0.0, mosaic_prob=1.0, mosaic_grid=2,
    )
    out_img, out_masks = aug(images, masks, random.Random(0))
    assert out_img.shape == images.shape and out_masks.shape == masks.shape
    # the mask lives in exactly one 32x32 cell
    cells = [
        out_masks[0, 0, y : y + 32, x : x + 32].any()
        for y in (0, 32) for x in (0, 32)
    ]
    assert sum(cells) == 1, cells
    # every image cell is a downscaled copy of the frame (same for all cells)
    q = [out_img[0, y : y + 32, x : x + 32] for y in (0, 32) for x in (0, 32)]
    assert all((qi == q[0]).all() for qi in q[1:])
    # mask shrinks by ~4x in area (downscaled into one cell)
    ratio = out_masks[0, 0].sum() / masks[0, 0].sum()
    assert 0.15 < ratio < 0.35, ratio


def test_affine_zero_area_retry():
    """Affine applies by default (MOSE recipe) but must not wipe out the
    first-frame target: with a tiny corner mask and extreme params the retry
    loop either keeps a non-empty mask or skips the transform
    (reference RandomAffine tentatives, transforms.py:344-358)."""
    from sam2_opt_tpu.training.data import VideoAugmentations

    rng_np = np.random.default_rng(5)
    images = (rng_np.random((2, 64, 64, 3)) * 255).astype(np.uint8)
    masks = np.zeros((2, 1, 64, 64), bool)
    masks[:, 0, 0:3, 61:64] = True  # corner sliver: rotations often lose it

    aug = VideoAugmentations(
        hflip_prob=0.0, color_jitter_prob=0.0, grayscale_prob=0.0,
        affine_prob=1.0, degrees=45.0, shear=30.0,
    )
    for seed in range(8):
        _, out_masks = aug(images, masks, random.Random(seed))
        assert out_masks[0].any(), f"seed {seed}: first-frame mask wiped out"


def test_affine_retry_is_per_object():
    """The zero-area retry must protect EVERY object's first-frame mask, not
    just some object: a big centered object surviving may not mask the loss
    of a corner-sliver neighbor (reference RandomAffine retries when ANY
    object's frame-0 mask empties, transforms.py:344-358)."""
    from sam2_opt_tpu.training.data import VideoAugmentations

    rng_np = np.random.default_rng(6)
    images = (rng_np.random((2, 64, 64, 3)) * 255).astype(np.uint8)
    masks = np.zeros((2, 2, 64, 64), bool)
    masks[:, 0, 24:40, 24:40] = True   # robust centered object
    masks[:, 1, 0:2, 62:64] = True     # corner sliver: rotations often lose it

    aug = VideoAugmentations(
        hflip_prob=0.0, color_jitter_prob=0.0, grayscale_prob=0.0,
        affine_prob=1.0, degrees=45.0, shear=30.0,
    )
    for seed in range(12):
        _, out_masks = aug(images, masks, random.Random(seed))
        for j in range(2):
            assert out_masks[0, j].any(), (
                f"seed {seed}: object {j} first-frame mask wiped out"
            )


def test_vos_dataset_multiplier(tmp_path):
    img_root, gt_root = _make_davis_dataset(tmp_path)
    raw = PNGRawDataset(img_root, gt_root)
    ds = VOSDataset(raw, RandomUniformSampler(num_frames=2), image_size=64,
                    max_num_objects=1, hflip_prob=0.0, multiplier=3)
    assert len(ds) == 3 * len(raw)
    assert ds[len(raw)]["images"].shape == (2, 64, 64, 3)


def test_sav_frame_extraction(tmp_path):
    """scripts/sav_frame_extraction.py: mp4 -> per-video 05d.jpg frames
    (reference training/scripts/sav_frame_extraction_submitit.py)."""
    import sys

    import cv2

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from sav_frame_extraction import extract_one

    vid = str(tmp_path / "sav_test.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 24, (32, 32))
    rng = np.random.default_rng(0)
    for _ in range(6):
        w.write((rng.random((32, 32, 3)) * 255).astype(np.uint8))
    w.release()

    n = extract_one((vid, str(tmp_path / "out"), 2))
    out_dir = tmp_path / "out" / "JPEGImages_24fps" / "sav_test"
    names = sorted(os.listdir(out_dir))
    assert n == 3 and names == ["00000.jpg", "00002.jpg", "00004.jpg"]


def test_mixed_dataset_loader(tmp_path):
    """TorchTrainMixedDataset: probability-weighted batch interleaving with
    phase chunking; every batch comes from exactly one dataset and all
    batches are eventually yielded (reference sam2_datasets.py:70-170)."""
    from sam2_opt_tpu.training.data import TorchTrainMixedDataset

    img1, gt1 = _make_davis_dataset(tmp_path / "a", num_videos=4, size=32)
    img2, gt2 = _make_davis_dataset(tmp_path / "b", num_videos=2, size=48)
    ds1 = VOSDataset(PNGRawDataset(img1, gt1), RandomUniformSampler(2),
                     image_size=32, max_num_objects=1, hflip_prob=0.0)
    ds2 = VOSDataset(PNGRawDataset(img2, gt2), RandomUniformSampler(2),
                     image_size=48, max_num_objects=1, hflip_prob=0.0)
    mix = TorchTrainMixedDataset([ds1, ds2], batch_sizes=[2, 1])
    assert mix.dataset_prob == [0.5, 0.5]  # 2 batches each
    batches = list(mix.get_loader(epoch=0))
    assert len(batches) == 4
    sizes = sorted(b["images"].shape[1:4] for b in batches)
    # two 32px batches of B=2 and two 48px batches of B=1
    assert sum(1 for b in batches if b["images"].shape[-2] == 32) == 2
    assert sum(1 for b in batches if b["images"].shape[0] == 1) == 2

    # phase chunking: with 2 phases, each epoch covers half of each dataset
    mix2 = TorchTrainMixedDataset([ds1], batch_sizes=[1], phases_per_epoch=2)
    b0 = list(mix2.get_loader(epoch=0))
    b1 = list(mix2.get_loader(epoch=1))
    assert len(b0) == 2 and len(b1) == 2


def test_error_click_fallback_is_negative_background():
    """When the prediction exactly matches GT, the reference samples a
    NEGATIVE click from the BACKGROUND (sam2_utils.py:236-242) — a positive
    fallback would supervise 'positive click -> empty/unchanged mask'."""
    import jax
    import jax.numpy as jnp

    from sam2_opt_tpu.training.sam2_train import sample_random_points_from_errors

    H = W = 16
    gt = np.zeros((1, 1, H, W), bool)
    gt[0, 0, 4:8, 4:8] = True
    gt = jnp.asarray(gt)

    # exact match -> negative background click
    for seed in range(5):
        coords, labels = sample_random_points_from_errors(
            jax.random.PRNGKey(seed), gt, gt
        )
        assert int(labels[0, 0]) == 0, "no-error fallback must be negative"
        x, y = int(coords[0, 0, 0]), int(coords[0, 0, 1])
        assert not bool(gt[0, 0, y, x]), "fallback click must be background"

    # empty GT + empty prediction -> also a negative click
    empty = jnp.zeros((1, 1, H, W), bool)
    _, labels = sample_random_points_from_errors(
        jax.random.PRNGKey(0), empty, empty
    )
    assert int(labels[0, 0]) == 0

    # error regions still drive the labels: FN -> positive, FP -> negative
    pred = jnp.zeros((1, 1, H, W), bool)
    _, labels_fn = sample_random_points_from_errors(
        jax.random.PRNGKey(1), gt, pred
    )
    assert int(labels_fn[0, 0]) == 1
    _, labels_fp = sample_random_points_from_errors(
        jax.random.PRNGKey(2), pred, gt
    )
    assert int(labels_fp[0, 0]) == 0


def test_checkpoint_rollback_gc(tmp_path):
    """Saving step S deletes stale checkpoints with step > S (rolled-back
    timeline), so GC keeps the FRESH saves and resume auto-discovery never
    returns pre-rollback state."""
    from sam2_opt_tpu.training.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), keep=3)
    state = {"w": np.zeros((2,), np.float32)}
    for s in (3000, 4000, 5000):
        mgr.save(s, state)
    assert mgr.all_steps() == [3000, 4000, 5000]

    # rollback: restore 3000, continue training, save 3100
    assert mgr.restore(3000) is not None
    mgr.save(3100, state)
    assert mgr.latest_step() == 3100
    assert all(s <= 3100 for s in mgr.all_steps())
    mgr.save(3200, state)
    assert mgr.latest_step() == 3200


def test_optimizer_matches_mose_recipe(tiny128_cfg, tiny128_params):
    """build_optimizer reproduces the reference MOSE yaml param grouping
    (sam2.1_hiera_b+_MOSE_finetune.yaml:240-278): '*pos_embed*' trains at
    full (vision) lr, image_encoder.* at vision lr = 0.6x base, the
    PositionEmbeddingRandom gaussian matrix is frozen (torch buffer), and
    weight decay excludes exactly biases + LayerNorm weights."""
    from sam2_opt_tpu.training.optimizer import (
        build_optimizer,
        default_weight_decay_mask,
    )

    opt = build_optimizer(tiny128_params,
                          trunk_depth=tiny128_cfg.trunk.depth)
    flat = {}
    import jax as _jax

    from sam2_opt_tpu.utils.misc import keystr_to_dotted

    for path, scale in _jax.tree_util.tree_flatten_with_path(opt.lr_scales)[0]:
        flat[keystr_to_dotted(_jax.tree_util.keystr(path))] = float(scale)

    depth = tiny128_cfg.trunk.depth
    # pos_embed: LLRD override 1.0, times the vision-lr factor
    assert flat["image_encoder.trunk.pos_embed"] == pytest.approx(0.6)
    # deepest trunk block: 0.9 LLRD x 0.6 vision
    last = f"image_encoder.trunk.blocks.{depth-1}.mlp.layers.0.weight"
    assert flat[last] == pytest.approx(0.9 * 0.6)
    # non-encoder params at full base lr
    assert flat["sam_mask_decoder.iou_token.weight"] == pytest.approx(1.0)
    # frozen buffer
    gm = [k for k in flat if "positional_encoding_gaussian_matrix" in k]
    assert gm and all(flat[k] == 0.0 for k in gm)
    # lr schedule ends at base/10 like the reference cosine
    assert opt.lr_at(0.999999) == pytest.approx(5e-6 / 10.0, rel=1e-2)

    mask = {}
    for path, m in _jax.tree_util.tree_flatten_with_path(
        default_weight_decay_mask(tiny128_params)
    )[0]:
        mask[keystr_to_dotted(_jax.tree_util.keystr(path))] = bool(m)
    assert mask["image_encoder.trunk.blocks.0.norm1.weight"] is False  # LN
    assert mask["image_encoder.trunk.blocks.0.attn.qkv.bias"] is False
    assert mask["image_encoder.trunk.blocks.0.attn.qkv.weight"] is True
    assert mask["image_encoder.trunk.pos_embed"] is True        # decayed!
    assert mask["sam_mask_decoder.iou_token.weight"] is True    # decayed!
