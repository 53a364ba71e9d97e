"""Training stack tests: optimizer/LLRD, data pipeline, losses, and an
end-to-end tiny train step with checkpoint save/resume."""

import os

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
