"""Multi-device mesh tests on the 8-virtual-CPU platform (conftest.py).

TPU-native counterpart of the reference's DDP/NCCL distributed layer
(reference sam2/training/utils/distributed.py:228-284, trainer.py:291-311):
data parallelism is a "data" mesh axis, tensor parallelism a "model" axis,
and XLA GSPMD inserts the collectives. These tests validate that the sharded
DP+TP train step runs and that DP-sharded inference is numerically identical
to single-device execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam2_opt_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def mesh8():
    devices = jax.devices("cpu")[:8]
    assert len(devices) == 8, "conftest must provide 8 virtual CPU devices"
    return mesh_lib.make_mesh(dp=4, tp=2, devices=devices)


def test_make_mesh_shapes(mesh8):
    assert dict(mesh8.shape) == {"data": 4, "model": 2}
    # default: all devices on data
    m = mesh_lib.make_mesh()
    assert m.shape["data"] * m.shape["model"] == len(jax.devices())


def test_shard_params_places_tp_shards(tiny128_cfg, tiny128_params, mesh8):
    sharded = mesh_lib.shard_params(mesh8, tiny128_params)
    shardings = mesh_lib.param_shardings(mesh8, tiny128_params)
    n_tp = 0
    for s, leaf in zip(
        jax.tree_util.tree_leaves(shardings),
        jax.tree_util.tree_leaves(sharded),
    ):
        assert leaf.sharding.is_equivalent_to(s, leaf.ndim)
        if s.spec != jax.sharding.PartitionSpec():
            n_tp += 1
    assert n_tp > 0, "TP rule matched no parameters — rule is dead"


def test_dp_tp_train_step_runs_and_loss_decreases(tiny128_cfg, mesh8):
    """Full sharded train step on the 4x2 mesh: finite metrics, loss goes down
    over a few steps on a fixed batch (VERDICT round-1 item #1/#4)."""
    from sam2_opt_tpu.models.init import init_params
    from sam2_opt_tpu.training import step as step_lib

    cfg = tiny128_cfg
    params = init_params(cfg, jax.random.PRNGKey(0))
    params = mesh_lib.shard_params(mesh8, params)
    optimizer = step_lib.make_optimizer(learning_rate=1e-3)
    state = step_lib.init_train_state(params, optimizer)
    train_step = step_lib.make_train_step(cfg, optimizer, mesh=mesh8)

    B = mesh8.shape["data"]
    key = jax.random.PRNGKey(1)
    images = jax.device_put(
        jax.random.uniform(key, (B, cfg.image_size, cfg.image_size, 3)),
        mesh_lib.data_sharded(mesh8, 4),
    )
    masks = jnp.zeros((B, 1, cfg.image_size, cfg.image_size), jnp.float32)
    masks = masks.at[:, :, 32:96, 32:96].set(1.0)
    masks = jax.device_put(masks, mesh_lib.data_sharded(mesh8, 4))

    losses = []
    with mesh8:
        for _ in range(3):
            state, metrics = train_step(state, images, masks)
            losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_dp_sharded_encode_matches_single_device(tiny128_cfg, tiny128_params, mesh8):
    """DP-sharded image encode must be numerically identical (fp32, CPU) to the
    unsharded single-device result."""
    from sam2_opt_tpu.models import sam2_base as base

    cfg = tiny128_cfg
    params = tiny128_params
    B = mesh8.shape["data"]
    imgs = jax.random.uniform(
        jax.random.PRNGKey(2), (B, cfg.image_size, cfg.image_size, 3)
    )

    def encode(p, x):
        out = base.forward_image(p, cfg, base.image_normalize(x))
        return out["backbone_fpn"]

    ref = jax.jit(encode)(params, imgs)

    dp_in = mesh_lib.data_sharded(mesh8, 4)
    sharded_fn = jax.jit(encode, in_shardings=(None, dp_in))
    got = sharded_fn(params, jax.device_put(imgs, dp_in))

    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(g), rtol=1e-5, atol=1e-5
        )


def test_tp_sharded_encode_matches_replicated(tiny128_cfg, tiny128_params, mesh8):
    """TP-sharded params (model-axis shards of the big linears) must produce
    the same encode output as fully replicated params."""
    from sam2_opt_tpu.models import sam2_base as base

    cfg = tiny128_cfg
    params = tiny128_params
    imgs = jax.random.uniform(
        jax.random.PRNGKey(3), (2, cfg.image_size, cfg.image_size, 3)
    )

    def encode(p, x):
        out = base.forward_image(p, cfg, base.image_normalize(x))
        return out["backbone_fpn"]

    ref = jax.jit(encode)(params, imgs)

    sharded = mesh_lib.shard_params(mesh8, params)
    with mesh8:
        got = jax.jit(encode)(sharded, imgs)

    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(g), rtol=1e-4, atol=1e-4
        )


def test_image_predictor_on_mesh(tiny128_cfg, tiny128_params, mesh8):
    """SAM2ImagePredictor(mesh=...): DP-sharded batched predict matches the
    single-device predictor (multi-chip SPMD inference, beyond reference
    parity — the reference is single-GPU at inference)."""
    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.image import SAM2ImagePredictor

    cfg = tiny128_cfg
    rng = np.random.default_rng(6)
    images = [
        (rng.random((cfg.image_size, cfg.image_size, 3)) * 255).astype(np.uint8)
        for _ in range(8)
    ]
    coords = [np.array([[40.0, 60.0]], np.float32)] * 8
    labels = [np.array([1], np.int32)] * 8

    ref_p = SAM2ImagePredictor(SAM2Model(tiny128_params, cfg))
    ref_p.set_image_batch(images)
    ref_masks, ref_ious, _ = ref_p.predict_batch(coords, labels)

    mesh_p = SAM2ImagePredictor(
        SAM2Model(jax.tree_util.tree_map(jnp.copy, tiny128_params), cfg),
        mesh=mesh8,
    )
    assert mesh_p.model.mesh is mesh8
    mesh_p.set_image_batch(images)
    # the encoded features are actually sharded over "data"
    embed = mesh_p._features["image_embed"]
    assert not embed.sharding.is_fully_replicated
    got_masks, got_ious, _ = mesh_p.predict_batch(coords, labels)

    for rm, gm, ri, gi in zip(ref_masks, got_masks, ref_ious, got_ious):
        np.testing.assert_allclose(np.asarray(ri), np.asarray(gi),
                                   rtol=1e-4, atol=1e-4)
        agree = (np.asarray(rm) > 0) == (np.asarray(gm) > 0)
        assert agree.mean() > 0.999


def test_video_predictor_object_dp_tp_on_mesh(tiny128_cfg, tiny128_params, mesh8):
    """SAM2VideoPredictor(mesh=...): multi-object tracking with objects
    sharded over the "data" axis and TP-sharded params on the "model" axis
    must match the single-device predictor (multi-chip SPMD video inference,
    beyond reference parity). Exercises the full batched track step — memory
    attention, SAM heads, memory encoder — under DP x TP."""
    from sam2_opt_tpu.models.model import SAM2Model
    from sam2_opt_tpu.predictors.video import SAM2VideoPredictor

    cfg = tiny128_cfg
    rng = np.random.default_rng(7)
    T = 3
    video = (rng.random((T, 96, 128, 3)) * 255).astype(np.uint8)
    # 4 objects = one object per "data" row of the 4x2 mesh
    prompts = {1: [30.0, 40.0], 2: [90.0, 30.0], 3: [60.0, 70.0],
               4: [110.0, 80.0]}

    def run(predictor):
        state = predictor.init_state(video)
        for oid, pt in prompts.items():
            predictor.add_new_points_or_box(
                state, 0, oid, points=np.array([pt], np.float32),
                labels=np.array([1], np.int32),
            )
        out = {}
        for fi, obj_ids, masks in predictor.propagate_in_video(state):
            out[fi] = np.asarray(masks)
        return out

    ref_p = SAM2VideoPredictor(SAM2Model(tiny128_params, cfg),
                               fill_hole_area=0)
    ref = run(ref_p)

    mesh_p = SAM2VideoPredictor(
        SAM2Model(jax.tree_util.tree_map(jnp.copy, tiny128_params), cfg),
        fill_hole_area=0, mesh=mesh8,
    )
    assert mesh_p.model.mesh is mesh8
    # params actually landed TP-sharded
    leaves = jax.tree_util.tree_leaves(mesh_p.model.params)
    assert any(not leaf.sharding.is_fully_replicated for leaf in leaves)
    got = run(mesh_p)

    assert ref.keys() == got.keys()
    for fi in ref:
        assert ref[fi].shape == got[fi].shape  # [4, 1, H, W]
        agree = (ref[fi] > 0) == (got[fi] > 0)
        assert agree.mean() > 0.999, f"frame {fi}: {agree.mean()}"
