"""Trainer: the training loop (re-design of sam2/training/trainer.py:141-1113).

One compiled pjit step per iteration (forward-tracking rollout + loss + grads
+ optimizer update), data-parallel over a jax mesh, with:

- meters (loss / data-time / step-time / device memory) and TensorBoard
  logging (rank-0), matching the reference meter set (trainer.py:703-880);
- atomic orbax checkpoints with resume auto-discovery
  (reference trainer.py:344-445);
- loss-NaN hard failure (reference train_epoch);
- val loop (reference run_val :553-581).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sam2_opt_tpu.config import SAM2Config
from sam2_opt_tpu.training import sam2_train
from sam2_opt_tpu.training.checkpoints import CheckpointManager
from sam2_opt_tpu.training.meters import (
    AverageMeter,
    DurationMeter,
    MemMeter,
    Phase,
    ProgressMeter,
)
from sam2_opt_tpu.training.optimizer import ScheduledOptimizer, build_optimizer


@dataclasses.dataclass
class TrainConfig:
    """Trainer knobs (reference OptimConf/CheckpointConf/LoggingConf,
    trainer.py:73-140)."""

    num_epochs: int = 1
    batch_size: int = 1
    num_frames: int = 4
    max_num_objects: int = 1
    base_lr: float = 5e-6
    weight_decay: float = 0.1
    grad_clip_norm: float = 0.1
    layer_decay: float = 0.9  # reference MOSE yaml layer_decay_value
    num_correction_clicks: int = 1
    # initial-prompt sampling (reference model/sam2.py knobs)
    prob_to_use_pt_input: float = 0.5
    prob_to_use_box_input: float = 0.5
    max_init_cond_frames: int = 1
    # total frames receiving correction clicks (init frames + random tracked
    # frames; reference num_frames_to_correct_for_train, model/sam2.py:36)
    num_frames_to_correct: int = 1
    log_dir: str = "logs"
    checkpoint_dir: str = "checkpoints_train"
    save_freq_epochs: int = 1
    log_scalar_frequency: int = 10
    seed: int = 0
    freeze_image_encoder: bool = False
    # memory knobs for production shapes (hiera-b+ @1024², 8-frame rollouts
    # per the reference MOSE recipe, sam2/training/README.md:68):
    # remat: "none" | "encoder" (checkpoint the whole per-rollout encoder,
    # the historical default) | "blocks" (checkpoint every trunk block —
    # backward recomputes one block at a time; fits b+ @1024² T=8 on one
    # 16 GB v5e chip since the Pallas flash backward) | "blocks_frames"
    # (blocks + per-rollout-frame checkpointing of the track step, for
    # tighter-memory shapes — costs ~20% step time at the MOSE shape)
    remat: str = "encoder"
    # split each global batch into this many sequential micro-batches,
    # accumulating gradients before the single optimizer update (semantics
    # of a grad_accum_steps-times-larger batch at 1/grad_accum_steps the
    # activation memory). Batch size must be divisible by
    # grad_accum_steps * dp for balanced DP accumulation.
    grad_accum_steps: int = 1
    # "bfloat16" = mixed precision: the rollout (encoder, memory attention,
    # SAM heads) computes in bf16 while master weights, loss math
    # (losses.py pins loss terms to fp32), gradients, and the optimizer stay
    # fp32 — the reference MOSE recipe's `amp: bfloat16`
    # (configs/sam2.1_training/sam2.1_hiera_b+_MOSE_finetune.yaml). bf16
    # doubles MXU rate and halves activation memory on TPU.
    compute_dtype: str = "float32"
    # Gradient-collective precision (the reference's DDP comms-compression
    # hook, trainer.py:300-311). Default None keeps fp32 gradient
    # all-reduces — measured fact: even under compute_dtype=bfloat16 the
    # cross-shard gradient reductions run in f32 (tools/inspect_comms_dtype.py),
    # because gradients are assembled in fp32 accumulation. "bfloat16"
    # differentiates with respect to the bf16-cast parameters so each grad
    # leaf IS bf16 at its cross-shard reduction (halving DP gradient
    # traffic), then upcasts to fp32 for accumulation and the optimizer —
    # the same compress-reduce-upcast semantics as the reference hook.
    # Requires compute_dtype="bfloat16".
    comms_dtype: Optional[str] = None


def build_train_step(model_cfg: SAM2Config, tcfg: TrainConfig, optimizer,
                     mesh=None, *, use_box=False, use_mask=False, n_init=1,
                     correct_frames=()):
    """The compiled training step (fwd rollout + bwd + optimizer update).

    Module-level so tests can compile it against abstract
    (jax.eval_shape) params at production shapes without allocating them —
    the Trainer calls this with its live config/optimizer/mesh.

    Honors tcfg.remat ("none"/"encoder"/"blocks"/"blocks_frames" — see
    TrainConfig) and
    tcfg.grad_accum_steps (sequential micro-batches via lax.scan with a
    single optimizer update; micro-batches are STRIDED over the batch axis
    so each DP shard contributes equally to every micro-step).
    """
    cfg = model_cfg
    if tcfg.remat in ("blocks", "blocks_frames"):
        cfg = dataclasses.replace(
            cfg, trunk=dataclasses.replace(cfg.trunk, remat_blocks=True)
        )
    # "blocks" does NOT additionally wrap the whole encoder in an outer
    # jax.checkpoint: nesting one around per-block checkpoints makes the
    # backward recompute every block TWICE (once for the outer remat, once
    # per-block). Measured on-chip at the production shape (b+ @1024 T=8,
    # tools/bench_train_mfu.py): outer+blocks 1909 ms/grad vs blocks-only
    # 1780 ms — exactly one extra encoder forward (130 ms) — while the
    # block-boundary activations the outer checkpoint would discard still
    # fit the 16 GB chip.
    use_remat = tcfg.remat == "encoder"
    # "blocks_frames" additionally checkpoints each frame's track step
    # (memory attention + SAM heads + memory encoder) so the backward
    # recomputes one frame at a time. Round 4 needed this to fit b+ @1024²
    # T=8 on 16 GB; the Pallas flash backward removed the fp32 logit temps
    # that forced it, and plain "blocks" now both FITS and runs 1192 → 977
    # ms/grad at that shape (tools/bench_train_mfu.py grad_noframes) — so
    # "blocks" no longer frame-checkpoints and "blocks_frames" remains the
    # lever for tighter-memory shapes (longer rollouts, more objects).
    remat_frames = tcfg.remat == "blocks_frames"
    frozen_encoder = tcfg.freeze_image_encoder
    accum = max(int(tcfg.grad_accum_steps), 1)
    compute_dtype = jnp.dtype(tcfg.compute_dtype)
    comms_dtype = jnp.dtype(tcfg.comms_dtype) if tcfg.comms_dtype else None
    if comms_dtype is not None and comms_dtype != compute_dtype:
        raise ValueError(
            f"comms_dtype={tcfg.comms_dtype} requires compute_dtype to "
            f"match (got {tcfg.compute_dtype}): the gradient collectives "
            "inherit the dtype the loss is differentiated in"
        )
    from sam2_opt_tpu.models.model import _cast_tree

    def _loss_of_cast_params(params, images, masks, obj_valid, rng):
        """Loss as a function of ALREADY compute-dtype params (so grads wrt
        these params are compute-dtype at their cross-shard reduction —
        the comms_dtype="bfloat16" path differentiates here)."""
        if compute_dtype != jnp.float32:
            images = images.astype(compute_dtype)
        B = images.shape[0]
        keys = jax.random.split(rng, B)

        def one_video(img, msk, valid, key):
            return sam2_train.video_train_loss(
                params, cfg, img, msk, key,
                obj_valid=valid,
                num_correction_clicks=tcfg.num_correction_clicks,
                use_box_input=use_box,
                use_mask_input=use_mask,
                num_init_cond_frames=n_init,
                frames_to_add_correction_pt=correct_frames,
                use_remat=use_remat,
                remat_frames=remat_frames,
            )

        # vmap over the video batch (the reference python-loops videos;
        # vmap compiles ONE batched rollout instead of B copies)
        losses, auxs = jax.vmap(one_video)(images, masks, obj_valid, keys)
        return jnp.mean(losses), {k: jnp.mean(v) for k, v in auxs.items()}

    def loss_fn(params, images, masks, obj_valid, rng):
        if compute_dtype != jnp.float32:
            # mixed precision: bf16 compute params/images; jax transposes
            # the casts into fp32 gradient accumulation automatically
            params = _cast_tree(params, compute_dtype)
        return _loss_of_cast_params(params, images, masks, obj_valid, rng)

    _vg_master = jax.value_and_grad(loss_fn, has_aux=True)
    _vg_cast = jax.value_and_grad(_loss_of_cast_params, has_aux=True)

    if comms_dtype is None:
        grad_fn = _vg_master
    else:
        # Comms compression (the reference DDP hook's compress-reduce-upcast,
        # trainer.py:300-311). Measured fact (tools/inspect_comms_dtype.py):
        # under plain GSPMD the gradient all-reduces are ALWAYS f32 — grads
        # are assembled in fp32 accumulation, and differentiating wrt
        # bf16-cast params does not move the collective either. The only way
        # to reduce in bf16 is to own the reduction: shard_map over the
        # "data" axis computes per-shard local grads with NO automatic
        # collective, rounds them to comms_dtype, pmean's THAT (the bf16
        # all-reduce), and upcasts per-shard for the fp32 optimizer.
        if mesh is None or mesh.shape.get("model", 1) != 1:
            raise ValueError(
                "comms_dtype requires a data-parallel mesh (tp=1): the "
                "explicit bf16 gradient pmean is sharded over 'data' only"
            )
        if accum != 1:
            raise ValueError(
                "comms_dtype with grad_accum_steps>1 is not supported"
            )
        try:
            from jax.experimental.shard_map import shard_map
        except ImportError:  # newer jax
            from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def _local_grads(params, images, masks, obj_valid, rng):
            # per-shard rng (layout-independent: keyed by mesh position)
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            (l, a), g = _vg_cast(_cast_tree(params, compute_dtype),
                                 images, masks, obj_valid, rng)
            g = _cast_tree(g, comms_dtype)   # bf16 leaves at the reduction
            g = jax.lax.pmean(g, "data")     # <- the bf16 all-reduce
            l = jax.lax.pmean(l, "data")
            a = jax.tree_util.tree_map(
                lambda v: jax.lax.pmean(v, "data"), a)
            return (l, a), _cast_tree(g, jnp.float32)

        d5 = P("data", None, None, None, None)
        grad_fn = shard_map(
            _local_grads, mesh=mesh,
            in_specs=(P(), d5, d5, P("data", None), P()),
            out_specs=((P(), P()), P()),
            check_rep=False,
        )

    def accum_grads(params, images, masks, obj_valid, rng):
        """Gradient accumulation over `accum` strided micro-batches."""
        B = images.shape[0]
        if accum == 1:
            return grad_fn(params, images, masks, obj_valid, rng)
        if B % accum != 0:
            # fail at trace time rather than silently computing a
            # full-batch gradient at accum-times the activation memory the
            # user sized for
            raise ValueError(
                f"batch size {B} is not divisible by grad_accum_steps "
                f"{accum}; pick a batch size that is a multiple of "
                "grad_accum_steps (times dp for balanced DP accumulation)"
            )
        m = B // accum

        def strided(x):
            # micro-batch a = rows {a, accum+a, ...}: every DP shard of the
            # contiguous "data"-sharded batch axis contributes rows to every
            # micro-batch (a [A, B/A] block reshape would put micro-batch 0
            # entirely on the first devices)
            y = x.reshape((m, accum) + x.shape[1:]).swapaxes(0, 1)
            if mesh is not None and m % mesh.shape["data"] == 0:
                from jax.sharding import NamedSharding, PartitionSpec as P

                y = jax.lax.with_sharding_constraint(
                    y,
                    NamedSharding(
                        mesh, P(None, "data", *([None] * (x.ndim - 1)))
                    ),
                )
            return y

        xs = (strided(images), strided(masks), strided(obj_valid),
              jax.random.split(rng, accum))
        (l0, a0), g0 = jax.eval_shape(
            grad_fn, params, xs[0][0], xs[1][0], xs[2][0], xs[3][0]
        )
        zeros = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), ((l0, a0), g0)
        )

        def body(carry, x):
            (lsum, asum), gsum = carry
            (l, a), g = grad_fn(params, *x)
            return (
                (lsum + l, jax.tree_util.tree_map(jnp.add, asum, a)),
                jax.tree_util.tree_map(jnp.add, gsum, g),
            ), None

        ((lsum, asum), gsum), _ = jax.lax.scan(body, zeros, xs)
        inv = 1.0 / accum
        scale = lambda t: jax.tree_util.tree_map(lambda v: v * inv, t)
        return (lsum * inv, scale(asum)), scale(gsum)

    def step(params, opt_state, images, masks, obj_valid, rng, lr):
        (loss, aux), grads = accum_grads(params, images, masks, obj_valid, rng)
        if frozen_encoder:
            # zero grads so the frozen block doesn't inflate the global
            # clip norm or move adam moments ...
            grads = dict(grads)
            grads["image_encoder"] = jax.tree_util.tree_map(
                jnp.zeros_like, grads["image_encoder"]
            )
        updates, opt_state = optimizer.update(grads, opt_state, params, lr)
        if frozen_encoder:
            # ... AND zero the final updates: add_decayed_weights adds
            # wd*param regardless of grads, which would shrink "frozen"
            # encoder weights every step (reference freezes via
            # requires_grad=False, model/sam2.py:103-105)
            updates = dict(updates)
            updates["image_encoder"] = jax.tree_util.tree_map(
                jnp.zeros_like, updates["image_encoder"]
            )
        import optax

        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, **{k: v for k, v in (aux or {}).items()}}
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))
    # batch sharded over "data"; params/opt_state keep their committed
    # (TP-ruled) placements; XLA all-reduces grads over the mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    data5 = NamedSharding(mesh, P("data", None, None, None, None))
    data2 = NamedSharding(mesh, P("data", None))
    return jax.jit(
        step,
        donate_argnums=(0, 1),
        in_shardings=(None, None, data5, data5, data2, None, None),
    )


class TensorBoardLogger:
    """Rank-0 TensorBoard writer (reference utils/logger.py:27-150);
    degrades to a no-op when tensorboard is unavailable."""

    def __init__(self, log_dir: str, enabled: bool = True):
        self._writer = None
        if not enabled:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            os.makedirs(log_dir, exist_ok=True)
            self._writer = SummaryWriter(log_dir)
        except Exception:
            pass

    def log(self, name: str, value, step: int):
        if self._writer is not None:
            self._writer.add_scalar(name, float(value), step)

    def close(self):
        if self._writer is not None:
            self._writer.close()


class Trainer:
    def __init__(self, model_cfg: SAM2Config, params, train_cfg: TrainConfig,
                 mesh=None):
        self.cfg = model_cfg
        self.tcfg = train_cfg
        self.mesh = mesh
        if mesh is not None:
            # place params on the mesh under the TP rule (DP replicates);
            # XLA inserts the gradient all-reduces DDP provided in the
            # reference (trainer.py:291-311)
            from sam2_opt_tpu.parallel import mesh as mesh_lib

            params = mesh_lib.shard_params(mesh, params)
        self.params = params
        trunk_depth = model_cfg.trunk.depth
        self.optimizer = build_optimizer(
            params,
            base_lr=train_cfg.base_lr,
            weight_decay=train_cfg.weight_decay,
            grad_clip_norm=train_cfg.grad_clip_norm,
            layer_decay=train_cfg.layer_decay,
            trunk_depth=trunk_depth,
        )
        self.opt_state = self.optimizer.init(params)
        self.steps = 0
        self.epoch = 0
        self.best_val_loss = float("inf")
        self.step_losses: list = []  # per-step global-mean losses (host)
        self._rank0 = jax.process_index() == 0
        self.ckpt = CheckpointManager(train_cfg.checkpoint_dir)
        # rank-0 logging, like the reference trainer (trainer.py:703-880)
        self.tb = TensorBoardLogger(train_cfg.log_dir, enabled=self._rank0)
        self._step_fns = {}
        self._correct_frame_pools = {}
        self._batch_rows_cache = {}
        self._rng = jax.random.PRNGKey(train_cfg.seed)
        import random as _random

        self._pyrng = _random.Random(train_cfg.seed)

    # ------------------------------------------------------------------ #

    def _build_step(self, use_box=False, use_mask=False, n_init=1,
                    correct_frames=()):
        return build_train_step(
            self.cfg, self.tcfg, self.optimizer, mesh=self.mesh,
            use_box=use_box, use_mask=use_mask, n_init=n_init,
            correct_frames=correct_frames,
        )

    # ------------------------------------------------------------------ #

    def _place_batch(self, batch, N):
        """Host batch -> device/mesh arrays. Multi-process: the loader's
        `batch_rows` sharding yields only this process's rows; assemble the
        global batch from per-process shards (no `device_put` of host-global
        arrays — reference counterpart: DDP's per-rank input split,
        trainer.py:291-311 + utils/distributed.py:228-284)."""
        images = np.asarray(batch["images"], np.float32) / 255.0
        masks = np.asarray(batch["masks"])
        obj_valid = np.asarray(
            batch.get("obj_valid", np.ones((images.shape[0], N), bool))
        )
        if self.mesh is None:
            return (jnp.asarray(images), jnp.asarray(masks),
                    jnp.asarray(obj_valid))
        from sam2_opt_tpu.parallel import mesh as mesh_lib

        gbs = int(batch.get("global_batch_size", 0))
        if jax.process_count() > 1:
            if not gbs:
                raise ValueError(
                    "multi-process training needs loader batches tagged "
                    "with global_batch_size — pass batch_rows="
                    "process_local_batch_rows(mesh, global_bs) to "
                    "data_loader (see training/train.py)"
                )
        else:
            gbs = gbs or images.shape[0]
        rows = self._batch_rows_cache.get(gbs)
        if rows is None:
            rows = mesh_lib.process_local_batch_rows(self.mesh, gbs)
            self._batch_rows_cache[gbs] = rows
        return tuple(
            mesh_lib.put_global_batch(self.mesh, a, gbs, rows)
            for a in (images, masks, obj_valid)
        )

    def save_checkpoint(self):
        state = {
            "params": self.params,
            "opt_state": self.opt_state,
            "steps": np.asarray(self.steps),
            "epoch": np.asarray(self.epoch),
            "best_val_loss": np.asarray(self.best_val_loss),
        }
        if jax.process_count() > 1:
            # gather shards to identical host state on every process, then
            # let the (collective) orbax save coordinate the actual write —
            # CheckpointManager barriers + rank-0-gates the fs bookkeeping
            from sam2_opt_tpu.parallel.mesh import fetch_global

            state = fetch_global(state)
        self.ckpt.save(self.steps, state)

    def load_checkpoint(self) -> bool:
        """Resume auto-discovery; returns True when resumed."""
        template = {
            "params": self.params,
            "opt_state": self.opt_state,
            "steps": np.asarray(self.steps),
            "epoch": np.asarray(self.epoch),
            "best_val_loss": np.asarray(self.best_val_loss),
        }
        try:
            restored = self.ckpt.restore(target=template)
        except Exception:
            restored = self.ckpt.restore()
        if restored is None:
            return False
        if self.mesh is not None:
            # restore onto the live shardings (device_put of host values
            # cannot target non-addressable devices in multi-process runs,
            # and a bare jnp.asarray would silently drop the mesh placement)
            from sam2_opt_tpu.parallel.mesh import place_like

            self.params = place_like(self.params, restored["params"])
            self.opt_state = place_like(self.opt_state, restored["opt_state"])
        else:
            self.params = jax.tree_util.tree_map(
                jnp.asarray, restored["params"]
            )
            self.opt_state = jax.tree_util.tree_map(
                jnp.asarray, restored["opt_state"]
            )
        self.steps = int(restored["steps"])
        self.epoch = int(restored["epoch"])
        self.best_val_loss = float(restored["best_val_loss"])
        logging.info("resumed from step %d (epoch %d)", self.steps, self.epoch)
        return True

    # ------------------------------------------------------------------ #

    def run(self, train_loader_fn, val_loader_fn=None,
            steps_per_epoch: Optional[int] = None):
        """train_loader_fn(epoch) -> iterator of collated batches.

        `steps_per_epoch` sizes the lr schedule (where = steps/total). When
        not given, the first epoch runs on the warmup-side estimate and the
        count measured from epoch 0 sizes the remaining epochs — without
        this, total_steps would collapse to num_epochs and the un-clamped
        cosine would oscillate every step."""
        self.load_checkpoint()
        total_steps = steps_per_epoch and steps_per_epoch * self.tcfg.num_epochs

        while self.epoch < self.tcfg.num_epochs:
            steps_before = self.steps
            self.train_epoch(
                train_loader_fn(self.epoch), total_steps, steps_per_epoch
            )
            if total_steps is None and self.steps > steps_before:
                measured = self.steps - steps_before
                total_steps = measured * self.tcfg.num_epochs
                logging.info(
                    "steps_per_epoch not given; measured %d from epoch %d "
                    "-> total_steps %d", measured, self.epoch, total_steps,
                )
            if val_loader_fn is not None:
                self.val_epoch(val_loader_fn(self.epoch))
            self.epoch += 1
            if self.epoch % self.tcfg.save_freq_epochs == 0:
                self.save_checkpoint()
        self.save_checkpoint()
        self.tb.close()

    def train_epoch(self, loader, total_steps: Optional[int], steps_per_epoch):
        loss_meter = AverageMeter("loss", fmt=":.4f")
        data_time = AverageMeter("data_s", fmt=":.2f")
        step_time = AverageMeter("step_s", fmt=":.2f")
        mem = MemMeter("mem")
        progress = ProgressMeter(
            steps_per_epoch or 0, [loss_meter, data_time, step_time, mem],
            prefix=f"epoch {self.epoch} ",
        )

        t_data = time.time()
        for batch in loader:
            data_time.update(time.time() - t_data)
            # [B, T, N, S, S] -> per-video [T, N, S, S] handled in loss
            T = batch["images"].shape[1]
            N = batch["masks"].shape[2]
            images, masks, obj_valid = self._place_batch(batch, N)
            self._rng, key = jax.random.split(self._rng)
            if total_steps:
                denom = total_steps
            else:
                # total unknown (epoch 0 with steps_per_epoch=None; run()
                # measures the real length after epoch 0 — except when
                # num_epochs=1, where no later epoch exists to apply it).
                # Assume the epoch is 10x longer than what has been seen so
                # far (floored at 1000 steps): `where` then stays below
                # 1/(10*num_epochs) for the entire unknown-length epoch
                # instead of sweeping the whole cosine, regardless of how
                # many steps it turns out to have. Pass steps_per_epoch for
                # a real schedule on single-epoch runs.
                denom = self.tcfg.num_epochs * max(
                    10 * (self.steps + 1), 1000
                )
            where = min(self.steps / max(denom, 1), 1.0 - 1e-6)
            lr = jnp.asarray(self.optimizer.lr_at(where), jnp.float32)

            # per-step sampling of the initial prompt form (reference
            # prepare_prompt_inputs, model/sam2.py:146-267)
            use_mask = self._pyrng.random() >= self.tcfg.prob_to_use_pt_input
            use_box = (not use_mask) and (
                self._pyrng.random() < self.tcfg.prob_to_use_box_input
            )
            n_init = self._pyrng.randint(1, max(self.tcfg.max_init_cond_frames, 1))
            # extra tracked frames receiving correction clicks (reference
            # frames_to_add_correction_pt, model/sam2.py:255-265); only under
            # point input, like the reference (mask input -> no clicks)
            extra = max(self.tcfg.num_frames_to_correct - n_init, 0)
            correct_frames = ()
            if not use_mask and extra > 0 and T > n_init:
                # Each distinct frame subset is a distinct XLA graph (the
                # rollout unrolls frames statically), so a fresh random
                # subset per step — the reference's behavior — would compile
                # the full fwd+bwd rollout up to C(T-n_init, extra) times.
                # Bound it: draw a small pool of subsets once per shape and
                # cycle through them (documented deviation; the supervision
                # distribution stays uniform over the pooled subsets).
                pool_key = (T, n_init, extra)
                variants = self._correct_frame_pools.get(pool_key)
                if variants is None:
                    pool = list(range(n_init, T))
                    k = min(extra, len(pool))
                    variants = []
                    seen = set()
                    for _ in range(16):
                        c = tuple(sorted(self._pyrng.sample(pool, k)))
                        if c not in seen and len(variants) < 4:
                            seen.add(c)
                            variants.append(c)
                    self._correct_frame_pools[pool_key] = variants
                correct_frames = variants[self._pyrng.randrange(len(variants))]
            skey = (use_box, use_mask, n_init, correct_frames)
            step_fn = self._step_fns.get(skey)
            if step_fn is None:
                step_fn = self._build_step(use_box, use_mask, n_init,
                                           correct_frames)
                if self.mesh is not None and jax.process_count() > 1:
                    # multi-process: serialize rank-0-compiles-first (shared
                    # persistent cache) and barrier all ranks before the
                    # first execution, so the CPU-collective handshake never
                    # races a peer's multi-minute XLA compile (round-4
                    # failure mode; see parallel.mesh.aligned_compile).
                    # `skey` is derived from the shared-seed RNG, so the
                    # barrier tag is identical on every rank.
                    from sam2_opt_tpu.parallel.mesh import aligned_compile

                    step_fn = aligned_compile(
                        step_fn,
                        (self.params, self.opt_state, images, masks,
                         obj_valid, key, lr),
                        tag=f"train_step/{skey!r}",
                    )
                self._step_fns[skey] = step_fn

            t0 = time.time()
            self.params, self.opt_state, metrics = step_fn(
                self.params, self.opt_state, images, masks, obj_valid, key, lr
            )
            loss = float(metrics["loss"])
            step_time.update(time.time() - t0)
            if not np.isfinite(loss):
                raise FloatingPointError(
                    f"Loss is {loss} at step {self.steps} — aborting "
                    "(reference trainer raises on NaN losses)"
                )
            loss_meter.update(loss)
            self.step_losses.append(loss)
            mem.update()
            if self.steps % self.tcfg.log_scalar_frequency == 0:
                self.tb.log("train/loss", loss, self.steps)
                self.tb.log("train/lr", float(lr), self.steps)
                if self._rank0:
                    progress.display(self.steps)
            self.steps += 1
            t_data = time.time()
        return loss_meter.avg

    def _build_val_fn(self):
        """Compiled batched val loss (the reference runs val eagerly per
        sample — unusably slow at 1024²; here it's one vmapped jit graph)."""
        cfg = self.cfg

        def val_loss(params, images, masks, obj_valid, rng):
            keys = jax.random.split(rng, images.shape[0])

            def one(img, msk, valid, key):
                loss, _ = sam2_train.video_train_loss(
                    params, cfg, img, msk, key, obj_valid=valid,
                    num_correction_clicks=0,
                )
                return loss

            return jnp.mean(jax.vmap(one)(images, masks, obj_valid, keys))

        return jax.jit(val_loss)

    def val_epoch(self, loader):
        """Forward-only validation loss (reference val_epoch :583-650)."""
        loss_meter = AverageMeter("val_loss", fmt=":.4f")
        val_fn = self._step_fns.get("val")
        if val_fn is None:
            val_fn = self._build_val_fn()
            self._step_fns["val"] = val_fn
        for batch in loader:
            images = np.asarray(batch["images"], np.float32) / 255.0
            masks = np.asarray(batch["masks"])
            obj_valid = np.asarray(
                batch.get("obj_valid",
                          np.ones((images.shape[0], masks.shape[2]), bool))
            )
            if self.mesh is not None and jax.process_count() > 1:
                # val loaders are not globally sharded (shuffle=False,
                # batch 1): every process evaluates the same replicated
                # batch, matching single-process val numbers exactly
                from sam2_opt_tpu.parallel import mesh as mesh_lib

                images, masks, obj_valid = (
                    mesh_lib.put_replicated(self.mesh, a)
                    for a in (images, masks, obj_valid)
                )
            else:
                images, masks, obj_valid = (
                    jnp.asarray(images), jnp.asarray(masks),
                    jnp.asarray(obj_valid),
                )
            self._rng, key = jax.random.split(self._rng)
            loss_meter.update(
                float(val_fn(self.params, images, masks, obj_valid, key)),
                n=images.shape[0])
        self.tb.log("val/loss", loss_meter.avg, self.steps)
        if loss_meter.avg < self.best_val_loss:
            self.best_val_loss = loss_meter.avg
        return loss_meter.avg
