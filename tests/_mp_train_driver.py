"""Subprocess driver for the multi-process training test.

Launched N times by tests/test_training_multiprocess.py (and by
`__graft_entry__.dryrun_multiprocess`), each launch being one jax process
with 4 virtual CPU devices. Drives training/train.py's REAL `main()` code
path (jax.distributed.initialize via JAX_PROCESS_COUNT, per-process loader
sharding, global-batch assembly, rank-0 checkpointing) and writes the
per-step losses + a global params fingerprint as JSON for the parent to
compare across process layouts (reference counterpart: multi-node DDP,
sam2/training/trainer.py:291-311 + utils/distributed.py:228-284).

Env (set by the parent BEFORE python starts):
  JAX_PLATFORMS=cpu  XLA_FLAGS=--xla_force_host_platform_device_count=4
  JAX_PROCESS_COUNT / JAX_PROCESS_ID / JAX_COORDINATOR_ADDRESS
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img_folder", required=True)
    ap.add_argument("--gt_folder", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--dp", type=int, default=4)
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--image-size", type=int, default=64)
    args = ap.parse_args()

    import jax

    # the axon sitecustomize imports jax before this script runs; force the
    # virtual-CPU platform while no device has been touched (see
    # tests/conftest.py for the same dance)
    jax.config.update("jax_platforms", "cpu")

    from sam2_opt_tpu.training import train

    sys.argv = [
        "train.py",
        "--img_folder", args.img_folder,
        "--gt_folder", args.gt_folder,
        "--variant", "hiera_t",
        "--image-size", str(args.image_size),
        # shallow trunk + 2 memory-attention layers: the multi-process
        # machinery under test (sharded feed, cross-process grads, rank-0
        # ckpt) is depth-independent, and the full-depth fwd+bwd rollout
        # costs minutes of XLA CPU compile per process on the 1-CPU CI box
        "--override", "trunk.stages=(1,1,1,1)",
        "--override", "trunk.global_att_blocks=(2,)",
        "--override", "memory_attention.num_layers=2",
        "--num-epochs", "1",
        "--batch-size", str(args.batch_size),
        "--num-frames", "2",
        "--max-objects", "1",
        "--lr", "1e-4",
        "--dp", str(args.dp),
        "--tp", str(args.tp),
        "--seed", "0",
        "--checkpoint-dir", os.path.join(args.workdir, "ckpt"),
        "--log-dir", os.path.join(args.workdir, "logs"),
    ]
    trainer = train.main()

    from sam2_opt_tpu.parallel.mesh import fetch_global

    params_np = fetch_global(trainer.params)
    leaves = jax.tree_util.tree_leaves(params_np)
    fingerprint = float(sum(abs(x).astype("float64").sum() for x in leaves))
    with open(args.out, "w") as f:
        json.dump(
            {
                "process_index": jax.process_index(),
                "process_count": jax.process_count(),
                "device_count": jax.device_count(),
                "steps": trainer.steps,
                "step_losses": [float(x) for x in trainer.step_losses],
                "params_fingerprint": fingerprint,
            },
            f,
        )


if __name__ == "__main__":
    main()
