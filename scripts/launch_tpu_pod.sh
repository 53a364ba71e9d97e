#!/usr/bin/env bash
# TPU-pod training launcher — the TPU-native replacement for the reference's
# SLURM/submitit path (reference sam2/training/train.py:44-114: submitit sets
# MASTER_ADDR/RANK per process; on a TPU pod every host runs the SAME command
# and jax.distributed discovers the topology from the TPU runtime).
#
# Usage:
#   scripts/launch_tpu_pod.sh TPU_NAME ZONE -- \
#       --img_folder gs://bucket/MOSE/JPEGImages \
#       --gt_folder  gs://bucket/MOSE/Annotations \
#       --variant hiera_b+ --dp -1 --tp 1 [trainer args...]
#
# The script ssh-broadcasts one python invocation to every pod worker via
# `gcloud ... --worker=all`. On Cloud TPU pods jax.distributed.initialize()
# needs NO explicit coordinator (the TPU runtime provides it), so
# JAX_PROCESS_COUNT/JAX_COORDINATOR_ADDRESS are only needed for non-TPU or
# manually-orchestrated fleets — see sam2_opt_tpu/training/train.py:50-58.
#
# Preemption resilience mirrors the reference's submitit-requeue semantics:
# the trainer writes atomic checkpoints and auto-resumes from
# --checkpoint-dir, so re-running this script after a preemption continues
# the run (training/trainer.py resume auto-discovery).
set -euo pipefail

if [[ $# -lt 3 ]]; then
    grep '^#' "$0" | sed 's/^# \{0,1\}//' | head -20
    exit 1
fi

TPU_NAME="$1"; shift
ZONE="$1"; shift
[[ "${1:-}" == "--" ]] && shift

REPO_DIR="${SAM2_TPU_REPO_DIR:-/opt/sam2_opt_tpu}"
PYTHON="${SAM2_TPU_PYTHON:-python3}"

# printf %q re-quotes each trainer arg for the remote shell ($* would let the
# remote side word-split args containing spaces or metacharacters)
TRAIN_ARGS=""
for arg in "$@"; do
    TRAIN_ARGS+=$(printf ' %q' "$arg")
done

exec gcloud compute tpus tpu-vm ssh "$TPU_NAME" \
    --zone="$ZONE" \
    --worker=all \
    --command="cd '$REPO_DIR' && $PYTHON -m sam2_opt_tpu.training.train$TRAIN_ARGS"
