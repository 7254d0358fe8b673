#!/usr/bin/env bash
# Multi-host TPU pod launcher — the TPU-native equivalent of the reference's
# SLURM sbatch scripts (ref: scripts/sbatch_train_*.sh: MASTER_ADDR discovery
# + srun). On Cloud TPU pods, every host runs the same command; JAX discovers
# the topology from the TPU runtime, so no rendezvous plumbing is needed
# (jax.distributed.initialize() is called by main.py when coordinates exist).
#
# Usage:
#   ./scripts/launch_tpu_pod.sh <tpu-name> <zone> <config> [extra cfg overrides]
# Example:
#   ./scripts/launch_tpu_pod.sh sync-v5e-64 us-west4-1 \
#       synchformer_tpu/config/configs/sync.yaml data.vids_path=gs://bucket/vggsound
set -euo pipefail

TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
CONFIG=${3:?config yaml}
shift 3
OVERRIDES="$*"

REPO_DIR=$(cd "$(dirname "$0")/.." && pwd)

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all --command "
  cd $REPO_DIR &&
  make -C native/avstage &&
  python main.py config=$CONFIG $OVERRIDES
"
