#!/usr/bin/env bash
# Multi-host training launcher (counterpart of the reference dist_train.sh /
# slurm_train.sh). On TPU pods, run this once per host; jax.distributed
# discovers peers from the TPU runtime (or set JAX_COORDINATOR_ADDRESS /
# JAX_PROCESS_ID / JAX_NUM_PROCESSES for manual bootstrap).
set -euo pipefail
CONFIG=$1
shift
python train.py "$CONFIG" --multi-host "$@"
