#!/usr/bin/env bash
# Multi-host evaluation launcher (counterpart of the reference dist_test.sh /
# slurm_test.sh). On TPU pods, run once per host; jax.distributed discovers
# peers from the TPU runtime (or set JAX_COORDINATOR_ADDRESS /
# JAX_PROCESS_ID / JAX_NUM_PROCESSES for manual bootstrap).
set -euo pipefail
CONFIG=$1
CHECKPOINT=$2
shift 2
python test.py "$CONFIG" "$CHECKPOINT" "$@"
