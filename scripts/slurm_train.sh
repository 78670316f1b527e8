#!/usr/bin/env bash
# Slurm launcher (counterpart of reference detection/slurm_train.sh:15-25).
# One task per host; jax.distributed bootstraps from the Slurm env
# (SLURM_PROCID / SLURM_NTASKS / first node as coordinator).
#
#   GPUS-era knobs map to hosts: HOSTS=<n tasks>, CPUS_PER_TASK as usual.
#   Usage: slurm_train.sh PARTITION JOB_NAME CONFIG WORK_DIR [extra args...]
set -euo pipefail
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
WORK_DIR=$4
HOSTS=${HOSTS:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-16}
SRUN_ARGS=${SRUN_ARGS:-""}
shift 4

PYTHONPATH="$(dirname "$0")/..":${PYTHONPATH:-} \
srun -p "${PARTITION}" \
    --job-name="${JOB_NAME}" \
    --ntasks="${HOSTS}" \
    --ntasks-per-node=1 \
    --cpus-per-task="${CPUS_PER_TASK}" \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u "$(dirname "$0")/../train.py" "${CONFIG}" \
        --work-dir "${WORK_DIR}" --multi-host "$@"
