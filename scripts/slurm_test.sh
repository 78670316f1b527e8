#!/usr/bin/env bash
# Slurm eval launcher (counterpart of reference detection/slurm_test.sh).
#   Usage: slurm_test.sh PARTITION JOB_NAME CONFIG CKPT [--eval mIoU ...]
set -euo pipefail
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CKPT=$4
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
    python -u "$(dirname "$0")/../test.py" "${CONFIG}" "${CKPT}" "$@"
