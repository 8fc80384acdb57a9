#!/bin/bash
# Train a wakeword model with an env recipe (parity with the reference train_model.sh).
# usage: ./train_model.sh <env file path> <model type> <workspace path> <dataset1> [dataset2 ...]
set -e

ENV_FILE_PATH=${1}
MODEL_TYPE=${2}
WORKSPACE_PATH=${3}

if [ $# -lt 4 ]; then
    echo 1>&2 "usage: ./train_model.sh <env file path> <model type> <workspace path> <dataset1> <dataset2> ..."
    exit 2
fi

DATASET_ARGUMENT="--dataset-paths"
for DATASET_PATH in "${@:4}"; do
    DATASET_ARGUMENT+=" ${DATASET_PATH}"
done

source "${ENV_FILE_PATH}"

echo ">>> training ${MODEL_TYPE} for ${VOCAB}; workspace: ${WORKSPACE_PATH}"
time python -m howl_tpu.training.run.train --model "${MODEL_TYPE}" \
    --workspace "${WORKSPACE_PATH}" ${DATASET_ARGUMENT} --use-stitched-datasets
