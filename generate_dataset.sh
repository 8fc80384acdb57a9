#!/bin/bash
# End-to-end dataset ETL (parity with the reference generate_dataset.sh):
#   raw pos/neg mining -> MFA alignment of positives (external binary) ->
#   attach alignments (MFA for positives, stub for negatives) -> stitching.
#
# usage: ./generate_dataset.sh <common voice dataset path> <underscore separated wakeword> <inference sequence> [skip-neg]
set -e

COMMON_VOICE_DATASET_PATH=${1}
DATASET_NAME=${2}       # e.g. hey_fire_fox
INFERENCE_SEQUENCE=${3} # e.g. [0,1,2]

if [ $# -lt 3 ]; then
    printf 1>&2 "usage: ./generate_dataset.sh <common voice dataset path> <underscore separated wakeword> <inference sequence> [skip-neg]\n"
    exit 2
fi
SKIP_NEG_DATASET=${4:-false}

VOCAB="["
IFS='_' read -ra WORDS <<<"${DATASET_NAME}"
for w in "${WORDS[@]}"; do VOCAB+="\"${w}\","; done
VOCAB="${VOCAB::-1}]"
unset IFS

DATASET_FOLDER="datasets"
mkdir -p "${DATASET_FOLDER}"
NEGATIVE_PCT=0
if [ "${SKIP_NEG_DATASET}" != "true" ]; then NEGATIVE_PCT=5; fi

printf ">>> generating raw audio dataset for %s\n" "${VOCAB}"
VOCAB=${VOCAB} INFERENCE_SEQUENCE=${INFERENCE_SEQUENCE} \
    python -m howl_tpu.training.run.generate_raw_audio_dataset \
    -i "${COMMON_VOICE_DATASET_PATH}" -o "${DATASET_FOLDER}" \
    --positive-pct 100 --negative-pct ${NEGATIVE_PCT} --overwrite

POS_DATASET_PATH="${DATASET_FOLDER}/${DATASET_NAME}/positive"
NEG_DATASET_PATH="${DATASET_FOLDER}/${DATASET_NAME}/negative"
POS_DATASET_ALIGNMENT="${POS_DATASET_PATH}/alignment"

if [ -n "${MFA_FOLDER}" ] && [ -d "${MFA_FOLDER}" ]; then
    printf ">>> aligning positive dataset with MFA\n"
    mkdir -p "${POS_DATASET_ALIGNMENT}"
    pushd "${MFA_FOLDER}"
    time yes n | ./bin/mfa_align --verbose --clean --num_jobs 12 \
        "../${POS_DATASET_PATH}/audio" librispeech-lexicon.txt \
        pretrained_models/english.zip "../${POS_DATASET_ALIGNMENT}"
    popd
    printf ">>> attaching MFA alignment to the positive dataset\n"
    VOCAB=${VOCAB} INFERENCE_SEQUENCE=${INFERENCE_SEQUENCE} \
        python -m howl_tpu.training.run.attach_alignment \
        -i "${POS_DATASET_PATH}" --alignment-type mfa \
        --alignments-path "${POS_DATASET_ALIGNMENT}"
else
    printf ">>> MFA_FOLDER not set; attaching stub alignment to the positive dataset\n"
    VOCAB=${VOCAB} INFERENCE_SEQUENCE=${INFERENCE_SEQUENCE} \
        python -m howl_tpu.training.run.attach_alignment \
        -i "${POS_DATASET_PATH}" --alignment-type stub
fi

if [ "${SKIP_NEG_DATASET}" != "true" ]; then
    printf ">>> attaching stub alignment to the negative dataset\n"
    VOCAB=${VOCAB} INFERENCE_SEQUENCE=${INFERENCE_SEQUENCE} \
        python -m howl_tpu.training.run.attach_alignment \
        -i "${NEG_DATASET_PATH}" --alignment-type stub
fi

printf ">>> stitching vocab samples\n"
VOCAB=${VOCAB} INFERENCE_SEQUENCE=${INFERENCE_SEQUENCE} \
    python -m howl_tpu.training.run.stitch_vocab_samples \
    -i "${POS_DATASET_PATH}" --disable-detect-keyword

printf ">>> dataset generation complete: %s\n" "${DATASET_FOLDER}/${DATASET_NAME}"
