#!/bin/bash
# Predict -> evaluate pipeline (role of reference scripts/run_pred_eval.sh,
# with the flag drift fixed: this calls the real scripts with real flags).
#
# Usage: scripts/run_pred_eval.sh <run_dir> <dataset_dir> [uri_list]
set -eu

RUN_DIR=${1:?usage: run_pred_eval.sh <run_dir> <dataset_dir> [uri_list]}
DATASET=${2:?missing dataset dir}
URIS=${3:-$DATASET/test.txt}
OUT=$RUN_DIR/predictions

python scripts/predict.py \
  --config "$RUN_DIR/config.yml" \
  --wavs "$DATASET/wav" \
  --uris "$URIS" \
  --checkpoint "$RUN_DIR/checkpoints/best.ckpt" \
  --output "$OUT" \
  --save-logits

python scripts/evaluate.py \
  --gt "$DATASET/rttm" \
  --pred "$OUT/raw_rttm" \
  -c "$RUN_DIR/config.yml"
