#!/bin/bash
# Full tuned-threshold evaluation loop (role of reference
# scripts/eval_tune_eval.sh): predict on the dev set with logits dumping,
# grid-search per-label thresholds, re-predict the test set(s) with the
# tuned thresholds, evaluate.
#
# Usage: scripts/eval_tune_eval.sh <run_dir> <dev_dataset> <test_dataset>...
set -eu

RUN_DIR=${1:?usage: eval_tune_eval.sh <run_dir> <dev_dataset> <test_dataset>...}
DEV=${2:?missing dev dataset}
shift 2

CFG=$RUN_DIR/config.yml
CKPT=$RUN_DIR/checkpoints/best.ckpt

# 1. predict the dev/val split, dumping logits
python scripts/predict.py --config "$CFG" --wavs "$DEV/wav" \
  --uris "$DEV/val.txt" --checkpoint "$CKPT" \
  --output "$RUN_DIR/dev_predictions" --save-logits

# 2. tune per-label thresholds on the dev logits
python scripts/tune.py --config "$CFG" --precision 0.1 \
  --val-ds "$DEV" --val-logits "$RUN_DIR/dev_predictions/logits" \
  --output "$RUN_DIR/tune"

# 3+4. re-predict each test dataset with the tuned thresholds, evaluate
for TEST in "$@"; do
  NAME=$(basename "$TEST")
  OUT=$RUN_DIR/test_predictions_$NAME
  python scripts/predict.py --config "$CFG" --wavs "$TEST/wav" \
    --uris "$TEST/test.txt" --checkpoint "$CKPT" \
    --thresholds "$RUN_DIR/tune/best_thresholds.yml" --output "$OUT"
  python scripts/evaluate.py --gt "$TEST/rttm" --pred "$OUT/raw_rttm" -c "$CFG"
done
