#!/bin/bash
# Artifact-only ops loop: the eval_tune_eval pipeline with NO model zoo,
# checkpoint format, or flax code in the serving container — everything
# runs off one frozen export directory (segma-tpu export output).
#
#   1. predict the dev/val split off the artifact, dumping tuner logits
#   2. grid-search per-label thresholds on those dumps
#   3. re-predict each test dataset with the tuned thresholds
#   4. evaluate against ground truth
#
# The only config needed is for tune/evaluate's label list; point --config
# at the artifact's training config (or any config with the same classes).
#
# Usage: scripts/artifact_loop.sh <artifact_dir> <config.yml> \
#            <dev_dataset> <test_dataset>...
set -eu

ART=${1:?usage: artifact_loop.sh <artifact_dir> <config.yml> <dev_ds> <test_ds>...}
CFG=${2:?missing config (label list for tune/evaluate)}
DEV=${3:?missing dev dataset}
shift 3

OUT_ROOT=${ARTIFACT_LOOP_OUT:-$ART/loop}

# 1. predict the dev/val split, dumping logits (artifact path)
python scripts/predict.py --artifact "$ART" --wavs "$DEV/wav" \
  --uris "$DEV/val.txt" --output "$OUT_ROOT/dev_predictions" --save-logits

# 2. tune per-label thresholds on the dev logits
python scripts/tune.py --config "$CFG" --precision 0.1 \
  --val-ds "$DEV" --val-logits "$OUT_ROOT/dev_predictions/logits" \
  --output "$OUT_ROOT/tune"

# 3+4. re-predict each test dataset with the tuned thresholds, evaluate
for TEST in "$@"; do
  NAME=$(basename "$TEST")
  OUT=$OUT_ROOT/test_predictions_$NAME
  python scripts/predict.py --artifact "$ART" --wavs "$TEST/wav" \
    --uris "$TEST/test.txt" \
    --thresholds "$OUT_ROOT/tune/best_thresholds.yml" --output "$OUT"
  python scripts/evaluate.py --gt "$TEST/rttm" --pred "$OUT/raw_rttm" -c "$CFG"
done
