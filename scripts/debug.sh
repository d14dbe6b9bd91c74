#!/bin/bash
# Local debug loop (role of reference scripts/debug.sh): tiny synthetic
# dataset -> short training -> predict -> tune -> evaluate, end to end.
set -eu

OUT=${1:-/tmp/segma_debug}
rm -rf "$OUT"
mkdir -p "$OUT"

python scripts/generate_data.py -n 3 --out "$OUT/data" --seed 0
DS=$OUT/data/debug_3

python scripts/train.py -c segma_tpu/config/default.yml \
  model.name=conv_vad 'model.config={hidden: 32, depth: 1}' \
  data.dataset_path="$DS" 'data.classes=[male,female,key_child,other_child]' \
  train.batch_size=4 train.max_epochs=12 train.lr=0.002 audio.chunk_duration_s=1.0 \
  train.seed=0 model.chkp_path="$OUT/models" wandb.offline=true

RUN_DIR=$(ls -dt "$OUT"/models/*/ | head -1)

bash scripts/run_pred_eval.sh "${RUN_DIR%/}" "$DS"
echo "[log] - debug loop finished OK"
