#!/bin/bash
cd /root/repo
LEG=0
while true; do
  LEG=$((LEG+1))
  python scripts/auto_train.py -c segma_tpu/config/default.yml --run-id chaos --auto-resume --output /tmp/exact_soak \
    model.name=conv_vad 'model.config={hidden: 32, depth: 1}' \
    data.dataset_path=/tmp/verify_data/debug_3 \
    'data.classes=[male,female,key_child,other_child]' \
    train.batch_size=4 train.max_epochs=25 audio.chunk_duration_s=1.0 \
    train.seed=0 train.dataloader.num_workers=1 \
    train.data_cache=device train.dispatch=epoch \
    model.chkp_path=/tmp/exact_soak wandb.offline=true >> /tmp/exact_soak/chaos.log 2>&1 &
  PID=$!
  DELAY=$((20 + RANDOM % 20))
  ( sleep $DELAY; kill -TERM $PID 2>/dev/null ) &
  KILLER=$!
  wait $PID; RC=$?
  kill $KILLER 2>/dev/null; wait $KILLER 2>/dev/null
  echo "leg $LEG delay=$DELAY exit=$RC" >> /tmp/exact_soak/legs.log
  if [ $RC -eq 0 ]; then break; fi
  if [ $LEG -ge 20 ]; then echo "TOO MANY LEGS" >> /tmp/exact_soak/legs.log; break; fi
done
