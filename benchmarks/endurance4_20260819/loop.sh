#!/bin/bash
# round-4 endurance: requeue loop + SIGTERM preemption injection
cd /root/repo
LEG=0
date +"=== run start %H:%M:%S ===" >> /tmp/endur4/legs.txt
while true; do
  LEG=$((LEG+1))
  date +"=== leg $LEG start %H:%M:%S ===" >> /tmp/endur4/legs.txt
  python scripts/auto_train.py -c segma_tpu/config/default.yml \
    --run-id endurance4 --auto-resume --output /tmp/endur4/models \
    model.name=surgical_hydra model.config.encoder=whisper_base_random \
    data.dataset_path=/tmp/endur4_data/debug_20_noise \
    'data.classes=[male,female,key_child,other_child]' \
    data.dataset_multiplier=5.0 \
    train.batch_size=32 train.max_epochs=122 train.seed=0 \
    train.dataloader.num_workers=1 \
    train.data_cache=device train.dispatch=epoch \
    train.host_rss_limit_gb=8 \
    model.chkp_path=/tmp/endur4/models wandb.offline=true \
    >> /tmp/endur4/train.log 2>&1 &
  PID=$!
  # preemption injector: SIGTERM 100-160 s into the leg (several epochs in)
  DELAY=$((240 + RANDOM % 120))
  ( sleep $DELAY; kill -TERM $PID 2>/dev/null ) &
  KILLER=$!
  wait $PID; RC=$?
  kill $KILLER 2>/dev/null; wait $KILLER 2>/dev/null
  date +"=== leg $LEG exit $RC %H:%M:%S (delay $DELAY) ===" >> /tmp/endur4/legs.txt
  if [ $RC -eq 0 ]; then date +"=== finished %H:%M:%S ===" >> /tmp/endur4/legs.txt; break; fi
  if [ $LEG -ge 40 ]; then echo "TOO MANY LEGS" >> /tmp/endur4/legs.txt; break; fi
done
