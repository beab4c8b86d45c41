#!/bin/bash
# Window-D side job: top up the burgers r5-50k pair from 28k/29k to the 30k
# LR-cycle minimum (cosine10000 restarts at 10k/20k/30k; the r3 best row
# J_actual(mse)=0.00278 was AT a 30k minimum) and evaluate there.
#
# ~7 min of warm-cache chip work. Run it ONLY while the campaign's
# smokeeval1 stage is in its cold remote compile (chip + host both idle);
# the one-core host serializes any two active chip processes (PERF.md r5).
set -u
cd /root/repo
LOG=/tmp/r5_auto.log
log() { echo "[b30k $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

log "start b30k top-up"
timeout -s TERM --kill-after=60 600 python -u apps/train_burgers.py \
  --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
  --train_num_steps 30000 --checkpoint_interval 1000 --resume True \
  --results_folder trained_models/burgers/r5-50k \
  > /tmp/r5_b30kj.log 2>&1
log "joint topped up rc=$?"
timeout -s TERM --kill-after=60 400 python -u apps/train_burgers.py \
  --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
  --is_model_w True --train_num_steps 30000 --checkpoint_interval 1000 \
  --resume True --results_folder trained_models/burgers_w/r5-50k \
  > /tmp/r5_b30kw.log 2>&1
log "w topped up rc=$?"
timeout -s TERM --kill-after=60 900 python -u apps/infer_burgers.py \
  --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
  --exp_id r5-50k --checkpoint 30000 \
  --exp_id__model_w r5-50k --checkpoint__model_w 30000 \
  --eval_two_models True --prior_beta 2.0 --J_scheduler cosine \
  --wus 0 --n_test_samples 50 \
  --save_file burgers_results/r5_ck30000_beta2.0.json \
  > /tmp/r5_b30keval.log 2>&1
log "eval rc=$? $(tail -2 /tmp/r5_b30keval.log | head -1)"
