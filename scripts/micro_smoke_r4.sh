#!/bin/bash
# Micro end-to-end DiffPhyCon pass on data/smoke_r4, CPU-only (r4 chip
# outage): tiny dim-16 UNet3D joint+w trained for a wall-clock budget, then
# the REAL two-model guided-DDIM eval with on-CPU re-simulation (n=2).
# Purpose: first full data->train->guided-sample->re-simulate row on the
# fixed dataset; de-risks the r5 chip run. PIDs live under /tmp/r4_micro*.pid
# so killguard_r4.sh reaps them before round end.
set -u
cd /root/repo
LOG=/tmp/r4_micro.log
log() { echo "[micro $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

stage() {  # stage <name> <budget_s> <args...>
  local name=$1 budget=$2; shift 2
  log "start $name budget=${budget}s"
  timeout -s TERM --kill-after=60 "$budget" \
    python -u "$@" > "/tmp/r4_micro_${name}.log" 2>&1 &
  echo $! > "/tmp/r4_micro_${name}.pid"
  wait $!; local rc=$?
  rm -f "/tmp/r4_micro_${name}.pid"
  log "end $name rc=$rc"
}

stage joint 2100 apps/train_smoke.py --cpu --dataset_path data/smoke_r4 \
  --train_num_steps 100000 --checkpoint_interval 100 --batch_size 4 \
  --dim 16 --dim_mults 1 2 --results_folder trained_models/smoke/r4micro
stage w 900 apps/train_smoke.py --cpu --dataset_path data/smoke_r4 \
  --is_w_model True --train_num_steps 100000 --checkpoint_interval 100 \
  --batch_size 4 --dim 16 --dim_mults 1 2 \
  --results_folder trained_models/smoke_w/r4micro

CKJ=$(ls trained_models/smoke/r4micro/ckpt 2>/dev/null | sort -n | tail -1)
CKW=$(ls trained_models/smoke_w/r4micro/ckpt 2>/dev/null | sort -n | tail -1)
log "eval with joint ckpt ${CKJ:-none} w ckpt ${CKW:-none}"
if [ -n "${CKJ:-}" ] && [ -n "${CKW:-}" ]; then
  stage eval 2400 apps/infer_smoke.py --cpu --dataset_path data/smoke_r4 \
    --n_test_samples 2 --batch_size 2 --dim 16 --dim_mults 1 2 \
    --joint_folder trained_models/smoke/r4micro \
    --w_folder trained_models/smoke_w/r4micro \
    --diffusion_joint_checkpoint "$CKJ" --diffusion_w_checkpoint "$CKW" \
    --calibrate False --solver_accuracy 1e-4
fi
log "micro chain done"
