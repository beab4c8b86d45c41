#!/bin/bash
# Auto campaign for round 4: waits for the chip, then runs the compressed
# priority queue (smoke joint -> smoke w -> smoke n=16 eval -> burgers 50k
# -> bench), each stage wall-clock-gated against the killguard deadline.
# ONE chip process at a time; every python PID is tracked in /tmp/r4_*.pid
# so killguard_r4.sh can SIGTERM it. SIGTERM-trained stages checkpoint on
# timeout (trainer graceful-SIGTERM, r3).
set -u
cd /root/repo
GUARD_AT=${1:?usage: campaign_r4_auto.sh <guard_epoch_utc>}  # killguard fire time
LOG=/tmp/r4_auto.log
log() { echo "[auto $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

run_stage() {  # run_stage <name> <end_epoch> <app args...>
  local name=$1 end=$2; shift 2
  local now=$(date +%s)
  local budget=$((end - now))
  if [ "$budget" -le 120 ]; then log "skip $name (no budget)"; return 1; fi
  log "start $name budget=${budget}s: $*"
  timeout -s TERM --kill-after=120 "$budget" \
    python -u "$@" > "/tmp/r4_${name}.log" 2>&1 &
  echo $! > "/tmp/r4_${name}.pid"
  wait $!
  local rc=$?
  rm -f "/tmp/r4_${name}.pid"
  log "end $name rc=$rc"
  return $rc
}

# ---- wait for the chip -----------------------------------------------------
while true; do
  now=$(date +%s)
  [ "$now" -ge $((GUARD_AT - 2400)) ] && { log "chip never answered with >40min left; exiting"; exit 1; }
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1 && break
  sleep 120
done
log "CHIP UP at $(date -u)"

# ---- sanity: one tiny jit --------------------------------------------------
timeout 300 python -c "
import jax, jax.numpy as jnp
print(jax.jit(lambda x: (x@x).sum())(jnp.ones((256,256))))" >> "$LOG" 2>&1 || {
  log "sanity jit failed"; exit 1; }

NOW=$(date +%s)
# budgets measured back from guard time
EVAL_END=$((GUARD_AT - 600))      # bench needs ~10 min before guard
BURGERS_END=$((EVAL_END - 1800))  # smoke eval needs ~30 min
W_END=$((BURGERS_END - 1200))     # burgers block ~20 min
JOINT_END=$((W_END - 2100))       # smoke w ~35 min

run_stage smokejoint "$JOINT_END" apps/train_smoke.py \
  --dataset_path data/smoke_r4 --train_num_steps 20000 \
  --checkpoint_interval 500 --batch_size 4 \
  --results_folder trained_models/smoke/r4 --resume True

run_stage smokew "$W_END" apps/train_smoke.py \
  --dataset_path data/smoke_r4 --is_w_model True --train_num_steps 20000 \
  --checkpoint_interval 500 --batch_size 4 \
  --results_folder trained_models/smoke_w/r4 --resume True

# burgers joint 42k->50k then w 45k->50k (fast: ~50 steps/s)
run_stage burgersj "$BURGERS_END" apps/train_burgers.py \
  --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
  --train_num_steps 50000 --checkpoint_interval 1000 --resume True \
  --results_folder trained_models/burgers/r2-40k
run_stage burgersw "$BURGERS_END" apps/train_burgers.py \
  --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
  --is_model_w True --train_num_steps 50000 --checkpoint_interval 1000 \
  --resume True --results_folder trained_models/burgers_w/r2-40k

# smoke eval with the newest checkpoints
CKJ=$(ls trained_models/smoke/r4/ckpt 2>/dev/null | sort -n | tail -1)
CKW=$(ls trained_models/smoke_w/r4/ckpt 2>/dev/null | sort -n | tail -1)
if [ -n "${CKJ:-}" ] && [ -n "${CKW:-}" ]; then
  run_stage smokeeval "$EVAL_END" apps/infer_smoke.py \
    --dataset_path data/smoke_r4 --n_test_samples 16 --batch_size 4 \
    --joint_folder trained_models/smoke/r4 --w_folder trained_models/smoke_w/r4 \
    --diffusion_joint_checkpoint "$CKJ" --diffusion_w_checkpoint "$CKW" \
    --bf16 True --calibrate False
fi

# burgers 50k eval (two-model beta 2.0, the r2/r3 sweep convention)
CKB=$(ls trained_models/burgers/r2-40k/ckpt 2>/dev/null | sort -n | tail -1)
CKBW=$(ls trained_models/burgers_w/r2-40k/ckpt 2>/dev/null | sort -n | tail -1)
if [ -n "${CKB:-}" ]; then
  run_stage burgerseval "$EVAL_END" apps/infer_burgers.py \
    --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
    --exp_id r2-40k --checkpoint "$CKB" \
    --exp_id__model_w r2-40k --checkpoint__model_w "${CKBW:-$CKB}" \
    --eval_two_models True --prior_beta 2.0 --J_scheduler cosine \
    --wus 0 --n_test_samples 50 \
    --save_file burgers_results/r4_ck${CKB}_beta2.0.json
fi

# final bench (killguard will also run one at guard time)
run_stage bench "$((GUARD_AT - 240))" bench.py
log "campaign done"
