#!/bin/bash
# Auto campaign for round 4 (v2, short-window replan): waits for the chip,
# then runs the priority queue for a LATE recovery — bench first (the round's
# headline artifact; r3's failure was a missing bench number), then the cheap
# burgers 50k block + eval, then pours whatever time remains into the smoke
# r4 retrain, with a final bench. Each stage is wall-clock-gated against the
# killguard deadline. ONE chip process at a time; every python PID is tracked
# in /tmp/r4_*.pid so killguard_r4.sh can SIGTERM it. SIGTERM-trained stages
# checkpoint on timeout (trainer graceful-SIGTERM, r3).
set -u
cd /root/repo
GUARD_AT=${1:?usage: campaign_r4_auto.sh <guard_epoch_utc>}  # killguard fire time
LOG=/tmp/r4_auto.log
log() { echo "[auto $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

run_stage() {  # run_stage <name> <end_epoch> <app args...>
  local name=$1 end=$2; shift 2
  local now=$(date +%s)
  local budget=$((end - now))
  if [ "$budget" -le 180 ]; then log "skip $name (no budget)"; return 1; fi
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
  [ "$now" -ge $((GUARD_AT - 1500)) ] && { log "chip never answered with >25min left; exiting"; exit 1; }
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1 && break
  sleep 120
done
log "CHIP UP at $(date -u)"

# ---- sanity: one tiny jit --------------------------------------------------
timeout 300 python -c "
import jax, jax.numpy as jnp
print(jax.jit(lambda x: (x@x).sum())(jnp.ones((256,256))))" >> "$LOG" 2>&1 || {
  log "sanity jit failed"; exit 1; }

# ---- 1. bench IMMEDIATELY: the headline artifact survives any later wedge --
run_stage bench1 $(( $(date +%s) + 1200 )) bench.py --no_preflight
grep -h '"value"' /tmp/r4_bench1.log | tail -1 >> "$LOG"

# ---- 2. burgers 50k block (cheap: ~50 steps/s on chip) ----------------------
EVAL_END=$((GUARD_AT - 300))
NOW=$(date +%s)
BJ_END=$((NOW + 1500)); [ $BJ_END -gt $EVAL_END ] && BJ_END=$EVAL_END
run_stage burgersj "$BJ_END" apps/train_burgers.py \
  --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
  --train_num_steps 50000 --checkpoint_interval 1000 --resume True \
  --results_folder trained_models/burgers/r2-40k
NOW=$(date +%s)
BW_END=$((NOW + 1500)); [ $BW_END -gt $EVAL_END ] && BW_END=$EVAL_END
run_stage burgersw "$BW_END" apps/train_burgers.py \
  --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
  --is_model_w True --train_num_steps 50000 --checkpoint_interval 1000 \
  --resume True --results_folder trained_models/burgers_w/r2-40k

# ---- 3. burgers 50k eval (two-model beta 2.0, the r2/r3 sweep convention) ---
CKB=$(ls trained_models/burgers/r2-40k/ckpt 2>/dev/null | sort -n | tail -1)
CKBW=$(ls trained_models/burgers_w/r2-40k/ckpt 2>/dev/null | sort -n | tail -1)
if [ -n "${CKB:-}" ] && [ "$CKB" -gt 40000 ]; then
  NOW=$(date +%s)
  BE_END=$((NOW + 1500)); [ $BE_END -gt $EVAL_END ] && BE_END=$EVAL_END
  run_stage burgerseval "$BE_END" apps/infer_burgers.py \
    --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
    --exp_id r2-40k --checkpoint "$CKB" \
    --exp_id__model_w r2-40k --checkpoint__model_w "${CKBW:-$CKB}" \
    --eval_two_models True --prior_beta 2.0 --J_scheduler cosine \
    --wus 0 --n_test_samples 50 \
    --save_file burgers_results/r4_ck${CKB}_beta2.0.json
fi

# ---- 4. remaining time -> smoke r4 joint train (checkpointed every 500) ----
SMOKE_END=$((GUARD_AT - 900))   # leave room for the final bench
run_stage smokejoint "$SMOKE_END" apps/train_smoke.py \
  --dataset_path data/smoke_r4 --train_num_steps 20000 \
  --checkpoint_interval 500 --batch_size 4 \
  --results_folder trained_models/smoke/r4 --resume True

# ---- 5. final bench (killguard will also run one at guard time) -------------
run_stage bench2 "$((GUARD_AT - 120))" bench.py --no_preflight
grep -h '"value"' /tmp/r4_bench2.log | tail -1 >> "$LOG"
log "campaign done"
