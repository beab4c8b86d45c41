#!/bin/bash
# Round-5 window D, v3 (replaces campaign_r5e.sh): the tunnel wedged ~07:31
# UTC mid-smokew1 (probe blocks in backend init = outage mode, PERF.md r4),
# so every stage is now gated on a bounded chip probe — a dead tunnel must
# not burn stage budgets. Queue (flagship-first once the chip answers):
#   smokew1 retrain -> smokeeval1 (smoke two-model row, VERDICT #2)
#   -> b30k top-up+eval (burgers 30k LR minimum, VERDICT #4)
#   -> bench2 full with secondary UNet3D metric (VERDICT #7)
#   -> POFC pair + row (completes the PO table, VERDICT #3)
#   -> smoke joint resume (dynamic) -> smoke w resume -> smokeeval2
set -u
cd /root/repo
GUARD_AT=${1:?usage: campaign_r5f.sh <guard_epoch_utc>}
LOG=/tmp/r5_auto.log
log() { echo "[autoF $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

probe_chip() {  # bounded: rc 0 = chip answers
  timeout -s TERM 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

wait_for_chip() {  # loop until the tunnel answers or the guard nears
  probe_chip && return 0
  log "chip probe failed; entering outage wait"
  while true; do
    [ "$(date +%s)" -ge $((GUARD_AT - 600)) ] && { log "guard while waiting for chip"; return 1; }
    sleep 180
    probe_chip && { log "chip answered"; return 0; }
    log "probe still failing"
  done
}

run_stage() {  # run_stage <name> <end_epoch> <app args...>
  local name=$1 end=$2; shift 2
  wait_for_chip || return 1
  local now; now=$(date +%s)
  local budget=$((end - now))
  local cap=$((GUARD_AT - now - 120))
  [ "$budget" -gt "$cap" ] && budget=$cap
  if [ "$budget" -le 180 ]; then log "skip $name (no budget)"; return 1; fi
  log "start $name budget=${budget}s: $*"
  timeout -s TERM --kill-after=120 "$budget" \
    python -u "$@" > "/tmp/r5_${name}.log" 2>&1 &
  echo $! > "/tmp/r5_${name}.pid"
  wait $!
  local rc=$?
  rm -f "/tmp/r5_${name}.pid"
  log "end $name rc=$rc"
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ] && [ "$rc" -ne 143 ]; then
    log "stage $name rc=$rc -> 480s tunnel cooloff"
    sleep 480
  fi
  return $rc
}

latest_ckpt() { ls "$1/ckpt" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }

# ---- 0. wait out the old wedged smokew1 (killed by its own timeout at 08:22,
#         or exits if the tunnel recovers first and it finishes its 2500) ------
if [ -f /tmp/r5_smokew1.pid ]; then
  WPID=$(cat /tmp/r5_smokew1.pid)
  while kill -0 "$WPID" 2>/dev/null; do
    [ "$(date +%s)" -ge $((GUARD_AT - 300)) ] && { log "guard while adopting smokew1"; exit 1; }
    sleep 15
  done
  rm -f /tmp/r5_smokew1.pid
  log "old smokew1 exited"
  sleep 60   # let a SIGKILL-induced wedge clear (10-12 min handled by probes)
fi

# ---- 1. smoke w model (resumes from whatever the wedged run saved, if any) ----
run_stage smokew1b $(( $(date +%s) + 3300 )) apps/train_smoke.py \
  --dataset_path data/smoke_r4 --is_w_model True \
  --train_num_steps 2500 --checkpoint_interval 500 --batch_size 4 \
  --bf16 True --results_folder trained_models/smoke_w/r5 --resume True

# ---- 2. smoke two-model eval #1 (the flagship row) ----------------------------
smoke_eval() {  # smoke_eval <name> <budget_s>
  local name=$1 budget=$2
  local ckj ckw
  ckj=$(latest_ckpt trained_models/smoke/r5)
  ckw=$(latest_ckpt trained_models/smoke_w/r5)
  if [ -z "${ckj:-}" ] || [ -z "${ckw:-}" ]; then
    log "skip $name (joint=$ckj w=$ckw)"; return 1
  fi
  run_stage "$name" $(( $(date +%s) + budget )) apps/infer_smoke.py \
    --dataset_path data/smoke_r4 \
    --joint_folder trained_models/smoke/r5 \
    --w_folder trained_models/smoke_w/r5 \
    --diffusion_joint_checkpoint "$ckj" \
    --diffusion_w_checkpoint "$ckw" \
    --w_prob_exp 0.97 --standard_fixed_ratio 100000 \
    --using_ddim True --ddim_eta 1.0 --ddim_sampling_steps 100 \
    --bf16 True --calibrate False --n_test_samples 16 --batch_size 8 \
    --inference_result_path smoke_results
}
smoke_eval smokeeval1 2400

# ---- 3. burgers 30k LR-minimum top-up + eval (warm-cache, ~7 min) -------------
run_stage b30kj $(( $(date +%s) + 600 )) apps/train_burgers.py \
  --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
  --train_num_steps 30000 --checkpoint_interval 1000 --resume True \
  --results_folder trained_models/burgers/r5-50k
run_stage b30kw $(( $(date +%s) + 400 )) apps/train_burgers.py \
  --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
  --is_model_w True --train_num_steps 30000 --checkpoint_interval 1000 \
  --resume True --results_folder trained_models/burgers_w/r5-50k
if [ "$(latest_ckpt trained_models/burgers/r5-50k)" = "30000" ]; then
  run_stage b30keval $(( $(date +%s) + 900 )) apps/infer_burgers.py \
    --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
    --exp_id r5-50k --checkpoint 30000 \
    --exp_id__model_w r5-50k --checkpoint__model_w 30000 \
    --eval_two_models True --prior_beta 2.0 --J_scheduler cosine \
    --wus 0 --n_test_samples 50 \
    --save_file burgers_results/r5_ck30000_beta2.0.json
fi

# ---- 4. full bench with the secondary UNet3D metric (VERDICT #7) --------------
run_stage bench2 $(( $(date +%s) + 1800 )) bench.py --no_preflight
grep -h '"value"' /tmp/r5_bench2.log | tail -1 >> "$LOG"

# ---- 5. POFC pair at 10k (dim 128) + inference row (completes PO table) -------
run_stage pofcj $(( $(date +%s) + 2700 )) apps/train_burgers.py \
  --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
  --partially_observed front_rear_quarter \
  --train_on_partially_observed front_rear_quarter \
  --exp_id POFC --dim 128 --dim_mults 1 2 4 8 \
  --train_num_steps 10000 --checkpoint_interval 1000 --resume True
run_stage pofcw $(( $(date +%s) + 2700 )) apps/train_burgers.py \
  --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
  --partially_observed front_rear_quarter \
  --train_on_partially_observed front_rear_quarter \
  --is_model_w True --exp_id POFC_w --dim 128 --dim_mults 1 2 4 8 \
  --train_num_steps 10000 --checkpoint_interval 1000 --resume True
CKP=$(latest_ckpt trained_models/burgers/POFC)
CKPW=$(latest_ckpt trained_models/burgers_w/POFC_w)
if [ -n "${CKP:-}" ] && [ -n "${CKPW:-}" ]; then
  run_stage pofcinf $(( $(date +%s) + 1800 )) apps/infer_burgers.py \
    --synthetic_data 40960 \
    --partially_observed front_rear_quarter \
    --train_on_partially_observed front_rear_quarter \
    --set_unobserved_to_zero_during_sampling True \
    --is_condition_u0 True --is_condition_uT True \
    --J_scheduler cosine --dim 128 --dim_mults 1 2 4 8 \
    --exp_id POFC --checkpoint "$CKP" \
    --exp_id__model_w POFC_w --checkpoint__model_w "$CKPW" \
    --eval_two_models True --prior_beta 2.5 --w_scheduler sigmoid_flip \
    --wus 0 1000 --n_test_samples 50 \
    --save_file burgers_results/partial_obs_full_ctr/result.json
fi

# ---- 6. smoke joint: resume with all remaining time minus a tail reserve ------
NOW=$(date +%s)
RESERVE=4500   # smokew2 (1800) + smokeeval2 (1800) + slack (900)
JBUDGET=$((GUARD_AT - NOW - RESERVE))
if [ "$JBUDGET" -gt 900 ]; then
  run_stage smokejoint2 $(( NOW + JBUDGET )) apps/train_smoke.py \
    --dataset_path data/smoke_r4 --train_num_steps 20000 \
    --checkpoint_interval 500 --batch_size 4 --bf16 True \
    --results_folder trained_models/smoke/r5 --resume True
else
  log "skip smokejoint2 (budget ${JBUDGET}s)"
fi

# ---- 7. smoke w resume + final eval -------------------------------------------
run_stage smokew2 $(( $(date +%s) + 1800 )) apps/train_smoke.py \
  --dataset_path data/smoke_r4 --is_w_model True \
  --train_num_steps 4000 --checkpoint_interval 500 --batch_size 4 \
  --bf16 True --results_folder trained_models/smoke_w/r5 --resume True
smoke_eval smokeeval2 2100

log "campaign F done (killguard runs the final bench)"
