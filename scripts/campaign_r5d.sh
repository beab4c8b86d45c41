#!/bin/bash
# Round-5 campaign, window D (second session window; previous window's
# campaign_r5c ended at its 06:47 guard with these items open):
#   - ck20k row: burgers r5-50k pair at the 20k LR-cycle minimum (VERDICT #4;
#     timed out at a 194s tail budget last window)
#   - wf row: POPC wf sweep — the demonstration that guidance changes an
#     outcome on the unclamped f channel (skipped last window, budget 136s)
#   - smoke_w: rc=1 TPU FailedPrecondition at startup last window (tunnel
#     wedge right after the smokejoint SIGTERM) — retry from scratch
#   - smoke two-model eval on data/smoke_r4 (VERDICT #2 — the flagship gap);
#     eval EARLY with joint@2700 + w@2500 to bank a row, then resume joint
#     with all remaining time and eval again
#   - POFC pair at 10k (dim 128) + inference row: completes the PO table
#     (VERDICT #3; FOPC + POPC rows landed last window)
# One chip process at a time; every stage is SIGTERM-bounded; trainers
# checkpoint on SIGTERM. killguard_r5.sh handles the end-of-window bench.
set -u
cd /root/repo
GUARD_AT=${1:?usage: campaign_r5d.sh <guard_epoch_utc>}
LOG=/tmp/r5_auto.log
log() { echo "[autoD $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

run_stage() {  # run_stage <name> <end_epoch> <app args...>
  local name=$1 end=$2; shift 2
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
  # A non-timeout, non-SIGTERM failure is usually a wedged tunnel
  # (kill -9 mid-call wedges it 10-12 min, PERF.md r3): cool off.
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ] && [ "$rc" -ne 143 ]; then
    log "stage $name rc=$rc -> 480s tunnel cooloff"
    sleep 480
  fi
  return $rc
}

latest_ckpt() { ls "$1/ckpt" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }

# ---- 1. burgers r5-50k pair at the 20k LR-cycle minimum (VERDICT #4) ---------
run_stage ck20k $(( $(date +%s) + 900 )) apps/infer_burgers.py \
  --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
  --exp_id r5-50k --checkpoint 20000 \
  --exp_id__model_w r5-50k --checkpoint__model_w 20000 \
  --eval_two_models True --prior_beta 2.0 --J_scheduler cosine \
  --wus 0 --n_test_samples 50 \
  --save_file burgers_results/r5_ck20000_beta2.0.json

# ---- 2. wf sweep: guidance effect on the unclamped f channel ------------------
run_stage wfrow $(( $(date +%s) + 1500 )) apps/infer_burgers.py \
  --synthetic_data 40960 --synthetic_partial_control front_rear_quarter \
  --partial_control front_rear_quarter \
  --partially_observed front_rear_quarter \
  --train_on_partially_observed front_rear_quarter \
  --set_unobserved_to_zero_during_sampling True \
  --is_condition_u0 True --is_condition_uT True \
  --J_scheduler cosine --dim 64 --dim_mults 1 2 4 8 \
  --exp_id POPC --checkpoint 10000 \
  --exp_id__model_w POPC_w --checkpoint__model_w 10000 \
  --eval_two_models True --prior_beta 0.9 --w_scheduler sigmoid_flip \
  --wus 1000 --wfs 0.0001 0.001 --n_test_samples 50 \
  --save_file burgers_results/partial_obs_partial_ctr/result_wf.json

# ---- 3. smoke w model (retry of last window's wedge-failure) ------------------
run_stage smokew1 $(( $(date +%s) + 3600 )) apps/train_smoke.py \
  --dataset_path data/smoke_r4 --is_w_model True \
  --train_num_steps 2500 --checkpoint_interval 500 --batch_size 4 \
  --bf16 True --results_folder trained_models/smoke_w/r5 --resume True

# ---- 4. smoke two-model eval #1: bank a row with whatever exists --------------
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
  run_stage pofcinf $(( $(date +%s) + 1500 )) apps/infer_burgers.py \
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

log "campaign D done (killguard runs the final bench)"
