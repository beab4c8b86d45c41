#!/bin/bash
# Round-5 campaign, v3 (supersedes campaign_r5b.sh mid-flight; burgersj was
# already launched by r5b and is adopted via its pidfile). Changes vs r5b:
#   - adds the RUNBOOK_r4 stage-3 bf16 TRAIN-COMPILE PROBE before the smoke
#     block: bf16 batch 4 + remat_all was never tried on this runtime (r3
#     only falsified bf16 batch 8); if it compiles + steps, smoke training
#     runs ~2x faster and the joint model gets ~2x the steps in the same
#     wall-clock window. Probe is bounded; on failure we fall back to the
#     known-good fp32 batch 4 + remat_all recipe.
# Queue: [adopt burgersj] -> burgersw -> burgers 50k eval -> smoke datagen
#        -> calibration -> bf16 probe -> smoke joint/w train -> n=16 eval
#        -> PO pairs at 10k with remaining time (POPC, FOPC, POFC).
set -u
cd /root/repo
GUARD_AT=${1:?usage: campaign_r5c.sh <guard_epoch_utc>}
LOG=/tmp/r5_auto.log
log() { echo "[autoC $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

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
  return $rc
}

latest_ckpt() { ls "$1/ckpt" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }

# ---- 0. adopt the in-flight burgersj stage -----------------------------------
if [ -f /tmp/r5_burgersj.pid ]; then
  BPID=$(cat /tmp/r5_burgersj.pid)
  while kill -0 "$BPID" 2>/dev/null; do
    [ "$(date +%s)" -ge $((GUARD_AT - 300)) ] && { log "guard while adopting burgersj"; exit 1; }
    sleep 20
  done
  rm -f /tmp/r5_burgersj.pid
  log "adopted burgersj (exited)"
fi

# ---- 1. burgers w + eval (VERDICT #4) ----------------------------------------
run_stage burgersw $(( $(date +%s) + 2400 )) apps/train_burgers.py \
  --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
  --is_model_w True --train_num_steps 50000 --checkpoint_interval 1000 \
  --resume True --results_folder trained_models/burgers_w/r5-50k
CKB=$(latest_ckpt trained_models/burgers/r5-50k)
CKBW=$(latest_ckpt trained_models/burgers_w/r5-50k)
if [ -n "${CKB:-}" ] && [ -n "${CKBW:-}" ]; then
  run_stage burgerseval $(( $(date +%s) + 1500 )) apps/infer_burgers.py \
    --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
    --exp_id r5-50k --checkpoint "$CKB" \
    --exp_id__model_w r5-50k --checkpoint__model_w "$CKBW" \
    --eval_two_models True --prior_beta 2.0 --J_scheduler cosine \
    --wus 0 --n_test_samples 50 \
    --save_file burgers_results/r5_ck${CKB}_beta2.0.json
fi

# ---- 2. regenerate data/smoke_r4 on chip + re-pin calibration ----------------
if [ ! -d data/smoke_r4 ]; then
  run_stage smokedata $(( $(date +%s) + 3600 )) apps/generate_smoke.py \
    --n_train 512 --n_test 16 --out data/smoke_r4 --batch 8 --seed 7 \
    --accuracy 1e-4 --max_iterations 100
fi
run_stage smokecalib $(( $(date +%s) + 1200 )) apps/infer_smoke.py \
  --dataset_path data/smoke_r4 --calibrate_only True \
  --n_test_samples 16 --batch_size 8 --bf16 True

# ---- 3. bf16 train-compile probe (RUNBOOK_r4 stage 3) ------------------------
SMOKE_PREC_ARGS=""
run_stage bf16probe $(( $(date +%s) + 1500 )) apps/train_smoke.py \
  --dataset_path data/smoke_r4 --train_num_steps 30 \
  --checkpoint_interval 1000 --batch_size 4 --bf16 True \
  --results_folder /tmp/r5_bf16probe_model
if grep -q "training complete" /tmp/r5_bf16probe.log; then
  SMOKE_PREC_ARGS="--bf16 True"
  log "bf16 probe PASSED: smoke trains in bf16"
else
  log "bf16 probe failed -> fp32 batch4 remat (known-good)"
fi

# ---- 4. smoke train + eval (VERDICT #2) --------------------------------------
NOW=$(date +%s)
JOINT_END=$((GUARD_AT - 5100))
[ $((JOINT_END - NOW)) -gt 10800 ] && JOINT_END=$((NOW + 10800))
run_stage smokejoint "$JOINT_END" apps/train_smoke.py \
  --dataset_path data/smoke_r4 --train_num_steps 10000 \
  --checkpoint_interval 500 --batch_size 4 $SMOKE_PREC_ARGS \
  --results_folder trained_models/smoke/r5 --resume True
NOW=$(date +%s)
W_END=$((GUARD_AT - 2700)); [ $((W_END - NOW)) -gt 2400 ] && W_END=$((NOW + 2400))
run_stage smokew "$W_END" apps/train_smoke.py \
  --dataset_path data/smoke_r4 --is_w_model True --train_num_steps 4000 \
  --checkpoint_interval 500 --batch_size 4 $SMOKE_PREC_ARGS \
  --results_folder trained_models/smoke_w/r5 --resume True
CKJ=$(latest_ckpt trained_models/smoke/r5)
CKW=$(latest_ckpt trained_models/smoke_w/r5)
if [ -n "${CKJ:-}" ] && [ -n "${CKW:-}" ]; then
  run_stage smokeeval $(( $(date +%s) + 2100 )) apps/infer_smoke.py \
    --dataset_path data/smoke_r4 \
    --joint_folder trained_models/smoke/r5 \
    --w_folder trained_models/smoke_w/r5 \
    --diffusion_joint_checkpoint "$CKJ" \
    --diffusion_w_checkpoint "$CKW" \
    --w_prob_exp 0.97 --standard_fixed_ratio 100000 \
    --using_ddim True --ddim_eta 1.0 --ddim_sampling_steps 100 \
    --bf16 True --calibrate False --n_test_samples 16 --batch_size 8 \
    --inference_result_path smoke_results
fi

# ---- 5. leftover: burgers PO pairs at 10k (first LR minimum) -----------------
po_pair() {  # po_pair <tag> <dim> <joint args...>
  local tag=$1 dim=$2; shift 2
  run_stage po_${tag}_j $(( $(date +%s) + 1500 )) apps/train_burgers.py \
    "$@" --exp_id "$tag" --dim "$dim" --dim_mults 1 2 4 8 \
    --train_num_steps 10000 --checkpoint_interval 1000 --resume True
  run_stage po_${tag}_w $(( $(date +%s) + 1500 )) apps/train_burgers.py \
    "$@" --is_model_w True --exp_id "${tag}_w" --dim "$dim" \
    --dim_mults 1 2 4 8 \
    --train_num_steps 10000 --checkpoint_interval 1000 --resume True
}

po_pair POPC 64 \
  --synthetic_data 40960 --synthetic_partial_control front_rear_quarter \
  --is_condition_u0 True --is_condition_uT True \
  --partially_observed front_rear_quarter \
  --train_on_partially_observed front_rear_quarter
ck=$(latest_ckpt trained_models/burgers/POPC)
ckw=$(latest_ckpt trained_models/burgers_w/POPC_w)
if [ -n "${ck:-}" ] && [ -n "${ckw:-}" ]; then
  run_stage po_popc_inf $(( $(date +%s) + 1800 )) apps/infer_burgers.py \
    --synthetic_data 40960 --synthetic_partial_control front_rear_quarter \
    --partial_control front_rear_quarter \
    --partially_observed front_rear_quarter \
    --train_on_partially_observed front_rear_quarter \
    --set_unobserved_to_zero_during_sampling True \
    --is_condition_u0 True --is_condition_uT True \
    --J_scheduler cosine --dim 64 --dim_mults 1 2 4 8 \
    --exp_id POPC --checkpoint "$ck" \
    --exp_id__model_w POPC_w --checkpoint__model_w "$ckw" \
    --eval_two_models True --prior_beta 0.9 --w_scheduler sigmoid_flip \
    --wus 0 1000 --n_test_samples 50 \
    --save_file burgers_results/partial_obs_partial_ctr/result.json
fi

po_pair FOPC 64 \
  --synthetic_data 40960 --synthetic_partial_control front_rear_quarter \
  --is_condition_u0 True --is_condition_uT True
ck=$(latest_ckpt trained_models/burgers/FOPC)
ckw=$(latest_ckpt trained_models/burgers_w/FOPC_w)
if [ -n "${ck:-}" ] && [ -n "${ckw:-}" ]; then
  run_stage po_fopc_inf $(( $(date +%s) + 1800 )) apps/infer_burgers.py \
    --synthetic_data 40960 --synthetic_partial_control front_rear_quarter \
    --partial_control front_rear_quarter \
    --is_condition_u0 True --is_condition_uT True \
    --J_scheduler cosine --dim 64 --dim_mults 1 2 4 8 \
    --exp_id FOPC --checkpoint "$ck" \
    --exp_id__model_w FOPC_w --checkpoint__model_w "$ckw" \
    --eval_two_models True --prior_beta 1.5 --w_scheduler sigmoid_flip \
    --wfs 0 --wus 0 1000 --n_test_samples 50 \
    --save_file burgers_results/full_obs_partial_ctr/result.json
fi

po_pair POFC 128 \
  --synthetic_data 40960 \
  --is_condition_u0 True --is_condition_uT True \
  --partially_observed front_rear_quarter \
  --train_on_partially_observed front_rear_quarter
ck=$(latest_ckpt trained_models/burgers/POFC)
ckw=$(latest_ckpt trained_models/burgers_w/POFC_w)
if [ -n "${ck:-}" ] && [ -n "${ckw:-}" ]; then
  run_stage po_pofc_inf $(( $(date +%s) + 1800 )) apps/infer_burgers.py \
    --synthetic_data 40960 \
    --partially_observed front_rear_quarter \
    --train_on_partially_observed front_rear_quarter \
    --set_unobserved_to_zero_during_sampling True \
    --is_condition_u0 True --is_condition_uT True \
    --J_scheduler cosine --dim 128 --dim_mults 1 2 4 8 \
    --exp_id POFC --checkpoint "$ck" \
    --exp_id__model_w POFC_w --checkpoint__model_w "$ckw" \
    --eval_two_models True --prior_beta 2.5 --w_scheduler sigmoid_flip \
    --wus 0 1000 --n_test_samples 50 \
    --save_file burgers_results/partial_obs_full_ctr/result.json
fi

log "campaign C done (killguard runs the final bench)"
