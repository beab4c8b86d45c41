#!/bin/bash
# Round-5 auto campaign: waits for the axon tunnel, then runs the RUNBOOK_r5
# chip queue in judge-value order with wall-clock gates:
#   1. bench.py (headline artifact, survives any later wedge)
#   2. burgers joint/w 40k->50k + 50k two-model eval      (VERDICT #4)
#   3. burgers PO table: FOPC/POFC/POPC train + inference (VERDICT #3)
#   4. smoke joint+w train on data/smoke_r4 + n=16 eval   (VERDICT #2)
#   5. jellyfish 10k retrain + disjoint rescoring (only if hours remain)
#   6. final bench
# Ordering between 3 and 4 is decided dynamically from the time left when we
# get there (smoke needs a >=3.7h contiguous block to reach competence; the
# PO table is wedge-tolerant and delivers 3 result rows in ~2.5h).
# ONE chip process at a time; every python PID is in /tmp/r5_*.pid so
# killguard_r5.sh can SIGTERM it (graceful-SIGTERM trainers checkpoint).
set -u
cd /root/repo
GUARD_AT=${1:?usage: campaign_r5_auto.sh <guard_epoch_utc>}
LOG=/tmp/r5_auto.log
log() { echo "[auto $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

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

# ---- wait for the chip -----------------------------------------------------
while true; do
  now=$(date +%s)
  [ "$now" -ge $((GUARD_AT - 1500)) ] && { log "chip never answered with >25min left; exiting"; exit 1; }
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1 && break
  sleep 120
done
log "CHIP UP at $(date -u)"
touch /tmp/r5_chip_up

timeout 300 python -c "
import jax, jax.numpy as jnp
print(jax.jit(lambda x: (x@x).sum())(jnp.ones((256,256))))" >> "$LOG" 2>&1 || {
  log "sanity jit failed"; exit 1; }

# ---- 1. bench IMMEDIATELY ---------------------------------------------------
run_stage bench1 $(( $(date +%s) + 1900 )) bench.py --no_preflight
grep -h '"value"' /tmp/r5_bench1.log | tail -1 >> "$LOG"
grep -h '"value"' /tmp/r5_bench1.log | tail -1 > BENCH_r05_campaign.json

# ---- 2. burgers 50k block ----------------------------------------------------
run_stage burgersj $(( $(date +%s) + 1500 )) apps/train_burgers.py \
  --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
  --train_num_steps 50000 --checkpoint_interval 1000 --resume True \
  --results_folder trained_models/burgers/r2-40k
run_stage burgersw $(( $(date +%s) + 1500 )) apps/train_burgers.py \
  --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
  --is_model_w True --train_num_steps 50000 --checkpoint_interval 1000 \
  --resume True --results_folder trained_models/burgers_w/r2-40k
CKB=$(latest_ckpt trained_models/burgers/r2-40k)
CKBW=$(latest_ckpt trained_models/burgers_w/r2-40k)
if [ -n "${CKB:-}" ] && [ "$CKB" -gt 40000 ]; then
  run_stage burgerseval $(( $(date +%s) + 1500 )) apps/infer_burgers.py \
    --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
    --exp_id r2-40k --checkpoint "$CKB" \
    --exp_id__model_w r2-40k --checkpoint__model_w "${CKBW:-$CKB}" \
    --eval_two_models True --prior_beta 2.0 --J_scheduler cosine \
    --wus 0 --n_test_samples 50 \
    --save_file burgers_results/r5_ck${CKB}_beta2.0.json
fi

# ---- PO table block (VERDICT #3) --------------------------------------------
po_block() {
  # FOPC: joint+w on the partial-control dataset, dim 64 (ref train cfg)
  run_stage po_fopc_j $(( $(date +%s) + 1200 )) apps/train_burgers.py \
    --synthetic_data 40960 --synthetic_partial_control front_rear_quarter \
    --is_condition_u0 True --is_condition_uT True \
    --exp_id FOPC --dim 64 --dim_mults 1 2 4 8 \
    --train_num_steps 30000 --checkpoint_interval 2000 --resume True
  run_stage po_fopc_w $(( $(date +%s) + 1200 )) apps/train_burgers.py \
    --synthetic_data 40960 --synthetic_partial_control front_rear_quarter \
    --is_condition_u0 True --is_condition_uT True --is_model_w True \
    --exp_id FOPC_w --dim 64 --dim_mults 1 2 4 8 \
    --train_num_steps 30000 --checkpoint_interval 2000 --resume True
  # POFC: joint+w on the full-control dataset with PO masking, dim 128
  run_stage po_pofc_j $(( $(date +%s) + 2400 )) apps/train_burgers.py \
    --synthetic_data 40960 \
    --is_condition_u0 True --is_condition_uT True \
    --partially_observed front_rear_quarter \
    --train_on_partially_observed front_rear_quarter \
    --exp_id POFC --dim 128 --dim_mults 1 2 4 8 \
    --train_num_steps 30000 --checkpoint_interval 2000 --resume True
  run_stage po_pofc_w $(( $(date +%s) + 2400 )) apps/train_burgers.py \
    --synthetic_data 40960 --is_model_w True \
    --is_condition_u0 True --is_condition_uT True \
    --partially_observed front_rear_quarter \
    --train_on_partially_observed front_rear_quarter \
    --exp_id POFC_w --dim 128 --dim_mults 1 2 4 8 \
    --train_num_steps 30000 --checkpoint_interval 2000 --resume True
  # POPC: joint+w on the partial-control dataset with PO masking, dim 64
  run_stage po_popc_j $(( $(date +%s) + 1200 )) apps/train_burgers.py \
    --synthetic_data 40960 --synthetic_partial_control front_rear_quarter \
    --is_condition_u0 True --is_condition_uT True \
    --partially_observed front_rear_quarter \
    --train_on_partially_observed front_rear_quarter \
    --exp_id POPC --dim 64 --dim_mults 1 2 4 8 \
    --train_num_steps 30000 --checkpoint_interval 2000 --resume True
  run_stage po_popc_w $(( $(date +%s) + 1200 )) apps/train_burgers.py \
    --synthetic_data 40960 --synthetic_partial_control front_rear_quarter \
    --is_condition_u0 True --is_condition_uT True --is_model_w True \
    --partially_observed front_rear_quarter \
    --train_on_partially_observed front_rear_quarter \
    --exp_id POPC_w --dim 64 --dim_mults 1 2 4 8 \
    --train_num_steps 30000 --checkpoint_interval 2000 --resume True

  # inference rows (two-model + wu sweep so guidance has an observable effect)
  local ck ckw
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
}

# ---- smoke block (VERDICT #2): budgets passed in ----------------------------
smoke_block() {  # smoke_block <total_budget_s>
  local total=$1 now joint_b w_b
  now=$(date +%s)
  joint_b=$((total - 9000)); [ "$joint_b" -gt 15000 ] && joint_b=15000
  if [ "$joint_b" -le 1200 ]; then log "smoke: no joint budget"; return 1; fi
  run_stage smokejoint $((now + joint_b)) apps/train_smoke.py \
    --dataset_path data/smoke_r4 --train_num_steps 10000 \
    --checkpoint_interval 500 --batch_size 4 \
    --results_folder trained_models/smoke/r4 --resume True
  now=$(date +%s)
  w_b=$((GUARD_AT - now - 3600)); [ "$w_b" -gt 6000 ] && w_b=6000
  run_stage smokew $(( now + w_b )) apps/train_smoke.py \
    --dataset_path data/smoke_r4 --is_w_model True --train_num_steps 4000 \
    --checkpoint_interval 500 --batch_size 4 \
    --results_folder trained_models/smoke_w/r4 --resume True
  local ckj ckw
  ckj=$(latest_ckpt trained_models/smoke/r4)
  ckw=$(latest_ckpt trained_models/smoke_w/r4)
  if [ -n "${ckj:-}" ] && [ -n "${ckw:-}" ]; then
    run_stage smokeeval $(( $(date +%s) + 2400 )) apps/infer_smoke.py \
      --dataset_path data/smoke_r4 \
      --joint_folder trained_models/smoke/r4 \
      --w_folder trained_models/smoke_w/r4 \
      --diffusion_joint_checkpoint "$ckj" \
      --diffusion_w_checkpoint "$ckw" \
      --w_prob_exp 0.97 --standard_fixed_ratio 100000 \
      --using_ddim True --ddim_eta 1.0 --ddim_sampling_steps 100 \
      --bf16 True --calibrate False --n_test_samples 16 --batch_size 8 \
      --inference_result_path smoke_results
    # fallback guidance strength if the reference sfr saturates (PERF.md r3)
    run_stage smokeeval2 $(( $(date +%s) + 2400 )) apps/infer_smoke.py \
      --dataset_path data/smoke_r4 \
      --joint_folder trained_models/smoke/r4 \
      --w_folder trained_models/smoke_w/r4 \
      --diffusion_joint_checkpoint "$ckj" \
      --diffusion_w_checkpoint "$ckw" \
      --w_prob_exp 0.97 --standard_fixed_ratio 1000 \
      --using_ddim True --ddim_eta 1.0 --ddim_sampling_steps 100 \
      --bf16 True --calibrate False --n_test_samples 16 --batch_size 8 \
      --inference_result_path smoke_results
  fi
}

NOW=$(date +%s); REM=$((GUARD_AT - NOW))
log "post-burgers: ${REM}s remain"
if [ "$REM" -ge 34200 ]; then
  log "order: PO first, then smoke"
  po_block
  NOW=$(date +%s); smoke_block $((GUARD_AT - NOW - 2400))
elif [ "$REM" -ge 14400 ]; then
  log "order: smoke first, then PO with remains"
  smoke_block $((REM - 2400))
  po_block
else
  log "short window: PO only (smoke cannot reach competence in ${REM}s)"
  po_block
fi

# ---- opportunistic jellyfish de-bias (needs ~4.5h) ---------------------------
NOW=$(date +%s); REM=$((GUARD_AT - NOW))
if [ "$REM" -ge 17000 ]; then
  log "jellyfish retrain window: ${REM}s"
  HALF=$(( (REM - 3600) / 2 ))
  run_stage jelly_states $(( NOW + HALF )) apps/train_jellyfish.py \
    --dataset_path data/jellyfish --model_type states \
    --train_num_steps 10000 --checkpoint_interval 500 --batch_size 4 \
    --resume True
  NOW=$(date +%s)
  run_stage jelly_thetas $(( NOW + HALF )) apps/train_jellyfish.py \
    --dataset_path data/jellyfish --model_type thetas \
    --train_num_steps 10000 --checkpoint_interval 500 --batch_size 4 \
    --resume True
fi

# ---- final bench -------------------------------------------------------------
run_stage bench2 "$((GUARD_AT - 120))" bench.py --no_preflight --no_secondary
grep -h '"value"' /tmp/r5_bench2.log | tail -1 >> "$LOG"
log "campaign done"
