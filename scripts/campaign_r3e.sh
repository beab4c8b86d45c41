#!/bin/bash
# Round-3 chip campaign, part E (hand-driven tail after killing the part-D
# controller): waits for the running jellyfish DDPM-1000 stage, then
# 1. retries the burgers 40k-checkpoint sweep (part-D's attempt was
#    clock-cut before its first incremental save landed);
# 2. re-runs the smoke held-out eval at fp32 with moderate guidance
#    (the bf16 + standard_fixed_ratio=1e5 run saturated the smoke-portion
#    channel: mae_smoke=1.0, J_target=0);
# 3. best-effort: FOPC pair at checkpoint_interval 2000 + its inference.
# All python stages run unbuffered so the log shows live progress.
cd "$(dirname "$0")/.."

ROUND_END=${ROUND_END:-1786994300}
HARD_STOP=$((ROUND_END - 1000))
now() { date +%s; }
gate() {
  local need=$1 name=$2
  if [ $(( $(now) + need )) -gt "$HARD_STOP" ]; then
    echo "=== SKIP $name (needs ${need}s, $((HARD_STOP - $(now)))s left)"
    return 1
  fi
  echo "=== STAGE $name $(date -u +%H:%M:%S)"
  return 0
}
latest() { ls "$1/ckpt" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }

WAIT_PID=${WAIT_PID:-0}
if [ "$WAIT_PID" -gt 0 ]; then
  echo "=== waiting for pid $WAIT_PID (jelly_ddpm1000)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
  echo "=== pid $WAIT_PID exited $(date -u +%H:%M:%S)"
fi

BCK=$(latest trained_models/burgers/r2-40k)
WCK=$(latest trained_models/burgers_w/r2-40k)
if gate 850 burgers_fo_beta2_retry; then
timeout 800 python -u apps/infer_burgers.py --exp_id r2-40k --exp_id__model_w r2-40k \
  --checkpoint "$BCK" --checkpoint__model_w "$WCK" \
  --synthetic_data 2048 --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True --eval_two_models True \
  --prior_beta 2.0 --w_scheduler sigmoid_flip --J_scheduler cosine \
  --wus 0 1000 --wfs 0 \
  --save_file burgers_results/r3_ck${BCK}_beta2.0.json || true
fi

SCK=$(latest trained_models/smoke/r3)
SWCK=$(latest trained_models/smoke_w/r3)
if [ -n "$SCK" ] && [ -n "$SWCK" ] && gate 1250 smoke_eval_fp32_sfr1e3; then
timeout 1200 python -u apps/infer_smoke.py --dataset_path data/smoke \
  --joint_folder trained_models/smoke/r3 --w_folder trained_models/smoke_w/r3 \
  --diffusion_joint_checkpoint "$SCK" --diffusion_w_checkpoint "$SWCK" \
  --n_test_samples 8 --batch_size 4 --bf16 False \
  --standard_fixed_ratio 1000 --calibrate True || true
fi

if gate 750 burgers_fopc; then
  for W in False True; do
    timeout 330 python -u apps/train_burgers.py --synthetic_data 40960 \
      --synthetic_partial_control front_rear_quarter \
      --train_num_steps 40000 --checkpoint_interval 2000 --batch_size 32 \
      --exp_id FOPC --is_condition_u0 True --is_condition_uT True \
      --is_model_w $W --resume True
  done
fi
FCK=$(latest trained_models/burgers/FOPC)
FWCK=$(latest trained_models/burgers_w/FOPC)
if [ -n "$FCK" ] && [ -n "$FWCK" ] && gate 700 burgers_fopc_infer; then
timeout 650 python -u apps/infer_burgers.py --exp_id FOPC --exp_id__model_w FOPC \
  --checkpoint "$FCK" --checkpoint__model_w "$FWCK" \
  --synthetic_data 2048 --synthetic_partial_control front_rear_quarter \
  --partial_control front_rear_quarter \
  --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True --eval_two_models True \
  --prior_beta 2.0 --w_scheduler sigmoid_flip --J_scheduler cosine \
  --wus 0 1000 --wfs 0 \
  --save_file burgers_results/r3_FOPC_beta2.0.json || true
fi

# last slack: joint-only 40k row (prior-reweighting ablation anchor)
if gate 500 burgers_fo_joint; then
timeout 450 python -u apps/infer_burgers.py --exp_id r2-40k \
  --checkpoint "$BCK" \
  --synthetic_data 2048 --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True \
  --wus 0 1000 --wfs 0 --J_scheduler cosine \
  --save_file burgers_results/r3_ck${BCK}_joint_only.json || true
fi

echo "R3E CAMPAIGN CHAIN DONE $(date -u +%H:%M:%S)"
