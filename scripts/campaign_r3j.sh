#!/bin/bash
# Round-3 chip campaign, part J (final tail, replaces part I's remainder):
# the FOPC joint model lost its slot to the second tunnel wedge. Order:
# finish FOPC joint training, FOPC inference, smoke re-eval at moderate
# guidance. The joint-only 40k ablation is dropped (known-bad LR-max ckpt).
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
  echo "=== waiting for pid $WAIT_PID (FOPC w-model training)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 10; done
  echo "=== pid $WAIT_PID exited $(date -u +%H:%M:%S)"
fi

# ---- 1. FOPC joint model (clean slot; 2k-step checkpointing)
if gate 460 burgers_fopc_joint; then
  timeout 400 python -u apps/train_burgers.py --synthetic_data 40960 \
    --synthetic_partial_control front_rear_quarter \
    --train_num_steps 40000 --checkpoint_interval 2000 --batch_size 32 \
    --exp_id FOPC --is_condition_u0 True --is_condition_uT True \
    --is_model_w False --resume True
fi

# ---- 2. FOPC inference
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

# ---- 3. smoke re-eval, bf16, moderate guidance
SCK=$(latest trained_models/smoke/r3)
SWCK=$(latest trained_models/smoke_w/r3)
if [ -n "$SCK" ] && [ -n "$SWCK" ] && gate 1100 smoke_eval_sfr1e3; then
timeout 1050 python -u apps/infer_smoke.py --dataset_path data/smoke \
  --joint_folder trained_models/smoke/r3 --w_folder trained_models/smoke_w/r3 \
  --diffusion_joint_checkpoint "$SCK" --diffusion_w_checkpoint "$SWCK" \
  --n_test_samples 8 --batch_size 4 --bf16 True \
  --standard_fixed_ratio 1000 --calibrate True || true
fi

echo "R3J CAMPAIGN CHAIN DONE $(date -u +%H:%M:%S)"
