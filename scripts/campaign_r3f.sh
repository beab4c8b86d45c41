#!/bin/bash
# Round-3 chip campaign, part F. Re-plan after the 40k-checkpoint burgers
# eval came back 2.6x WORSE than 30k (J 0.00724 vs 0.00278): checkpoint
# 40000 sits at the cosine-LR MAXIMUM — CosineAnnealingLR(T_max=10000) has
# minima at t=10k,30k,50k,... and maxima at t=0,20k,40k,... (the r2
# "10k-minimum beats 20k-max by 2x" finding, generalized). So: extend both
# models to 50,000 steps (the next LR minimum) and evaluate there, then the
# FOPC pair, then the joint-only ablation row.
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
  echo "=== waiting for pid $WAIT_PID (smoke fp32 eval)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
  echo "=== pid $WAIT_PID exited $(date -u +%H:%M:%S)"
fi

# ---- 1. extend joint+w to the 50k LR minimum. checkpoint_interval 2000:
# a clock-cut then still persists the last 2k multiple (10k-interval saves
# nothing when cut — the part-C/D lesson, relearned once more in part F v1)
if gate 1050 burgers_ext_50k; then
  for W in False True; do
    timeout 480 python -u apps/train_burgers.py --synthetic_data 40960 \
      --train_num_steps 50000 --checkpoint_interval 2000 --batch_size 32 \
      --exp_id r2-40k --is_condition_u0 True --is_condition_uT True \
      --is_model_w $W --resume True
  done
fi

# ---- 2. evaluate at 50k (two-model beta 2.0, the r2-best recipe)
BCK=$(latest trained_models/burgers/r2-40k)
WCK=$(latest trained_models/burgers_w/r2-40k)
echo "burgers checkpoints: joint=$BCK w=$WCK"
if [ "$BCK" = "50000" ] && gate 500 burgers_fo50k_beta2; then
timeout 450 python -u apps/infer_burgers.py --exp_id r2-40k --exp_id__model_w r2-40k \
  --checkpoint 50000 --checkpoint__model_w "$WCK" \
  --synthetic_data 2048 --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True --eval_two_models True \
  --prior_beta 2.0 --w_scheduler sigmoid_flip --J_scheduler cosine \
  --wus 0 --wfs 0 \
  --save_file burgers_results/r3_ck50000_beta2.0.json || true
fi

# ---- 3. FOPC pair at 2k-step checkpointing + inference
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

# ---- 4. joint-only ablation row at the best FO checkpoint
if gate 500 burgers_fo_joint; then
timeout 450 python -u apps/infer_burgers.py --exp_id r2-40k \
  --checkpoint "$BCK" \
  --synthetic_data 2048 --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True \
  --wus 0 --wfs 0 --J_scheduler cosine \
  --save_file burgers_results/r3_ck${BCK}_joint_only.json || true
fi

echo "R3F CAMPAIGN CHAIN DONE $(date -u +%H:%M:%S)"
