#!/bin/bash
# Round-3 chip campaign, part I (really-final): the part-H joint-model
# extension lost ~3 min to tunnel serialization with the tail of the w run
# and was cut at step 42k unsaved. Clean slot order: joint 40k->50k, eval the
# 50k/44k pair, FOPC pair + inference, smoke re-eval, joint-only ablation.
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

# ---- 1. joint model 40k -> 50k, clean slot
if gate 520 burgers_joint_50k; then
  timeout 460 python -u apps/train_burgers.py --synthetic_data 40960 \
    --train_num_steps 50000 --checkpoint_interval 2000 --batch_size 32 \
    --exp_id r2-40k --is_condition_u0 True --is_condition_uT True \
    --is_model_w False --resume True
fi

# ---- 2. evaluate (joint at its latest LR-minimum-adjacent ckpt, w at 44k)
BCK=$(latest trained_models/burgers/r2-40k)
WCK=$(latest trained_models/burgers_w/r2-40k)
echo "burgers checkpoints: joint=$BCK w=$WCK"
if [ "$BCK" != "40000" ] && gate 500 burgers_fo50k_beta2; then
timeout 450 python -u apps/infer_burgers.py --exp_id r2-40k --exp_id__model_w r2-40k \
  --checkpoint "$BCK" --checkpoint__model_w "$WCK" \
  --synthetic_data 2048 --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True --eval_two_models True \
  --prior_beta 2.0 --w_scheduler sigmoid_flip --J_scheduler cosine \
  --wus 0 --wfs 0 \
  --save_file burgers_results/r3_ck${BCK}_beta2.0.json || true
fi

# ---- 3. FOPC pair (2k-step checkpointing) + inference
if gate 740 burgers_fopc; then
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

# ---- 4. smoke re-eval, bf16, moderate guidance
SCK=$(latest trained_models/smoke/r3)
SWCK=$(latest trained_models/smoke_w/r3)
if [ -n "$SCK" ] && [ -n "$SWCK" ] && gate 1100 smoke_eval_sfr1e3; then
timeout 1050 python -u apps/infer_smoke.py --dataset_path data/smoke \
  --joint_folder trained_models/smoke/r3 --w_folder trained_models/smoke_w/r3 \
  --diffusion_joint_checkpoint "$SCK" --diffusion_w_checkpoint "$SWCK" \
  --n_test_samples 8 --batch_size 4 --bf16 True \
  --standard_fixed_ratio 1000 --calibrate True || true
fi

# ---- 5. slack: joint-only ablation
BCK=$(latest trained_models/burgers/r2-40k)
if gate 500 burgers_fo_joint; then
timeout 450 python -u apps/infer_burgers.py --exp_id r2-40k \
  --checkpoint "$BCK" \
  --synthetic_data 2048 --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True \
  --wus 0 --wfs 0 --J_scheduler cosine \
  --save_file burgers_results/r3_ck${BCK}_joint_only.json || true
fi

echo "R3I CAMPAIGN CHAIN DONE $(date -u +%H:%M:%S)"
