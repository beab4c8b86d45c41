#!/bin/bash
# Round-3 chip campaign, part K (slack window before the driver bench):
# 1. validate the new best-of-5 bench.py on the chip (the driver runs it
#    unattended at round end — it must work);
# 2. extend the burgers joint model 40k->50k (the LR minimum), now protected
#    by the trainer's graceful-SIGTERM checkpoint-and-exit;
# 3. evaluate the 50k pair.
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

if gate 420 bench_check; then
  timeout 400 python bench.py || true
fi

if gate 520 burgers_joint_50k; then
  timeout 460 python -u apps/train_burgers.py --synthetic_data 40960 \
    --train_num_steps 50000 --checkpoint_interval 2000 --batch_size 32 \
    --exp_id r2-40k --is_condition_u0 True --is_condition_uT True \
    --is_model_w False --resume True
fi

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

echo "R3K CAMPAIGN CHAIN DONE $(date -u +%H:%M:%S)"
