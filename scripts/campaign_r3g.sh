#!/bin/bash
# Round-3 chip campaign, part G (slack tail): bf16 smoke re-eval at moderate
# guidance. The 1e5 ratio saturates the smoke-portion channel on the 6k-step
# prior (part D, PERF.md); fp32 at batch 4 faults the TPU worker (part E),
# so this stays bf16 and lowers the guidance ratio instead.
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
  echo "=== waiting for pid $WAIT_PID (part F)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
  echo "=== pid $WAIT_PID exited $(date -u +%H:%M:%S)"
fi

SCK=$(latest trained_models/smoke/r3)
SWCK=$(latest trained_models/smoke_w/r3)
if [ -n "$SCK" ] && [ -n "$SWCK" ] && gate 1100 smoke_eval_sfr1e3; then
timeout 1050 python -u apps/infer_smoke.py --dataset_path data/smoke \
  --joint_folder trained_models/smoke/r3 --w_folder trained_models/smoke_w/r3 \
  --diffusion_joint_checkpoint "$SCK" --diffusion_w_checkpoint "$SWCK" \
  --n_test_samples 8 --batch_size 4 --bf16 True \
  --standard_fixed_ratio 1000 --calibrate True || true
fi

echo "R3G CAMPAIGN CHAIN DONE $(date -u +%H:%M:%S)"
