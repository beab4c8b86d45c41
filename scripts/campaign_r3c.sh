#!/bin/bash
# Round-3 chip campaign, part C: manual re-plan after the part-B scheduling
# incident (a duplicate campaign chain split the chip and smoke_w could not
# reach its first checkpoint inside its timeout).
#
# Invariants:
# - exactly ONE TPU process at any time (this script serializes everything);
# - every block is clock-gated so the chip is FREE before the driver's
#   end-of-round bench run;
# - priority order inside inference = VERDICT r2 "Next round" order.
#
# Usage: SMOKE_W_PID=<pid> bash scripts/campaign_r3c.sh
cd "$(dirname "$0")/.."

ROUND_END=${ROUND_END:-1786994300}
# no block may START unless its own budget fits before HARD_STOP
HARD_STOP=$((ROUND_END - 1000))

now() { date +%s; }
# gate BUDGET NAME -> 0 if the block fits, 1 otherwise
gate() {
  local need=$1 name=$2
  if [ $(( $(now) + need )) -gt "$HARD_STOP" ]; then
    echo "=== SKIP $name (needs ${need}s, $((HARD_STOP - $(now)))s left)"
    return 1
  fi
  echo "=== STAGE $name $(date -u +%H:%M:%S)"
  return 0
}

# ---- phase 0: let the live smoke_w trainer reach its step-4000 checkpoint
# (~15:44), then stop it. Fallback: stop at the wall deadline regardless.
SMOKE_W_PID=${SMOKE_W_PID:-0}
SMOKE_W_DEADLINE=${SMOKE_W_DEADLINE:-1786981700}
if [ "$SMOKE_W_PID" -gt 0 ] && kill -0 "$SMOKE_W_PID" 2>/dev/null; then
  echo "=== waiting on smoke_w (pid $SMOKE_W_PID) until ckpt/4000 or $(date -ud @$SMOKE_W_DEADLINE +%H:%M:%S)"
  while kill -0 "$SMOKE_W_PID" 2>/dev/null \
        && [ ! -e trained_models/smoke_w/r3/ckpt/4000 ] \
        && [ "$(now)" -lt "$SMOKE_W_DEADLINE" ]; do
    sleep 30
  done
  # grace so an in-flight orbax save completes before we kill
  sleep 20
  kill "$SMOKE_W_PID" 2>/dev/null
  sleep 10
  kill -9 "$SMOKE_W_PID" 2>/dev/null
  echo "=== smoke_w stopped; checkpoints: $(ls trained_models/smoke_w/r3/ckpt 2>/dev/null | tr '\n' ' ')"
fi

# ---- phase 1: burgers training (fast: ~177 steps/s at batch 32)
if gate 1500 burgers_ext; then
  for W in False True; do
    timeout 700 python apps/train_burgers.py --synthetic_data 40960 \
      --train_num_steps 100000 --checkpoint_interval 10000 --batch_size 32 \
      --exp_id r2-40k --is_condition_u0 True --is_condition_uT True \
      --is_model_w $W --resume True
  done
fi
if gate 1300 burgers_fopc; then
  for W in False True; do
    timeout 600 python apps/train_burgers.py --synthetic_data 40960 \
      --synthetic_partial_control front_rear_quarter \
      --train_num_steps 40000 --checkpoint_interval 10000 --batch_size 32 \
      --exp_id FOPC --is_condition_u0 True --is_condition_uT True \
      --is_model_w $W --resume True
  done
fi
if gate 1100 burgers_pofc; then
  for W in False True; do
    timeout 500 python apps/train_burgers.py --synthetic_data 40960 \
      --train_num_steps 30000 --checkpoint_interval 10000 --batch_size 32 \
      --exp_id POFC --partially_observed front_rear_quarter \
      --train_on_partially_observed front_rear_quarter \
      --is_condition_u0 True --is_condition_uT True \
      --is_model_w $W --resume True
  done
fi
if gate 900 burgers_popc; then
  for W in False True; do
    timeout 400 python apps/train_burgers.py --synthetic_data 40960 \
      --synthetic_partial_control front_rear_quarter \
      --train_num_steps 20000 --checkpoint_interval 10000 --batch_size 32 \
      --exp_id POPC --partially_observed front_rear_quarter \
      --train_on_partially_observed front_rear_quarter \
      --is_condition_u0 True --is_condition_uT True \
      --is_model_w $W --resume True
  done
fi

# ---- phase 2: inference
latest() { ls "$1/ckpt" 2>/dev/null | sort -n | tail -1; }

BCK=$(latest trained_models/burgers/r2-40k)
WCK=$(latest trained_models/burgers_w/r2-40k)
echo "burgers checkpoints: joint=$BCK w=$WCK"
if gate 750 burgers_fo_beta2; then
timeout 700 python apps/infer_burgers.py --exp_id r2-40k --exp_id__model_w r2-40k \
  --checkpoint "$BCK" --checkpoint__model_w "$WCK" \
  --synthetic_data 2048 --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True --eval_two_models True \
  --prior_beta 2.0 --w_scheduler sigmoid_flip --J_scheduler cosine \
  --wus 0 1000 --wfs 0 \
  --save_file burgers_results/r3_ck${BCK}_beta2.0.json || true
fi
if gate 750 burgers_fo_joint; then
timeout 700 python apps/infer_burgers.py --exp_id r2-40k \
  --checkpoint "$BCK" \
  --synthetic_data 2048 --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True \
  --wus 0 1000 --wfs 0 --J_scheduler cosine \
  --save_file burgers_results/r3_ck${BCK}_joint_only.json || true
fi

SCK=$(latest trained_models/smoke/r3)
SWCK=$(latest trained_models/smoke_w/r3)
if [ -n "$SCK" ] && [ -n "$SWCK" ] && gate 2300 smoke_eval; then
# n=16 held-out samples: the judge's explicit bar for a credible smoke row
timeout 2200 python apps/infer_smoke.py --dataset_path data/smoke \
  --joint_folder trained_models/smoke/r3 --w_folder trained_models/smoke_w/r3 \
  --diffusion_joint_checkpoint "$SCK" --diffusion_w_checkpoint "$SWCK" \
  --n_test_samples 16 --batch_size 4 --bf16 True --calibrate True || true
fi

JCK=$(latest trained_models/jellyfish)
JWCK=$(latest trained_models/jellyfish_w)
SUR=trained_models/surrogates
if [ -n "$JCK" ] && [ -n "$JWCK" ] && gate 2500 jelly_ddpm1000; then
timeout 2400 python apps/infer_jellyfish.py --dataset_path data/jellyfish \
  --joint_folder trained_models/jellyfish --w_folder trained_models/jellyfish_w \
  --surrogate_folder "$SUR" \
  --diffusion_joint_checkpoint "$JCK" --diffusion_w_checkpoint "$JWCK" \
  --n_test_samples 2 --batch_size 2 --sampling_timesteps 1000 \
  --scan_chunks 4 --bf16 True || true
fi
if gate 700 jelly_mpc; then
timeout 600 python apps/infer_jellyfish.py --dataset_path data/jellyfish \
  --surrogate_folder "$SUR" \
  --inference_method MPC --num_iters 20 --coef_grad 0.05 --lamda 1000 \
  --n_test_samples 4 --batch_size 4 || true
fi

FCK=$(latest trained_models/burgers/FOPC)
FWCK=$(latest trained_models/burgers_w/FOPC)
if [ -n "$FCK" ] && [ -n "$FWCK" ] && gate 750 burgers_fopc_infer; then
timeout 700 python apps/infer_burgers.py --exp_id FOPC --exp_id__model_w FOPC \
  --checkpoint "$FCK" --checkpoint__model_w "$FWCK" \
  --synthetic_data 2048 --synthetic_partial_control front_rear_quarter \
  --partial_control front_rear_quarter \
  --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True --eval_two_models True \
  --prior_beta 2.0 --w_scheduler sigmoid_flip --J_scheduler cosine \
  --wus 0 1000 --wfs 0 \
  --save_file burgers_results/r3_FOPC_beta2.0.json || true
fi

PCK=$(latest trained_models/burgers/POFC)
PWCK=$(latest trained_models/burgers_w/POFC)
if [ -n "$PCK" ] && [ -n "$PWCK" ] && gate 750 burgers_pofc_infer; then
timeout 700 python apps/infer_burgers.py --exp_id POFC --exp_id__model_w POFC \
  --checkpoint "$PCK" --checkpoint__model_w "$PWCK" \
  --synthetic_data 2048 --n_test_samples 50 --batch_size 50 \
  --partially_observed front_rear_quarter \
  --is_condition_u0 True --is_condition_uT True --eval_two_models True \
  --prior_beta 2.0 --w_scheduler sigmoid_flip --J_scheduler cosine \
  --wus 0 1000 --wfs 0 \
  --save_file burgers_results/r3_POFC_beta2.0.json || true
fi

QCK=$(latest trained_models/burgers/POPC)
QWCK=$(latest trained_models/burgers_w/POPC)
if [ -n "$QCK" ] && [ -n "$QWCK" ] && gate 750 burgers_popc_infer; then
timeout 700 python apps/infer_burgers.py --exp_id POPC --exp_id__model_w POPC \
  --checkpoint "$QCK" --checkpoint__model_w "$QWCK" \
  --synthetic_data 2048 --synthetic_partial_control front_rear_quarter \
  --partial_control front_rear_quarter \
  --n_test_samples 50 --batch_size 50 \
  --partially_observed front_rear_quarter \
  --is_condition_u0 True --is_condition_uT True --eval_two_models True \
  --prior_beta 2.0 --w_scheduler sigmoid_flip --J_scheduler cosine \
  --wus 0 1000 --wfs 0 \
  --save_file burgers_results/r3_POPC_beta2.0.json || true
fi

# ---- phase 3: bench with UNet3D secondary metrics (VERDICT #6)
if gate 1500 bench_full; then
timeout 1400 python bench.py --full > /tmp/bench_full_r3.json 2>/tmp/bench_full_r3.err || true
cat /tmp/bench_full_r3.json
fi

# ---- phase 4 (best-effort): rescore one jellyfish RL baseline under the
# shared objective convention
if gate 1300 jelly_bc_rescore; then
timeout 1200 python apps/train_baselines_jellyfish.py --method bc \
  --save_file jellyfish_results/baselines_r3.json || true
fi

echo "R3C CAMPAIGN CHAIN DONE $(date -u +%H:%M:%S)"
