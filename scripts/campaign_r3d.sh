#!/bin/bash
# Round-3 chip campaign, part D: relaunch of part-C's unfinished tail after
# the controller was killed mid burgers_fopc (its PO stages checkpointed every
# 10k steps but were clock-cut at ~8-9k, persisting nothing).
#
# Fixes vs part C:
# - PO training stages use --checkpoint_interval 2000 so every clock cut
#   still persists the last 2k-step multiple;
# - latest() filters to purely numeric checkpoint ids (a stale
#   *.orbax-checkpoint-tmp dir otherwise wins the sort and breaks inference);
# - stage order = judge priority: smoke n=16 eval first, jellyfish DDPM-1000
#   chunked second, burgers FO 40k sweep third, then FOPC train+infer,
#   then POFC/POPC as best-effort stretch.
#
# Invariants: ONE TPU process at a time; every block gated so the chip is
# free before the driver's end-of-round bench run.
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

# ---- 1. burgers FO inference at the 40k pair (north-star metric; cheap)
BCK=$(latest trained_models/burgers/r2-40k)
WCK=$(latest trained_models/burgers_w/r2-40k)
echo "burgers checkpoints: joint=$BCK w=$WCK"
if gate 700 burgers_fo_beta2; then
timeout 650 python apps/infer_burgers.py --exp_id r2-40k --exp_id__model_w r2-40k \
  --checkpoint "$BCK" --checkpoint__model_w "$WCK" \
  --synthetic_data 2048 --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True --eval_two_models True \
  --prior_beta 2.0 --w_scheduler sigmoid_flip --J_scheduler cosine \
  --wus 0 1000 --wfs 0 \
  --save_file burgers_results/r3_ck${BCK}_beta2.0.json || true
fi

# ---- 2. smoke held-out eval, n=16 with calibration rows (judge bar #1)
SCK=$(latest trained_models/smoke/r3)
SWCK=$(latest trained_models/smoke_w/r3)
if [ -n "$SCK" ] && [ -n "$SWCK" ] && gate 2300 smoke_eval; then
timeout 2200 python apps/infer_smoke.py --dataset_path data/smoke \
  --joint_folder trained_models/smoke/r3 --w_folder trained_models/smoke_w/r3 \
  --diffusion_joint_checkpoint "$SCK" --diffusion_w_checkpoint "$SWCK" \
  --n_test_samples 16 --batch_size 4 --bf16 True --calibrate True || true
fi

# ---- 3. jellyfish DDPM-1000 chunked on chip + closed-loop scoring (#2/#3)
JCK=$(latest trained_models/jellyfish)
JWCK=$(latest trained_models/jellyfish_w)
SUR=trained_models/surrogates
if [ -n "$JCK" ] && [ -n "$JWCK" ] && gate 2400 jelly_ddpm1000; then
timeout 2300 python apps/infer_jellyfish.py --dataset_path data/jellyfish \
  --joint_folder trained_models/jellyfish --w_folder trained_models/jellyfish_w \
  --surrogate_folder "$SUR" \
  --diffusion_joint_checkpoint "$JCK" --diffusion_w_checkpoint "$JWCK" \
  --n_test_samples 2 --batch_size 2 --sampling_timesteps 1000 \
  --scan_chunks 4 --bf16 True || true
fi

# ---- 4. FOPC pair with checkpoint_interval 2000, then its inference (#5)
if gate 1000 burgers_fopc; then
  for W in False True; do
    timeout 450 python apps/train_burgers.py --synthetic_data 40960 \
      --synthetic_partial_control front_rear_quarter \
      --train_num_steps 40000 --checkpoint_interval 2000 --batch_size 32 \
      --exp_id FOPC --is_condition_u0 True --is_condition_uT True \
      --is_model_w $W --resume True
  done
fi
FCK=$(latest trained_models/burgers/FOPC)
FWCK=$(latest trained_models/burgers_w/FOPC)
if [ -n "$FCK" ] && [ -n "$FWCK" ] && gate 650 burgers_fopc_infer; then
timeout 600 python apps/infer_burgers.py --exp_id FOPC --exp_id__model_w FOPC \
  --checkpoint "$FCK" --checkpoint__model_w "$FWCK" \
  --synthetic_data 2048 --synthetic_partial_control front_rear_quarter \
  --partial_control front_rear_quarter \
  --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True --eval_two_models True \
  --prior_beta 2.0 --w_scheduler sigmoid_flip --J_scheduler cosine \
  --wus 0 1000 --wfs 0 \
  --save_file burgers_results/r3_FOPC_beta2.0.json || true
fi

# ---- 5. stretch: POFC pair + inference
if gate 800 burgers_pofc; then
  for W in False True; do
    timeout 350 python apps/train_burgers.py --synthetic_data 40960 \
      --train_num_steps 30000 --checkpoint_interval 2000 --batch_size 32 \
      --exp_id POFC --partially_observed front_rear_quarter \
      --train_on_partially_observed front_rear_quarter \
      --is_condition_u0 True --is_condition_uT True \
      --is_model_w $W --resume True
  done
fi
PCK=$(latest trained_models/burgers/POFC)
PWCK=$(latest trained_models/burgers_w/POFC)
if [ -n "$PCK" ] && [ -n "$PWCK" ] && gate 650 burgers_pofc_infer; then
timeout 600 python apps/infer_burgers.py --exp_id POFC --exp_id__model_w POFC \
  --checkpoint "$PCK" --checkpoint__model_w "$PWCK" \
  --synthetic_data 2048 --n_test_samples 50 --batch_size 50 \
  --partially_observed front_rear_quarter \
  --is_condition_u0 True --is_condition_uT True --eval_two_models True \
  --prior_beta 2.0 --w_scheduler sigmoid_flip --J_scheduler cosine \
  --wus 0 1000 --wfs 0 \
  --save_file burgers_results/r3_POFC_beta2.0.json || true
fi

# ---- 6. stretch: POPC pair + inference
if gate 700 burgers_popc; then
  for W in False True; do
    timeout 300 python apps/train_burgers.py --synthetic_data 40960 \
      --synthetic_partial_control front_rear_quarter \
      --train_num_steps 20000 --checkpoint_interval 2000 --batch_size 32 \
      --exp_id POPC --partially_observed front_rear_quarter \
      --train_on_partially_observed front_rear_quarter \
      --is_condition_u0 True --is_condition_uT True \
      --is_model_w $W --resume True
  done
fi
QCK=$(latest trained_models/burgers/POPC)
QWCK=$(latest trained_models/burgers_w/POPC)
if [ -n "$QCK" ] && [ -n "$QWCK" ] && gate 650 burgers_popc_infer; then
timeout 600 python apps/infer_burgers.py --exp_id POPC --exp_id__model_w POPC \
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

# ---- 7. stretch: joint-only FO row at 40k for the prior-reweighting ablation
if gate 650 burgers_fo_joint; then
timeout 600 python apps/infer_burgers.py --exp_id r2-40k \
  --checkpoint "$BCK" \
  --synthetic_data 2048 --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True \
  --wus 0 1000 --wfs 0 --J_scheduler cosine \
  --save_file burgers_results/r3_ck${BCK}_joint_only.json || true
fi

# ---- 8. stretch: jellyfish MPC at n=4 under the shared objective
if gate 650 jelly_mpc; then
timeout 600 python apps/infer_jellyfish.py --dataset_path data/jellyfish \
  --surrogate_folder "$SUR" \
  --inference_method MPC --num_iters 20 --coef_grad 0.05 --lamda 1000 \
  --n_test_samples 4 --batch_size 4 || true
fi

echo "R3D CAMPAIGN CHAIN DONE $(date -u +%H:%M:%S)"
