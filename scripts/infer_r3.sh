#!/bin/bash
# Round-3 inference stage: evaluate everything trained this round.
# Blocks are ordered by judge priority (VERDICT r2 "Next round") so that if
# the round's wall clock runs out mid-stage, the most important results are
# already on disk: burgers 100k FO (#4, cheapest + north-star) -> smoke scaled eval (#1)
# -> jellyfish DDPM-1000 with real-label surrogates (#2/#3) -> FOPC/POFC/POPC
# (#5) -> bench with UNet3D secondary metrics (#6).
# Each block tolerates failure so later blocks still run.
cd "$(dirname "$0")/.."

latest() { ls "$1/ckpt" 2>/dev/null | sort -n | tail -1; }

# ---- Burgers: 100k-step checkpoints, EMA, prior_beta sweep (VERDICT #4)
BCK=$(latest trained_models/burgers/r2-40k)
WCK=$(latest trained_models/burgers_w/r2-40k)
echo "burgers checkpoints: joint=$BCK w=$WCK"
for beta in 2.0 3.0; do
timeout 900 python apps/infer_burgers.py --exp_id r2-40k --exp_id__model_w r2-40k \
  --checkpoint "$BCK" --checkpoint__model_w "$WCK" \
  --synthetic_data 2048 --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True --eval_two_models True \
  --prior_beta $beta --w_scheduler sigmoid_flip --J_scheduler cosine \
  --wus 0 1000 --wfs 0 \
  --save_file burgers_results/r3_ck${BCK}_beta${beta}.json || true
done
timeout 900 python apps/infer_burgers.py --exp_id r2-40k \
  --checkpoint "$BCK" \
  --synthetic_data 2048 --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True \
  --wus 0 1000 --wfs 0 --J_scheduler cosine \
  --save_file burgers_results/r3_ck${BCK}_joint_only.json || true

# ---- Smoke: held-out eval with calibration rows (VERDICT #1)
SCK=$(latest trained_models/smoke/r3)
SWCK=$(latest trained_models/smoke_w/r3)
if [ -n "$SCK" ] && [ -n "$SWCK" ]; then
timeout 3600 python apps/infer_smoke.py --dataset_path data/smoke \
  --joint_folder trained_models/smoke/r3 --w_folder trained_models/smoke_w/r3 \
  --diffusion_joint_checkpoint "$SCK" --diffusion_w_checkpoint "$SWCK" \
  --n_test_samples 16 --batch_size 4 --bf16 True --calibrate True || true
fi

# ---- Jellyfish: DDPM-1000 via chunked scan + real-label surrogates (#2, #3)
JCK=$(latest trained_models/jellyfish)
JWCK=$(latest trained_models/jellyfish_w)
SUR=trained_models/surrogates_r3
[ -d "$SUR/force" ] || SUR=trained_models/surrogates
if [ -n "$JCK" ] && [ -n "$JWCK" ]; then
timeout 3300 python apps/infer_jellyfish.py --dataset_path data/jellyfish \
  --joint_folder trained_models/jellyfish --w_folder trained_models/jellyfish_w \
  --surrogate_folder "$SUR" \
  --diffusion_joint_checkpoint "$JCK" --diffusion_w_checkpoint "$JWCK" \
  --n_test_samples 4 --batch_size 2 --sampling_timesteps 1000 \
  --scan_chunks 4 --bf16 True || true
fi
timeout 1500 python apps/infer_jellyfish.py --dataset_path data/jellyfish \
  --surrogate_folder "$SUR" \
  --inference_method MPC --num_iters 20 --coef_grad 0.05 --lamda 1000 \
  --n_test_samples 8 --batch_size 4 || true

# ---- Burgers FOPC: the reference's headline partial-control setting
FCK=$(latest trained_models/burgers/FOPC)
FWCK=$(latest trained_models/burgers_w/FOPC)
if [ -n "$FCK" ] && [ -n "$FWCK" ]; then
for beta in 1.5 2.0; do
timeout 900 python apps/infer_burgers.py --exp_id FOPC --exp_id__model_w FOPC \
  --checkpoint "$FCK" --checkpoint__model_w "$FWCK" \
  --synthetic_data 2048 --synthetic_partial_control front_rear_quarter \
  --partial_control front_rear_quarter \
  --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True --eval_two_models True \
  --prior_beta $beta --w_scheduler sigmoid_flip --J_scheduler cosine \
  --wus 0 1000 --wfs 0 \
  --save_file burgers_results/r3_FOPC_beta${beta}.json || true
done
timeout 900 python apps/infer_burgers.py --exp_id FOPC \
  --checkpoint "$FCK" \
  --synthetic_data 2048 --synthetic_partial_control front_rear_quarter \
  --partial_control front_rear_quarter \
  --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True \
  --wus 0 1000 --wfs 0 --J_scheduler cosine \
  --save_file burgers_results/r3_FOPC_joint_only.json || true
fi

# ---- Burgers partial observation (VERDICT #5)
PCK=$(latest trained_models/burgers/POFC)
PWCK=$(latest trained_models/burgers_w/POFC)
if [ -n "$PCK" ] && [ -n "$PWCK" ]; then
for beta in 1.5 2.0; do
timeout 900 python apps/infer_burgers.py --exp_id POFC --exp_id__model_w POFC \
  --checkpoint "$PCK" --checkpoint__model_w "$PWCK" \
  --synthetic_data 2048 --n_test_samples 50 --batch_size 50 \
  --partially_observed front_rear_quarter \
  --is_condition_u0 True --is_condition_uT True --eval_two_models True \
  --prior_beta $beta --w_scheduler sigmoid_flip --J_scheduler cosine \
  --wus 0 1000 --wfs 0 \
  --save_file burgers_results/r3_POFC_beta${beta}.json || true
done
fi

# ---- Burgers POPC (partial observation + partial control)
QCK=$(latest trained_models/burgers/POPC)
QWCK=$(latest trained_models/burgers_w/POPC)
if [ -n "$QCK" ] && [ -n "$QWCK" ]; then
timeout 900 python apps/infer_burgers.py --exp_id POPC --exp_id__model_w POPC \
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

# ---- Bench with UNet3D secondary metrics (VERDICT #6)
timeout 2700 python bench.py --full > /tmp/bench_full_r3.json || true
cat /tmp/bench_full_r3.json
echo "INFER R3 DONE"
