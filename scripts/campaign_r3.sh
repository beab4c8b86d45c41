#!/bin/bash
# Round-3 chip campaign (VERDICT r2 "Next round"): one serialized TPU
# pipeline. Stages are individually resumable; a stage failure does not
# abort the chain. Stage selection via $STAGES (default: all, in order).
cd "$(dirname "$0")/.."
STAGES=${STAGES:-"smoke_joint smoke_w burgers_ext burgers_po jellyfish infer"}

SMOKE_JOINT_SECS=${SMOKE_JOINT_SECS:-12600}   # 3.5h wall budget
SMOKE_W_SECS=${SMOKE_W_SECS:-4200}            # ~1.2h
SMOKE_BS=${SMOKE_BS:-4}
# NOTE: bf16 and batch>=8 train steps crash the remote compile
# helper on this runtime (HTTP 500, measured r3); fp32 batch 4
# remat_all is the proven config.
SMOKE_BF16=${SMOKE_BF16:-False}

for st in $STAGES; do
case $st in
smoke_joint)
  # VERDICT #1: joint 6ch UNet3D on the 512-sim dataset, big step budget
  timeout $SMOKE_JOINT_SECS python apps/train_smoke.py \
    --dataset_path data/smoke --train_num_steps 40000 \
    --checkpoint_interval 2000 --batch_size $SMOKE_BS --is_w_model False \
    --bf16 $SMOKE_BF16 --remat_all True --resume True \
    --results_folder trained_models/smoke/r3
  ;;
smoke_w)
  timeout $SMOKE_W_SECS python apps/train_smoke.py \
    --dataset_path data/smoke --train_num_steps 40000 \
    --checkpoint_interval 2000 --batch_size $SMOKE_BS --is_w_model True \
    --bf16 $SMOKE_BF16 --remat_all True --resume True \
    --results_folder trained_models/smoke_w/r3
  ;;
burgers_ext)
  # VERDICT #4: drive the r2-40k pair to 100k steps (cos10000 LR minima)
  for W in False True; do
    timeout 3000 python apps/train_burgers.py --synthetic_data 40960 \
      --train_num_steps 100000 --checkpoint_interval 10000 --batch_size 32 \
      --exp_id r2-40k --is_condition_u0 True --is_condition_uT True \
      --is_model_w $W --resume True
  done
  ;;
burgers_po)
  # VERDICT #5: partial-observation pairs (POFC: full control)
  for W in False True; do
    timeout 1200 python apps/train_burgers.py --synthetic_data 40960 \
      --train_num_steps 30000 --checkpoint_interval 10000 --batch_size 32 \
      --exp_id POFC --partially_observed front_rear_quarter \
      --train_on_partially_observed front_rear_quarter \
      --is_condition_u0 True --is_condition_uT True \
      --is_model_w $W --resume True
  done
  ;;
jellyfish)
  # VERDICT #2: surrogates on REAL pressure-force labels, then EBM/thetas
  for m in force simulator boundary_updater; do
    timeout 2400 python apps/train_surrogates_jellyfish.py \
      --dataset_path data/jellyfish --model $m --num_steps 6000 \
      --save_every 2000 --resume_training True \
      --results_folder trained_models/surrogates_r3
  done
  for MT in states thetas; do
    timeout 3600 python apps/train_jellyfish.py --dataset_path data/jellyfish \
      --model_type $MT --train_num_steps 5000 --checkpoint_interval 1000 \
      --batch_size 4 --resume True
  done
  ;;
infer)
  bash scripts/infer_r3.sh || true
  ;;
esac
done
echo "R3 CAMPAIGN CHAIN DONE"
