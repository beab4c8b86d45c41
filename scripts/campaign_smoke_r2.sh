#!/bin/bash
# Round-2 smoke campaign (VERDICT r1 #2): train joint (6ch) + w (2ch) video
# DDPMs on generated scenario data, then run the two-model DDIM inference
# with on-device re-simulation and report J_total/J_target/J_energy.
set -e
cd "$(dirname "$0")/.."
STEPS=${STEPS:-4000}
CKPT=${CKPT:-1000}
BS=${BS:-8}
MS=$((STEPS / CKPT))

python apps/train_smoke.py --dataset_path data/smoke --train_num_steps $STEPS \
  --checkpoint_interval $CKPT --batch_size $BS --is_w_model False \
  --remat_all True --resume True

python apps/train_smoke.py --dataset_path data/smoke --train_num_steps $STEPS \
  --checkpoint_interval $CKPT --batch_size $BS --is_w_model True \
  --remat_all True --resume True

python apps/infer_smoke.py --dataset_path data/smoke \
  --joint_folder trained_models/smoke --w_folder trained_models/smoke_w \
  --diffusion_joint_checkpoint $MS --diffusion_w_checkpoint $MS \
  --n_test_samples 4 --batch_size 4
echo "SMOKE CAMPAIGN DONE"
