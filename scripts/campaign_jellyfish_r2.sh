#!/bin/bash
# Round-2 jellyfish campaign (VERDICT r1 #2): train the 3 surrogates, the
# states EBM joint model and the thetas prior on synthetic data, then drive
# guided DDPM inference (EBM grad-of-grad + bd-updater-in-loop) on the chip
# and the receding-horizon MPC baseline.
set -e
cd "$(dirname "$0")/.."
SUR_STEPS=${SUR_STEPS:-3000}
DIF_STEPS=${DIF_STEPS:-3000}
CKPT=${CKPT:-1000}
MS=$((DIF_STEPS / CKPT))

for m in force simulator boundary_updater; do
  python apps/train_surrogates_jellyfish.py --dataset_path data/jellyfish \
    --model $m --num_steps $SUR_STEPS --save_every 1000 --resume_training True
done

python apps/train_jellyfish.py --dataset_path data/jellyfish \
  --model_type states --train_num_steps $DIF_STEPS --checkpoint_interval $CKPT \
  --batch_size 4 --resume True
python apps/train_jellyfish.py --dataset_path data/jellyfish \
  --model_type thetas --train_num_steps $DIF_STEPS --checkpoint_interval $CKPT \
  --batch_size 4 --resume True

python apps/infer_jellyfish.py --dataset_path data/jellyfish \
  --joint_folder trained_models/jellyfish --w_folder trained_models/jellyfish_w \
  --surrogate_folder trained_models/surrogates \
  --diffusion_joint_checkpoint $MS --diffusion_w_checkpoint $MS \
  --n_test_samples 4 --batch_size 4 --sampling_timesteps 1000

python apps/infer_jellyfish.py --dataset_path data/jellyfish \
  --surrogate_folder trained_models/surrogates \
  --inference_method MPC --num_iters 20 --coef_grad 0.05 --lamda 1000 \
  --n_test_samples 4 --batch_size 4
echo "JELLYFISH CAMPAIGN DONE"
