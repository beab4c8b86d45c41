#!/bin/bash
# TPU equivalent of /root/reference/scripts/smoke_inference.sh
set -e
cd "$(dirname "$0")/.."
python apps/infer_smoke.py --dataset_path data/smoke \
    --diffusion_joint_checkpoint 50 --diffusion_w_checkpoint 17 \
    --w_prob_exp 0.97 --standard_fixed_ratio 100000 \
    --using_ddim True --ddim_eta 1.0 --ddim_sampling_steps 100
