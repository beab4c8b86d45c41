#!/bin/bash
# TPU equivalent of the reference POFC inference config
# (/root/reference/scripts/burgers_inference_partial_obs_full_ctr.sh:
#  prior_beta 2.5, w_scheduler sigmoid_flip, unobserved zeroed in sampling)
set -e
cd "$(dirname "$0")/.."
python apps/infer_burgers.py \
    --dataset free_u_f_1e5 \
    --partially_observed front_rear_quarter \
    --train_on_partially_observed front_rear_quarter \
    --set_unobserved_to_zero_during_sampling True \
    --is_condition_u0 True --is_condition_uT True \
    --J_scheduler cosine --dim 128 --dim_muls 1 2 4 8 \
    --exp_id POFC --checkpoint 170 \
    --exp_id__model_w POFC_w --checkpoint__model_w 90 \
    --eval_two_models True --prior_beta 2.5 --w_scheduler sigmoid_flip \
    --save_file burgers_results/partial_obs_full_ctr/result.json
