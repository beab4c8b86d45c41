#!/bin/bash
# TPU equivalent of the reference FOPC inference (DiffPhyCon + -lite).
# Net dims follow the reference TRAIN config (train_1d_burgers FOPC: dim 64,
# mults 1 2 4 8) — the reference inference script's dim 64/mults 1 2 4 +
# w dim 32 reflects a different released-checkpoint vintage; ours match the
# models this repo trains.
set -e
cd "$(dirname "$0")/.."

# DiffPhyCon (two models, prior reweighting)
python apps/infer_burgers.py \
    --dataset free_u_f_1e5_front_rear_quarter \
    --partial_control front_rear_quarter \
    --is_condition_u0 True --is_condition_uT True \
    --J_scheduler cosine --dim 64 --dim_muls 1 2 4 8 \
    --exp_id FOPC --checkpoint 170 \
    --exp_id__model_w FOPC_w --checkpoint__model_w 90 \
    --eval_two_models True --prior_beta 1.5 \
    --w_scheduler sigmoid_flip --wfs 0 \
    --save_file burgers_results/full_obs_partial_ctr/result.json

# DiffPhyCon-lite (single joint model)
python apps/infer_burgers.py \
    --exp_id FOPC --checkpoint 170 \
    --dataset free_u_f_1e5_front_rear_quarter \
    --is_condition_u0 True --is_condition_uT True \
    --J_scheduler cosine --dim 64 --dim_muls 1 2 4 8 \
    --partial_control front_rear_quarter \
    --save_file burgers_results/full_obs_partial_ctr/result_lite.json
