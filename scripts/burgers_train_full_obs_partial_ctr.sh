#!/bin/bash
# TPU equivalent of the reference FOPC training config
# (/root/reference/scripts/burgers_train_full_obs_partial_ctr.sh)
set -e
cd "$(dirname "$0")/.."

# train p(u, w)
python apps/train_burgers.py \
    --is_condition_u0 True --is_condition_uT True \
    --exp_id FOPC --dim 64 --dim_muls 1 2 4 8 \
    --dataset free_u_f_1e5_front_rear_quarter \
    --train_num_steps 200000 --checkpoint_interval 1000

# train p(w)
python apps/train_burgers.py \
    --is_condition_u0 True --is_condition_uT True \
    --exp_id FOPC_w --dim 64 --dim_muls 1 2 4 8 \
    --dataset free_u_f_1e5_front_rear_quarter \
    --train_num_steps 200000 --checkpoint_interval 1000 \
    --is_model_w True
