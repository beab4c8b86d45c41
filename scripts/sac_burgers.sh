#!/bin/bash
# Online SAC baseline for Burgers (reference baselines/sac_burgers/sac_burgers.sh).
cd "$(dirname "$0")/.."

# Full observation, partial control (front/rear quarter), online
python apps/train_sac_burgers.py --reward_f 0 \
    --partial_control front_rear_quarter \
    --save_file burgers_results/sac_fob_pctr.json

# Full observation, full control, online
python apps/train_sac_burgers.py --reward_f 0 \
    --save_file burgers_results/sac_fob_fctr.json
