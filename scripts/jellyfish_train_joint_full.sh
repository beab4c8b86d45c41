#!/bin/bash
# TPU equivalent of /root/reference/scripts/jellyfish_train_joint_full.sh
set -e
cd "$(dirname "$0")/.."
python apps/train_jellyfish.py --dataset_path data/jellyfish \
    --model_type states --cond_steps 1
