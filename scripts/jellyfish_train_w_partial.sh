#!/bin/bash
set -e
cd "$(dirname "$0")/.."
python apps/train_jellyfish.py --dataset_path data/jellyfish \
    --model_type thetas --cond_steps 1 --only_vis_pressure True
