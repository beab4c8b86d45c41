#!/bin/bash
set -e
cd "$(dirname "$0")/.."
python apps/infer_jellyfish.py --dataset_path data/jellyfish \
    --cond_steps 1 --only_vis_pressure True
