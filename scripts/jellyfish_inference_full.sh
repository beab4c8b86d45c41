#!/bin/bash
# TPU equivalent of /root/reference/scripts/jellyfish_inference_full.sh
set -e
cd "$(dirname "$0")/.."
python apps/infer_jellyfish.py --dataset_path data/jellyfish \
    --cond_steps 1 --standard_fixed_ratio 0.01 --reg_ratio 0
