#!/bin/bash
# TPU equivalent of /root/reference/scripts/smoke_train_joint.sh
set -e
cd "$(dirname "$0")/.."
python apps/train_smoke.py --dataset_path data/smoke --is_w_model False
