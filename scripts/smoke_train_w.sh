#!/bin/bash
set -e
cd "$(dirname "$0")/.."
python apps/train_smoke.py --dataset_path data/smoke --is_w_model True
