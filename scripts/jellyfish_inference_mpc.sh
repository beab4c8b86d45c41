#!/bin/bash
# Receding-horizon MPC baseline (reference inference_2d_jellyfish.py --inference_method MPC)
set -e
cd "$(dirname "$0")/.."
python apps/infer_jellyfish.py --inference_method MPC --num_iters 30 --coef_grad 0.05 --lamda 1000 "$@"
