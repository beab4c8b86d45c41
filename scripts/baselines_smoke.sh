#!/bin/bash
# RL baselines on smoke (reference baselines/{BC,BPPO}_smoke, sac_smoke)
set -e
cd "$(dirname "$0")/.."
python apps/train_baselines_smoke.py --method bc  --save_file smoke_results/baselines.json "$@"
python apps/train_baselines_smoke.py --method bppo --save_file smoke_results/baselines.json "$@"
python apps/train_baselines_smoke.py --method sac --save_file smoke_results/baselines.json "$@"
