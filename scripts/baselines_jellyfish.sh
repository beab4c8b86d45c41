#!/bin/bash
# RL baselines on jellyfish (reference baselines/{BC,BPPO}_jellyfish, sac_jellyfish)
# FO + PO (partial observation) variants, as in main_FO.py / main_PO.py and
# pde_2d_sac_train{,_pob}.py
set -e
cd "$(dirname "$0")/.."
for po in False True; do
  python apps/train_baselines_jellyfish.py --method bc  --partially_observed $po "$@"
  python apps/train_baselines_jellyfish.py --method bppo --partially_observed $po "$@"
  python apps/train_baselines_jellyfish.py --method sac --partially_observed $po "$@"
done
