#!/bin/bash
# Round-3 chip campaign, part B: everything after the long smoke-joint run.
# Launched by a watcher when the smoke_joint stage's process exits.
#
# Budget notes (single v5e chip, serialized):
# - only the FORCE surrogate is retrained for the real pressure-force labels
#   (VERDICT #2): the simulator and boundary-updater never consumed force
#   labels, so their r2 checkpoints remain valid.
# - the jellyfish EBM/thetas models keep their r2 checkpoints; the round's
#   chip-hours go to the smoke scale-up (VERDICT #1) and the Burgers 100k
#   extension + FOPC partial-control setting (VERDICT #4/#5).
cd "$(dirname "$0")/.."
# Order = judge priority under a tight wall clock: the force surrogate
# (VERDICT #2, cheap) and the w model (completes the smoke two-model eval,
# VERDICT #1) first, then the cheap burgers extensions, and INFERENCE
# BEFORE the best-effort baseline re-scoring.
STAGES=${STAGES:-"midgrain jelly_force smoke_w burgers_ext burgers_fopc burgers_po burgers_popc infer jelly_baselines"}

SMOKE_W_SECS=${SMOKE_W_SECS:-2700}
# Hard wall-clock deadline (epoch secs) after which remaining TRAINING
# stages are skipped so that inference always gets its slot before the
# round ends. infer/jelly_baselines are exempt from the gate.
TRAIN_DEADLINE=${TRAIN_DEADLINE:-0}

for st in $STAGES; do
echo "=== STAGE $st $(date -u +%H:%M:%S)"
if [ "$TRAIN_DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt "$TRAIN_DEADLINE" ] \
   && [ "$st" != infer ] && [ "$st" != jelly_baselines ]; then
  echo "=== deadline passed; skipping $st"
  continue
fi
case $st in
midgrain)
  # VERDICT #7: the bounded mid-grain Pallas experiment (fused ResBlock-pair
  # kernel vs per-block vs XLA); measured numbers land in PERF.md either way
  timeout 900 python scripts/bench_midgrain_pallas.py \
    > /tmp/midgrain_r3.log 2>&1 || true
  tail -3 /tmp/midgrain_r3.log
  ;;
burgers_ext)
  # VERDICT #4: drive the r2-40k pair to 100k steps (cos10000 LR minima)
  for W in False True; do
    timeout 1600 python apps/train_burgers.py --synthetic_data 40960 \
      --train_num_steps 100000 --checkpoint_interval 10000 --batch_size 32 \
      --exp_id r2-40k --is_condition_u0 True --is_condition_uT True \
      --is_model_w $W --resume True
  done
  ;;
burgers_fopc)
  # The reference's headline FOPC setting: PARTIAL-CONTROL dataset
  # (free_u_f_1e5_front_rear_quarter, scripts/burgers_train_full_obs_partial_ctr.sh)
  for W in False True; do
    timeout 1200 python apps/train_burgers.py --synthetic_data 40960 \
      --synthetic_partial_control front_rear_quarter \
      --train_num_steps 40000 --checkpoint_interval 10000 --batch_size 32 \
      --exp_id FOPC --is_condition_u0 True --is_condition_uT True \
      --is_model_w $W --resume True
  done
  ;;
burgers_po)
  # VERDICT #5: POFC (partial obs, FULL control: reference free_u_f_1e5)
  for W in False True; do
    timeout 900 python apps/train_burgers.py --synthetic_data 40960 \
      --train_num_steps 30000 --checkpoint_interval 10000 --batch_size 32 \
      --exp_id POFC --partially_observed front_rear_quarter \
      --train_on_partially_observed front_rear_quarter \
      --is_condition_u0 True --is_condition_uT True \
      --is_model_w $W --resume True
  done
  ;;
smoke_w)
  timeout $SMOKE_W_SECS python apps/train_smoke.py \
    --dataset_path data/smoke --train_num_steps 40000 \
    --checkpoint_interval 2000 --batch_size 4 --is_w_model True \
    --bf16 False --remat_all True --resume True \
    --results_folder trained_models/smoke_w/r3
  ;;
burgers_popc)
  # POPC: partial observation AND partial control — the 4th cell of the
  # reference's experiment grid (BC_burgers/train_infer_POPC.py)
  for W in False True; do
    timeout 700 python apps/train_burgers.py --synthetic_data 40960 \
      --synthetic_partial_control front_rear_quarter \
      --train_num_steps 20000 --checkpoint_interval 10000 --batch_size 32 \
      --exp_id POPC --partially_observed front_rear_quarter \
      --train_on_partially_observed front_rear_quarter \
      --is_condition_u0 True --is_condition_uT True \
      --is_model_w $W --resume True
  done
  ;;
jelly_force)
  # fresh ForceUNet on the real pressure-force labels, into the shared
  # surrogates folder (supersedes the r2 pseudo-label force model)
  timeout 1800 python apps/train_surrogates_jellyfish.py \
    --dataset_path data/jellyfish --model force --num_steps 3000 \
    --save_every 1000 \
    --results_folder trained_models/surrogates
  ;;
jelly_baselines)
  # re-score RL baselines under the shared jellyfish_objective convention
  # and the real-label force surrogate (old rows used 3 inconsistent Js)
  timeout 1100 python apps/train_baselines_jellyfish.py --method bc \
    --save_file jellyfish_results/baselines_r3.json || true
  timeout 1100 python apps/train_baselines_jellyfish.py --method bc \
    --partially_observed True \
    --save_file jellyfish_results/baselines_r3.json || true
  timeout 1400 python apps/train_baselines_jellyfish.py --method bppo \
    --save_file jellyfish_results/baselines_r3.json || true
  timeout 1400 python apps/train_baselines_jellyfish.py --method sac \
    --save_file jellyfish_results/baselines_r3.json || true
  ;;
infer)
  bash scripts/infer_r3.sh || true
  ;;
esac
done
echo "R3B CAMPAIGN CHAIN DONE"
