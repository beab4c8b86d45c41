#!/bin/bash
# Jellyfish disjoint-split rescoring demo at micro scale, CPU-only
# (VERDICT r4 #5: the --score_surrogate_folder / --rescore_thetas plumbing
# landed in r4 but was never executed; the r5 fresh VM erased the r2 models
# and the chip budget went to the smoke/burgers chains, so this demonstrates
# the full chain MECHANICALLY: synthetic data -> two disjoint surrogate sets
# (sims 0-15 vs 16-31) -> EBM states + thetas diffusion -> guided DDPM
# -> closed-loop score through the GUIDANCE surrogates vs through the
# DISJOINT surrogates on the same sampled thetas).
#
# Micro sizes (dim 16, frames 8, ~100-200 steps) are plumbing-scale, not
# competence-scale; the row is recorded with convention
# "micro_cpu_disjoint_demo" so it cannot be mistaken for a benchmark score.
#
# CPU-pinned (JAX_PLATFORM_NAME, the axon plugin ignores JAX_PLATFORMS) and
# niced: the one-core host must keep serving the chip campaign first.
set -u
cd /root/repo
export JAX_PLATFORM_NAME=cpu
LOG=/tmp/r5_jfmicro.log
log() { echo "[jfmicro $(date -u +%H:%M:%S)] $*" >> "$LOG"; }
run() { # run <name> <timeout_s> <args...>
  local name=$1 t=$2; shift 2
  log "start $name: $*"
  nice -n 19 timeout -s TERM --kill-after=60 "$t" \
    python -u "$@" >> "$LOG" 2>&1
  log "end $name rc=$?"
}

DIM="--dim 16 --dim_mults 1 2"
FR="--frames 8"

# 1. synthetic data: 32 train sims + 4 test sims
if [ ! -d data/jellyfish/test_data/states ]; then
  log "generating synthetic jellyfish data"
  nice -n 19 timeout 1800 python -u -c "
from diffphycon_tpu.training.data import synthetic_jellyfish
synthetic_jellyfish(32, 'data/jellyfish/train_data', seed=0)
synthetic_jellyfish(4, 'data/jellyfish/test_data', seed=1)
print('train_data + test_data done')" >> "$LOG" 2>&1
fi

# 2. surrogates: guidance set on sims 0-15, scoring set on sims 16-31
for m in force simulator boundary_updater; do
  if [ ! -e "trained_models/surrogates/${m}.ckpt" ] && [ ! -d "trained_models/surrogates/${m}" ]; then
    run sur_${m} 2400 apps/train_surrogates_jellyfish.py \
      --dataset_path data/jellyfish --model $m --n_sims 16 --sim_offset 0 \
      --num_steps 150 --batch_size 4 --results_folder trained_models/surrogates
  fi
  if [ ! -e "trained_models/surrogates_disjoint/${m}.ckpt" ] && [ ! -d "trained_models/surrogates_disjoint/${m}" ]; then
    run surd_${m} 2400 apps/train_surrogates_jellyfish.py \
      --dataset_path data/jellyfish --model $m --n_sims 16 --sim_offset 16 \
      --num_steps 150 --batch_size 4 \
      --results_folder trained_models/surrogates_disjoint
  fi
done

# 3. diffusion models (states EBM joint + thetas prior), sims 0-15 only
run jf_states 3600 apps/train_jellyfish.py \
  --dataset_path data/jellyfish --model_type states --n_sims 16 $FR $DIM \
  --train_num_steps 150 --checkpoint_interval 50 --batch_size 2 --resume True
run jf_thetas 2400 apps/train_jellyfish.py \
  --dataset_path data/jellyfish --model_type thetas --n_sims 16 $FR $DIM \
  --train_num_steps 150 --checkpoint_interval 50 --batch_size 2 --resume True

# 4. guided DDPM sampling, scored through the GUIDANCE surrogates
#    (saves pred_thetas_seed0.npy for the rescore)
run jf_infer 3600 apps/infer_jellyfish.py \
  --dataset_path data/jellyfish $FR $DIM \
  --surrogate_folder trained_models/surrogates \
  --diffusion_joint_checkpoint 150 --diffusion_w_checkpoint 150 \
  --sampling_timesteps 50 --n_test_samples 2 --batch_size 2 \
  --inference_result_path jellyfish_results

# 5. the same thetas rescored closed-loop through the DISJOINT surrogates
run jf_rescore 1800 apps/infer_jellyfish.py \
  --dataset_path data/jellyfish $FR $DIM \
  --surrogate_folder trained_models/surrogates \
  --score_surrogate_folder trained_models/surrogates_disjoint \
  --rescore_thetas jellyfish_results/pred_thetas_seed0.npy \
  --n_test_samples 2 --batch_size 2 \
  --inference_result_path jellyfish_results

log "jellyfish micro chain done"
