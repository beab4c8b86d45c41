#!/bin/bash
# Round-2 Burgers campaign: 40k-trajectory dataset (VERDICT r1 #8),
# joint + prior training, two-model guided inference with prior_beta sweep.
set -e
cd "$(dirname "$0")/.."
N=${N:-40960}
STEPS=${STEPS:-20000}
CKPT=${CKPT:-5000}
BS=${BS:-32}
MS=$((STEPS / CKPT))

python apps/train_burgers.py --synthetic_data $N --train_num_steps $STEPS \
  --checkpoint_interval $CKPT --batch_size $BS --exp_id r2-40k \
  --is_condition_u0 True --is_condition_uT True --resume True

python apps/train_burgers.py --synthetic_data $N --train_num_steps $STEPS \
  --checkpoint_interval $CKPT --batch_size $BS --exp_id r2-40k \
  --is_model_w True --is_condition_u0 True --is_condition_uT True --resume True

# joint-only (DiffPhyCon-lite) baseline
python apps/infer_burgers.py --exp_id r2-40k --checkpoint $MS \
  --synthetic_data 2048 --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True \
  --wus 0 1000 --wfs 0 --J_scheduler cosine \
  --save_file burgers_results/r2_joint_only.json

# two-model prior reweighting sweep (paper's DiffPhyCon)
for beta in 1.0 1.2 1.5 2.0; do
python apps/infer_burgers.py --exp_id r2-40k --exp_id__model_w r2-40k \
  --checkpoint $MS --checkpoint__model_w $MS \
  --synthetic_data 2048 --n_test_samples 50 --batch_size 50 \
  --is_condition_u0 True --is_condition_uT True --eval_two_models True \
  --prior_beta $beta --w_scheduler sigmoid_flip --J_scheduler cosine \
  --wus 0 1000 --wfs 0 \
  --save_file burgers_results/r2_two_model_beta${beta}.json
done
echo "CAMPAIGN DONE"
