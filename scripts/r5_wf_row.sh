#!/bin/bash
# Round-5 tail job: demonstrate that guidance CHANGES an outcome.
#
# The campaign's POPC/FOPC rows sweep wu only; wu endpoint guidance is a
# no-op by construction when u0/uT conditioning clamps the observed
# endpoint cells every sampling step (PERF.md r3; confirmed by the
# bit-identical wu=0 / wu=1000 POPC rows). The control-energy term wf acts
# on the f channel, which nothing clamps, so a wf sweep is the clean
# demonstration: control_energy must fall monotonically with wf.
#
# Runs only after campaign_r5c.sh (pid $1) exits and only if there is
# enough clock before the killguard window.
set -u
CAMPAIGN_PID=${1:?usage: r5_wf_row.sh <campaign_pid> <cutoff_epoch>}
CUTOFF=${2:?}
LOG=/tmp/r5_auto.log
log() { echo "[wfrow $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

while kill -0 "$CAMPAIGN_PID" 2>/dev/null; do
  [ "$(date +%s)" -ge "$CUTOFF" ] && { log "cutoff while waiting"; exit 1; }
  sleep 10
done

NOW=$(date +%s)
BUDGET=$((CUTOFF - NOW))
if [ "$BUDGET" -le 150 ]; then log "skip wf row (budget ${BUDGET}s)"; exit 1; fi
log "start wf row budget=${BUDGET}s"
cd /root/repo
timeout -s TERM --kill-after=60 "$BUDGET" \
  python -u apps/infer_burgers.py \
    --synthetic_data 40960 --synthetic_partial_control front_rear_quarter \
    --partial_control front_rear_quarter \
    --partially_observed front_rear_quarter \
    --train_on_partially_observed front_rear_quarter \
    --set_unobserved_to_zero_during_sampling True \
    --is_condition_u0 True --is_condition_uT True \
    --J_scheduler cosine --dim 64 --dim_mults 1 2 4 8 \
    --exp_id POPC --checkpoint 10000 \
    --exp_id__model_w POPC_w --checkpoint__model_w 10000 \
    --eval_two_models True --prior_beta 0.9 --w_scheduler sigmoid_flip \
    --wus 1000 --wfs 0.0001 0.001 --n_test_samples 50 \
    --save_file burgers_results/partial_obs_partial_ctr/result_wf.json \
    > /tmp/r5_wfrow.log 2>&1 &
echo $! > /tmp/r5_wfrow.pid
wait $!
rc=$?
rm -f /tmp/r5_wfrow.pid
log "end wf row rc=$rc"
