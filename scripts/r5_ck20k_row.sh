#!/bin/bash
# Round-5 tail job #2 (VERDICT #4): evaluate the burgers r5-50k pair at the
# 20k LR-cycle minimum (cosine10000 minima at 10k/20k/30k; the banked
# ck28000 row is mid-cycle). Compile is cached from the 02:41 burgerseval
# run of the identical config, so this is ~2 min of chip time.
# Waits for the wf-row follower (pid $1) to exit first.
set -u
PREV_PID=${1:?usage: r5_ck20k_row.sh <prev_pid> <cutoff_epoch>}
CUTOFF=${2:?}
LOG=/tmp/r5_auto.log
log() { echo "[ck20k $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

while kill -0 "$PREV_PID" 2>/dev/null; do
  [ "$(date +%s)" -ge "$CUTOFF" ] && { log "cutoff while waiting"; exit 1; }
  sleep 5
done

NOW=$(date +%s)
BUDGET=$((CUTOFF - NOW))
if [ "$BUDGET" -le 100 ]; then log "skip ck20k row (budget ${BUDGET}s)"; exit 1; fi
log "start ck20k row budget=${BUDGET}s"
cd /root/repo
timeout -s TERM --kill-after=60 "$BUDGET" \
  python -u apps/infer_burgers.py \
    --synthetic_data 40960 --is_condition_u0 True --is_condition_uT True \
    --exp_id r5-50k --checkpoint 20000 \
    --exp_id__model_w r5-50k --checkpoint__model_w 20000 \
    --eval_two_models True --prior_beta 2.0 --J_scheduler cosine \
    --wus 0 --n_test_samples 50 \
    --save_file burgers_results/r5_ck20000_beta2.0.json \
    > /tmp/r5_ck20k.log 2>&1 &
echo $! > /tmp/r5_ck20k.pid
wait $!
rc=$?
rm -f /tmp/r5_ck20k.pid
log "end ck20k row rc=$rc"
