#!/bin/bash
# Round-5 end-of-round chip guard.
#
# Usage: nohup scripts/killguard_r5.sh <deadline_utc_epoch> &
#
# At deadline-30min: SIGTERM every tracked campaign PID (/tmp/r5_*.pid) so
# the graceful-SIGTERM trainers checkpoint and exit; wait; then run bench.py
# once (primary only — fast, leaves the tunnel warm for the driver's own
# BENCH run). Never SIGKILLs a process that might be executing on the chip
# (kill -9 mid-call wedges the tunnel 10-12 min, PERF.md r3).
set -u
DEADLINE=${1:?usage: killguard_r5.sh <deadline_epoch_utc>}
GUARD_AT=$((DEADLINE - 1800))

while [ "$(date +%s)" -lt "$GUARD_AT" ]; do
  sleep 30
done

echo "killguard: $(date -u) — stopping chip work" >> /tmp/killguard_r5.log
for f in /tmp/r5_*.pid; do
  [ -e "$f" ] || continue
  [ "$f" = /tmp/r5_killguard.pid ] && continue  # never SIGTERM ourselves
  pid=$(cat "$f")
  if [ "$pid" = "$$" ]; then continue; fi
  if kill -0 "$pid" 2>/dev/null; then
    echo "killguard: SIGTERM $pid ($f)" >> /tmp/killguard_r5.log
    kill -TERM "$pid" 2>/dev/null
  fi
done
# wait up to 6 min for graceful exits (in-flight step + checkpoint save)
for i in $(seq 1 36); do
  busy=0
  for f in /tmp/r5_*.pid; do
    [ -e "$f" ] || continue
    [ "$f" = /tmp/r5_killguard.pid ] && continue
    kill -0 "$(cat "$f")" 2>/dev/null && busy=1
  done
  [ "$busy" = 0 ] && break
  sleep 10
done

cd /root/repo
# Only burn chip time on a guard bench if the tunnel ever answered this round
if [ -e /tmp/r5_chip_up ]; then
  echo "killguard: running final bench $(date -u)" >> /tmp/killguard_r5.log
  timeout 1500 python bench.py --no_secondary > /tmp/killguard_bench_r5.json \
    2>> /tmp/killguard_r5.log
  rc=$?
  echo "killguard: bench rc=$rc $(date -u)" >> /tmp/killguard_r5.log
  cat /tmp/killguard_bench_r5.json >> /tmp/killguard_r5.log
fi
