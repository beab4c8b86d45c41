#!/bin/bash
# Round-4 end-of-round chip guard (VERDICT r3 weak #1 / next #3).
#
# Usage: nohup scripts/killguard_r4.sh <deadline_utc_epoch> &
#
# At deadline-25min: SIGTERM every tracked campaign PID (/tmp/r4_*.pid) so
# the graceful-SIGTERM trainers checkpoint and exit; wait; then run bench.py
# once and verify it emits a JSON line (leaves the tunnel warm + healthy for
# the driver's own BENCH run). Never uses SIGKILL on a process that might be
# executing on the chip (a kill -9 mid-call wedges the tunnel 10-12 min,
# PERF.md r3).
set -u
DEADLINE=${1:?usage: killguard_r4.sh <deadline_epoch_utc>}
GUARD_AT=$((DEADLINE - 1500))

while [ "$(date +%s)" -lt "$GUARD_AT" ]; do
  sleep 30
done

echo "killguard: $(date -u) — stopping chip work" >> /tmp/killguard_r4.log
for f in /tmp/r4_*.pid; do
  [ -e "$f" ] || continue
  pid=$(cat "$f")
  if kill -0 "$pid" 2>/dev/null; then
    echo "killguard: SIGTERM $pid ($f)" >> /tmp/killguard_r4.log
    kill -TERM "$pid" 2>/dev/null
  fi
done
# wait up to 6 min for graceful exits (in-flight step + checkpoint save)
for i in $(seq 1 36); do
  busy=0
  for f in /tmp/r4_*.pid; do
    [ -e "$f" ] || continue
    kill -0 "$(cat "$f")" 2>/dev/null && busy=1
  done
  [ "$busy" = 0 ] && break
  sleep 10
done

cd /root/repo
echo "killguard: running final bench $(date -u)" >> /tmp/killguard_r4.log
timeout 900 python bench.py > /tmp/killguard_bench.json 2>> /tmp/killguard_r4.log
rc=$?
echo "killguard: bench rc=$rc $(date -u)" >> /tmp/killguard_r4.log
cat /tmp/killguard_bench.json >> /tmp/killguard_r4.log
