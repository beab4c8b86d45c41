#!/bin/bash
# Safety net: make sure the TPU tunnel is free before the driver's
# end-of-round bench run. Sleeps until GUARD_AT, then terminates any
# remaining campaign/app/bench process by explicit /proc cmdline inspection
# (no pkill-by-pattern; each kill is by a concrete PID that is not us).
GUARD_AT=${GUARD_AT:-1786993400}
while [ "$(date +%s)" -lt "$GUARD_AT" ]; do sleep 20; done
for pass in 1 2; do
  for p in /proc/[0-9]*/cmdline; do
    pid=${p#/proc/}; pid=${pid%/cmdline}
    [ "$pid" = "$$" ] && continue
    cmd=$(tr '\0' ' ' < "$p" 2>/dev/null)
    case "$cmd" in
      *apps/train_*|*apps/infer_*|*bench.py*|*campaign_r3*)
        echo "killguard: pass $pass pid $pid: $cmd"
        if [ "$pass" = 1 ]; then kill "$pid" 2>/dev/null; else kill -9 "$pid" 2>/dev/null; fi
        ;;
    esac
  done
  sleep 10
done
echo "killguard done $(date -u +%H:%M:%S)"
