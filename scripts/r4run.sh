#!/bin/bash
# r4run.sh <name> <cmd...> — run one chip stage in the background with
# unbuffered output, a tracked PID (/tmp/r4_<name>.pid, killguard_r4 reads
# these), and a log at /tmp/r4_<name>.log. ONE chip process at a time —
# callers must wait for the previous stage (axon serializes two processes at
# ~half speed each, PERF.md r3).
set -u
NAME=$1; shift
cd /root/repo
nohup python -u "$@" > "/tmp/r4_${NAME}.log" 2>&1 &
echo $! > "/tmp/r4_${NAME}.pid"
echo "started $NAME pid=$(cat /tmp/r4_${NAME}.pid) log=/tmp/r4_${NAME}.log"
