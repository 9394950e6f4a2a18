#!/bin/bash
# Wedge-tolerant training wrapper: relaunches pbhc_tpu.train whenever the
# in-process watchdog exits with code 3 (remote-TPU tunnel hang, see
# train._Watchdog), resuming from the newest checkpoint of the experiment.
#
# Usage: bash tools/train_retry.sh <total_iterations> <train args...>
#   (pass experiment_name=... in the args; do NOT pass
#    num_learning_iterations/auto_load_latest — the wrapper owns them)
set -u
TOTAL=$1; shift

while true; do
  # record the active trainer PID so a supervisor can stop the run cleanly
  # (never kill by pattern on this host — see repo guidelines)
  python -u -m pbhc_tpu.train "$@" \
      auto_load_latest=true "total_iterations=$TOTAL" &
  echo $! > /tmp/train_active.pid
  wait $!
  rc=$?
  if [ $rc -eq 3 ]; then
    echo "[train_retry] watchdog exit — resuming from latest checkpoint" >&2
    sleep 15
    continue
  fi
  exit $rc
done
