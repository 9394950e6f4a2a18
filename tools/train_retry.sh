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

# A backgrounded child in a non-interactive shell inherits SIGINT/SIGQUIT
# ignored (POSIX), so Ctrl-C / kill -INT on this wrapper would orphan the
# trainer on the exclusive TPU tunnel. Forward a TERM (which python honors)
# to the recorded pid instead.
trap 'kill -TERM "$(cat /tmp/train_active.pid 2>/dev/null)" 2>/dev/null; exit 130' INT TERM

while true; do
  # record the active trainer PID so a supervisor can stop the run cleanly
  # with `kill $(cat /tmp/train_active.pid)` (SIGTERM; never kill by
  # pattern on this host — see repo guidelines)
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
