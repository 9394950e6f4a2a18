#!/bin/bash
# TPU-safe test launcher: unset the axon plugin gate so pytest processes can
# NEVER dial the TPU tunnel (a second client wedges the active training
# session's RPC stream). Tests run on an 8-device virtual CPU mesh anyway.
#
# When given a directory, each test file runs in its OWN pytest process:
# a single long-lived XLA:CPU process accumulating ~100 compiled programs
# segfaults sporadically mid-suite (every crashed test passes standalone),
# so per-file isolation keeps one crash from killing the whole run.
#
# Default is the FULL suite (slow marks included) — a green default run is
# the CI signal and covers PPO-learns, lanes parity, distill modes, and
# mirror recovery (VERDICT r4 #7: the fast subset must not masquerade as
# green CI). For quick iteration, opt OUT explicitly:
#   bash tools/run_tests.sh tests/ -q              # full suite (CI)
#   PBHC_FAST=1 bash tools/run_tests.sh tests/ -q  # skip slow marks
# (PBHC_SLOW=1 is accepted for backward compat and is a no-op now.)
set -u
PYTEST=(env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE python -m pytest)
if [ "${PBHC_FAST:-0}" = "1" ]; then
  PYTEST+=(-m "not slow")
  NSLOW=$(grep -rl "pytest.mark.slow" "$(dirname "$0")/../tests" 2>/dev/null | wc -l)
  echo "=============================================================" >&2
  echo "[run_tests] FAST mode (PBHC_FAST=1): 'slow' tests DESELECTED" >&2
  echo "[run_tests] (~$NSLOW files carry slow marks: PPO-learns, lanes" >&2
  echo "[run_tests] parity, distill modes, artifact-mirror recovery)." >&2
  echo "[run_tests] A green fast run is NOT a CI signal — run the" >&2
  echo "[run_tests] default  bash tools/run_tests.sh tests/ -q  for CI." >&2
  echo "=============================================================" >&2
fi

if [ $# -ge 1 ] && [ -d "$1" ]; then
  DIR=$1; shift
  rc=0; failed=()
  for f in "$DIR"/test_*.py; do
    t0=$SECONDS
    "${PYTEST[@]}" "$f" "$@" || { rc=1; failed+=("$f"); }
    echo "[run_tests] $f: $((SECONDS - t0))s"
  done
  if [ $rc -ne 0 ]; then
    echo "FAILED FILES: ${failed[*]}" >&2
  fi
  exit $rc
fi
exec "${PYTEST[@]}" "$@"
