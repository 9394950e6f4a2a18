#!/bin/bash
# Periodic committer for training-checkpoint mirrors: every INTERVAL seconds,
# git-add ONLY the named experiment dirs under artifacts/ (never a blanket
# `git add artifacts/` — VERDICT r3 #5) and commit if anything changed.
# Keeps disaster-recovery mirrors durable across build-VM recycles (two
# rounds have lost in-flight runs to exactly this).
#
# Usage: bash tools/mirror_commit.sh <interval_s> <exp_name> [exp_name ...]
set -u
INTERVAL=$1; shift
cd /root/repo
while true; do
  [ -f /tmp/round4_stop ] && exit 0
  for EXP in "$@"; do
    [ -d "artifacts/$EXP" ] && git add "artifacts/$EXP"
  done
  if ! git diff --cached --quiet; then
    git commit -q -m "Artifact mirror: $* (periodic disaster-recovery commit)" \
      && echo "[mirror] committed $(date -u +%H:%M:%S)"
  fi
  sleep "$INTERVAL"
done
