#!/bin/bash
# Periodic disaster-recovery mirror for training checkpoints, WITHOUT
# polluting main's history (VERDICT r4 weak #5: each mirror commit left
# ~7-11 MB of dead blobs in history permanently).
#
# Design: every INTERVAL seconds, build a tree = HEAD + the named
# artifacts/<exp> dirs in a TEMPORARY index, commit it with git commit-tree,
# and FORCE-UPDATE the refs/heads/mirrors ref to that single commit. main
# never sees these commits; old mirror blobs become unreachable and gc-able;
# recovery after a VM recycle is `git checkout mirrors -- artifacts/<exp>`.
# Files modified in the last 15 s are skipped (a checkpoint .pkl mid-write
# would mirror truncated), and the session's real index is never touched so
# independently staged files can't be swept in (ADVICE r4).
#
# Usage: bash tools/mirror_commit.sh <interval_s> <exp_name> [exp_name ...]
# Stop:  touch /tmp/mirror_stop
set -u
INTERVAL=$1; shift
cd /root/repo
rm -f /tmp/mirror_stop
while true; do
  [ -f /tmp/mirror_stop ] && exit 0
  TMPIDX=$(mktemp /tmp/mirror_index.XXXXXX)
  rm -f "$TMPIDX"
  (
    export GIT_INDEX_FILE=$TMPIDX
    git read-tree HEAD
    for EXP in "$@"; do
      [ -d "artifacts/$EXP" ] || continue
      # settled files only: skip anything written in the last 15 s
      find "artifacts/$EXP" -type f ! -newermt '-15 seconds' -print0 \
        | xargs -0 -r git add -f --
    done
    TREE=$(git write-tree)
    if [ "$TREE" != "$(git rev-parse HEAD^{tree})" ] \
       && [ "$TREE" != "$(git rev-parse -q --verify refs/heads/mirrors^{tree} 2>/dev/null)" ]; then
      COMMIT=$(git commit-tree "$TREE" -p "$(git rev-parse HEAD)" \
        -m "Artifact mirror: $* (force-updated disaster-recovery ref)")
      git update-ref refs/heads/mirrors "$COMMIT"
      echo "[mirror] mirrors -> $COMMIT $(date -u +%H:%M:%S)"
    fi
  )
  rm -f "$TMPIDX"
  sleep "$INTERVAL"
done
