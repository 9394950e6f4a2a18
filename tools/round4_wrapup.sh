#!/bin/bash
# Round-4 stage 5: fires after chain_golden's bench (/tmp/bench_r4.json).
# If the clock allows, trains a THIRD golden clip (Hooks_punch), then runs
# the sweep rows that timed out or were added late (pair3 gate-passer,
# pair4_bf16 with a compile-sized timeout). Everything is optional polish;
# each step checks the stop sentinel and a wall-clock cutoff.
set -u
while [ ! -f /tmp/bench_r4.json ]; do
  [ -f /tmp/round4_stop ] && exit 0
  sleep 60
done
cd /root/repo

# third golden clip only if there is ~1h45m of headroom (session restarted
# 21:40, ends ~05:40): start it between 19:00 and 03:40 local
MIN=$(( 10#$(date +%H) * 60 + 10#$(date +%M) ))
if [ ! -f /tmp/round4_stop ] && { [ $MIN -ge 1140 ] || [ $MIN -lt 220 ]; }; then
  bash tools/golden_table.sh 6000 Hooks_punch
fi

[ -f /tmp/round4_stop ] && exit 0
for CFG in pair3 pair4_bf16; do
  [ -f /tmp/round4_stop ] && exit 0
  timeout 1500 python tools/sweep_knobs.py "$CFG" \
      >> docs/sweeps/r4_pair_budget.jsonl 2>>/tmp/sweep_r4.err \
    || echo "{\"config\": \"$CFG\", \"error\": true}" >> docs/sweeps/r4_pair_budget.jsonl
done
echo "[wrapup] done"
