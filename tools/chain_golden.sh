#!/bin/bash
# Round-4 stage 4 (VERDICT r3 #3): fill the golden table with the
# self-collision clips the class-aware pair budget exists for.
# Fires when the terrain policy's TPU training is done (model_4000 saved);
# runs golden_table.sh ONE CLIP AT A TIME so TABLE.md is regenerated after
# each clip — a round that ends mid-clip still lands the finished ones.
set -u
while true; do
  [ -f /tmp/round4_stop ] && exit 0
  ls /root/repo/logs/PBHC_TPU/*terrain_walk*/ckpt/model_4000 >/dev/null 2>&1 && break
  sleep 60
done
sleep 120   # terrain trainer exit + TPU release (its demos are CPU, nice'd)
cd /root/repo

for CLIP in Side_kick Roundhouse_kick; do
  [ -f /tmp/round4_stop ] && exit 0
  bash tools/golden_table.sh 6000 "$CLIP"
done

# prime the driver's bench on the freed TPU and record the round-4 number.
# Write to a temp path and mv into place: /tmp/bench_r4.json is
# round4_wrapup.sh's go-sentinel, and creating it at pipeline START would
# launch wrapup's TPU training while bench still holds the exclusive chip.
[ -f /tmp/round4_stop ] && exit 0
python bench.py > /tmp/bench_r4.json.tmp && mv /tmp/bench_r4.json.tmp /tmp/bench_r4.json
cat /tmp/bench_r4.json
echo "[golden] chain done"
