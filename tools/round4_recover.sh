#!/bin/bash
# Round-4 tunnel-wedge recovery: the Side_kick run wedged mid-train
# (watchdog exit 3) and BOTH follow-up trainers hung in env init — the
# remote grant appears stuck. This script probes the tunnel with a tiny
# jitted op until it claims successfully, then repairs the golden chain:
# finish Side_kick (resumes model_4000 -> 6000, ~17 min), run
# Roundhouse_kick in full, regenerate the table, and produce the atomic
# bench sentinel that round4_stage5.sh is waiting on.
set -u
cd /root/repo

echo "[recover] probing tunnel..."
for i in $(seq 1 40); do
  [ -f /tmp/round4_stop ] && exit 0
  if timeout 150 python -c "
import jax, jax.numpy as jnp
print('probe devices:', jax.devices())
print('probe op:', jax.jit(lambda x: (x + 1).sum())(jnp.ones(8)))
"; then
    echo "[recover] tunnel healthy after $i probes"
    break
  fi
  echo "[recover] probe $i failed; sleeping 180s"
  sleep 180
done

[ -f /tmp/round4_stop ] && exit 0
# Kicks get the walking-paced motion_far curriculum (the stage-5 terrain
# lesson applies here too: at model_4000 Side_kick's threshold had tightened
# to the 0.3 m floor while completion was still 45%) and a bigger budget —
# the 6000-iter table recipe undershoots dynamic single-leg clips
# (model_4000 eval: ratio 0.453, sim2sim falls; punch needed 16k).
PACED="env.config.termination_curriculum.terminate_when_motion_far_curriculum_level_up_threshold=250 env.config.termination_curriculum.terminate_when_motion_far_curriculum_level_down_threshold=100 env.config.termination_curriculum.terminate_when_motion_far_threshold_min=0.8"
# finish Side_kick: auto_load_latest resumes the wedge-orphaned model_4000
GOLDEN_EXTRA="$PACED" bash tools/golden_table.sh 12000 Side_kick
[ -f /tmp/round4_stop ] && exit 0
GOLDEN_EXTRA="$PACED" bash tools/golden_table.sh 8000 Roundhouse_kick

[ -f /tmp/round4_stop ] && exit 0
python bench.py > /tmp/bench_r4.json.tmp && mv /tmp/bench_r4.json.tmp /tmp/bench_r4.json
cat /tmp/bench_r4.json
echo "[recover] chain repaired; stage5 takes over"
