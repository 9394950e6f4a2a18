#!/bin/bash
# Round-4 stage 3 (VERDICT r3 #4): first terrain-trained policy.
# Fires when stage 2's student TRAINING finishes (the "[stage2] student:"
# marker prints before its CPU-only export/eval steps, so the TPU is free);
# trains a 4k-iter terrain-curriculum walk and replays hfield rows in MuJoCo.
# Reference parity: humanoidverse/envs/env_utils/terrain.py:9-199 curriculum.
set -u
while ! grep -q "\[stage2\] student:" /tmp/stage2.log 2>/dev/null; do
  [ -f /tmp/round4_stop ] && exit 0
  sleep 60
done
sleep 120   # let the student process release the TPU tunnel
[ -f /tmp/round4_stop ] && exit 0
cd /root/repo

bash tools/train_retry.sh 4000 exp=motion_tracking robot=g1_23dof \
    obs=motion_tracking rewards=motion_tracking domain_rand=main \
    simulator=tpu terrain=locomotion terrain.curriculum=true \
    terrain.max_init_terrain_level=0 \
    robot.motion.motion_file=assets/motions/g1_ue_walk_23dof.pkl \
    num_envs=2048 experiment_name=terrain_walk seed=1 \
    algo.config.save_interval=1000 || exit 1
CKPT=$(ls -td logs/PBHC_TPU/*terrain_walk*/ckpt/model_4000 | head -1)
echo "[terrain] trained: $CKPT"

# CPU replays may overlap the next stage's TPU training on the 1-core host;
# nice -19 so the TPU driver process keeps the core
mkdir -p docs/terrain
CPU=(nice -n 19 env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu)
for RC in "0 0" "2 0" "4 0"; do
  set -- $RC
  "${CPU[@]}" python tools/terrain_demo.py checkpoint=$CKPT row=$1 col=$2 \
      out=docs/terrain/demo_r$1c$2.json
done
cp artifacts/terrain_walk/ckpt/model_4000.pkl docs/terrain/terrain_walk_policy.pkl 2>/dev/null \
  || cp artifacts/terrain_walk/model_4000.pkl docs/terrain/terrain_walk_policy.pkl
cp "$(dirname "$(dirname "$CKPT")")/config.yaml" docs/terrain/terrain_walk.config.yaml
grep -o "terrain_level_mean.*" "$(dirname "$(dirname "$CKPT")")/train.log" 2>/dev/null | tail -3
echo "[terrain] done"
