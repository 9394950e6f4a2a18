#!/bin/bash
# Round-4 session-B chain: the VM recycled (again) before stage 3-5 of the
# round-4 plan landed; logs/ and the uncommitted artifact mirrors died with
# it. This session's repair, in completed-deliverable order:
#
#   A. terrain_walk_v2 (VERDICT r3 #4): 6000 iters, 2048 envs, locomotion
#      curriculum with the WALKING-paced motion_far thresholds (the v1 run
#      collapsed when the stance-clip-tuned curriculum floor-ran mid-learn,
#      see docs/RESULTS.md round-4 stage-5 note). Mirrors are committed
#      periodically by tools/mirror_commit.sh so a recycle never again
#      loses a run.
#   B. CPU hfield demos (rows 0/2/4) niced onto the 1-core host while the
#      TPU moves on; artifacts -> docs/terrain/.
#   C. Side_kick golden-table training (VERDICT r3 #3) for the remaining
#      wall clock, bounded by $DEADLINE_EPOCH so the driver's end-of-round
#      bench gets the exclusive TPU back. Whatever iteration it reaches is
#      committed as a resumable mirror for round 5.
set -u
cd /root/repo
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set to unix time when TPU must be free}
PACED="env.config.termination_curriculum.terminate_when_motion_far_curriculum_level_up_threshold=250 env.config.termination_curriculum.terminate_when_motion_far_curriculum_level_down_threshold=100 env.config.termination_curriculum.terminate_when_motion_far_threshold_min=0.8"
CPU=(nice -n 19 env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu)

left() { echo $(( DEADLINE_EPOCH - $(date +%s) )); }

# --- Stage A: terrain retrain -------------------------------------------
[ -f /tmp/round4_stop ] && exit 0
timeout -s TERM "$(left)" bash tools/train_retry.sh 6000 \
    exp=motion_tracking robot=g1_23dof \
    obs=motion_tracking rewards=motion_tracking domain_rand=main \
    simulator=tpu terrain=locomotion terrain.curriculum=true \
    terrain.max_init_terrain_level=0 \
    robot.motion.motion_file=assets/motions/g1_ue_walk_23dof.pkl \
    num_envs=2048 experiment_name=terrain_walk_v2 seed=1 \
    algo.config.save_interval=500 $PACED \
  || echo "[chain] terrain train stopped (timeout or failure)"

CKPT=$(ls -td logs/PBHC_TPU/*terrain_walk_v2*/ckpt/model_6000 2>/dev/null | head -1)
if [ -n "${CKPT:-}" ]; then
  echo "[chain] terrain trained: $CKPT"
  mkdir -p docs/terrain
  # --- Stage B: demos on CPU (background, niced) -----------------------
  for RC in "0 0" "2 0" "4 0"; do
    set -- $RC
    "${CPU[@]}" python tools/terrain_demo.py checkpoint="$CKPT" row=$1 col=$2 \
        out=docs/terrain/demo_r$1c$2.json >/tmp/terrain_demo_r$1.log 2>&1 &
  done
  cp "$(ls -t artifacts/terrain_walk_v2/ckpt/model_*.pkl | head -1)" \
      docs/terrain/terrain_walk_policy.pkl
  cp "$(dirname "$(dirname "$CKPT")")/config.yaml" docs/terrain/terrain_walk.config.yaml
fi

# --- Stage C: Side_kick golden clip for the remaining clock -------------
[ -f /tmp/round4_stop ] && exit 0
if [ "$(left)" -gt 300 ]; then
  GOLDEN_EXTRA="$PACED" timeout -s TERM "$(left)" \
      bash tools/golden_table.sh 12000 Side_kick \
    || echo "[chain] Side_kick stopped at deadline (mirror committed; round 5 resumes)"
fi
wait
echo "[chain] done"
