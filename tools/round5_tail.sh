#!/bin/bash
# Round-5 chain TAIL (replaces round5_chain.sh stage E; started by hand after
# stage P — the running chain script cannot be edited safely).
#
# Rationale (round-5 session findings, docs/RESULTS.md):
#   - terrain_walk_v2's MuJoCo falls were 3 stacked causes: sphere<->hfield
#     contact dropouts (fixed: box soles), hfield grid stretch (fixed: exact
#     registration), and an UNSATURATED penalty curriculum (6k iters at
#     degree 1e-5 = 42% saturation — the same cause as side_kick's r4 fall).
#     terrain_walk_v3 retrains with the fast curriculum to full saturation.
#   - the 29-DoF teacher hit end_time_ratio 0.943 at 3000 iters in round 1,
#     so a 3k teacher + 2k dagger_only student fits the remaining clock
#     (reference student_ue_29dof.sh recipe at round-budget scale).
set -u
cd /root/repo
STOP_EPOCH=${STOP_EPOCH:?unix time when the TPU must be free}
PDEG="rewards.reward_penalty_degree=0.000016"
PACED="env.config.termination_curriculum.terminate_when_motion_far_curriculum_level_up_threshold=250 env.config.termination_curriculum.terminate_when_motion_far_curriculum_level_down_threshold=100 env.config.termination_curriculum.terminate_when_motion_far_threshold_min=0.8"
left() { echo $(( STOP_EPOCH - $(date +%s) )); }

# --- terrain_walk_v3: saturated-curriculum hfield retrain ----------------
if [ "$(left)" -gt 1200 ]; then
  echo "[tail] === terrain_walk_v3 ($(left)s left) ==="
  timeout -s TERM "$(( $(left) - 2700 > 1200 ? $(left) - 2700 : 1200 ))" \
    bash tools/train_retry.sh 6500 \
      exp=motion_tracking robot=g1_23dof \
      obs=motion_tracking rewards=motion_tracking domain_rand=main \
      simulator=tpu terrain=locomotion terrain.curriculum=true \
      terrain.max_init_terrain_level=0 \
      robot.motion.motion_file=assets/motions/g1_ue_walk_23dof.pkl \
      num_envs=4096 experiment_name=terrain_walk_v3 seed=1 \
      algo.config.save_interval=500 $PDEG $PACED \
    || echo "[tail] terrain_v3 stopped at budget"
  sleep 20
  git add artifacts/terrain_walk_v3 2>/dev/null
  git commit -q -m "terrain_walk_v3 checkpoint (saturated penalty curriculum)" || true
  # demos run on CPU after the chain frees the TPU (round5_wrap.sh)
fi

# --- 29-DoF KB2 teacher -> student (round-1-budget recipe) ---------------
LIB29=assets/motions/g1_rig_Skeleton_Sequence_converted_processed_g1_29dof_rev_1_0.pkl
if [ "$(left)" -gt 1500 ]; then
  TB=$(( $(left) - 1500 ))
  echo "[tail] === 29-DoF teacher (budget ${TB}s) ==="
  timeout -s TERM "$TB" bash tools/train_retry.sh 3000 \
      exp=general_tracking robot=g1_29dof \
      obs=general_tracking_teacher rewards=general_tracking domain_rand=main \
      simulator=tpu robot.motion.motion_file=$LIB29 num_envs=2048 \
      experiment_name=kb2_teacher29_r5 seed=1 algo.config.save_interval=500 \
    || echo "[tail] teacher stopped at budget"
  sleep 20
  TEACHER=$(ls -td logs/PBHC_TPU/*kb2_teacher29_r5*/ckpt/model_* 2>/dev/null | head -1)
  git add artifacts/kb2_teacher29_r5 2>/dev/null
  git commit -q -m "KB2 29-DoF teacher checkpoint (round 5)" || true
  if [ -n "${TEACHER:-}" ] && [ "$(left)" -gt 420 ]; then
    echo "[tail] === 29-DoF student distill from $TEACHER ==="
    timeout -s TERM "$(( $(left) - 120 ))" bash tools/train_retry.sh 2000 \
        exp=general_tracking robot=g1_29dof \
        obs=general_tracking_student rewards=general_tracking domain_rand=main \
        simulator=tpu robot.motion.motion_file=$LIB29 num_envs=2048 \
        experiment_name=kb2_student29_r5 seed=1 \
        algo.config.teacher_model_path="$TEACHER" algo.config.dagger_only=true \
        algo.config.save_interval=250 \
      || echo "[tail] student stopped at budget"
    git add artifacts/kb2_student29_r5 2>/dev/null
    git commit -q -m "KB2 29-DoF student checkpoint (round 5)" || true
  fi
fi
touch /tmp/mirror_stop
echo "[tail] DONE ($(left)s before deadline)"
