#!/bin/bash
# CPU smoke of every round-5b chain stage's EXACT arg shape at tiny scale,
# before committing the exclusive TPU to the 5-hour chain. Catches config
# name / override / distill-dimension errors for ~8 cheap minutes.
set -u
cd /root/repo
CPU=(env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu)
TINY="num_envs=8 total_iterations=2 algo.config.save_interval=1 algo.config.num_steps_per_env=4"
PDEG="rewards.reward_penalty_degree=0.000016"
fail=0

run() { # $1=name, rest args
  local NAME=$1; shift
  echo "=== smoke: $NAME ==="
  if timeout 600 "${CPU[@]}" python -u -m pbhc_tpu.train "$@" $TINY \
      experiment_name=smoke_$NAME > /tmp/smoke_$NAME.log 2>&1; then
    echo "    OK"
  else
    echo "    FAIL (rc=$?) — tail /tmp/smoke_$NAME.log:"; tail -5 /tmp/smoke_$NAME.log
    fail=1
  fi
}

run terrain exp=motion_tracking robot=g1_23dof obs=motion_tracking \
    rewards=motion_tracking domain_rand=main simulator=tpu \
    terrain=locomotion terrain.curriculum=true terrain.max_init_terrain_level=0 \
    robot.motion.motion_file=assets/motions/g1_ue_walk_23dof.pkl seed=1 $PDEG

run kb1 exp=motion_tracking robot=g1_23dof obs=motion_tracking \
    rewards=motion_tracking domain_rand=main simulator=tpu \
    robot.motion.motion_file=assets/motions/Horse-stance_pose.pkl seed=1 $PDEG

LIB29=assets/motions/g1_rig_Skeleton_Sequence_converted_processed_g1_29dof_rev_1_0.pkl
run teacher29 exp=general_tracking robot=g1_29dof obs=general_tracking_teacher \
    rewards=general_tracking domain_rand=main simulator=tpu \
    robot.motion.motion_file=$LIB29 seed=1

TEACHER=$(ls -t artifacts/smoke_teacher29/ckpt/model_*.pkl 2>/dev/null | head -1)
[ -z "${TEACHER:-}" ] && TEACHER=$(ls -td logs/PBHC_TPU/*smoke_teacher29*/ckpt/model_* 2>/dev/null | head -1)
if [ -n "${TEACHER:-}" ]; then
  run student29 exp=general_tracking robot=g1_29dof obs=general_tracking_student \
      rewards=general_tracking domain_rand=main simulator=tpu \
      robot.motion.motion_file=$LIB29 seed=1 \
      algo.config.teacher_model_path="$TEACHER" algo.config.dagger_only=true
else
  echo "=== smoke: student29 SKIPPED (no teacher ckpt found)"; fail=1
fi

exit $fail
