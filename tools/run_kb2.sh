#!/bin/bash
# KungfuBot2 path on TPU: 29-dof multi-motion teacher, then DAgger-only
# student distillation (reference scripts/train/teacher_ue_29dof.sh +
# student_ue_29dof.sh idiom, scaled to the round's time budget).
# Usage: bash tools/run_kb2.sh <motion_lib.pkl> [teacher_iters] [student_iters]
set -e
LIB=${1:-/tmp/m29/lib7_29dof.pkl}
TI=${2:-3000}
SI=${3:-1000}

python -m pbhc_tpu.train exp=general_tracking robot=g1_29dof \
    obs=general_tracking_teacher rewards=general_tracking domain_rand=main \
    simulator=tpu robot.motion.motion_file=$LIB num_envs=2048 \
    experiment_name=kb2_teacher seed=1 \
    algo.config.num_learning_iterations=$TI algo.config.save_interval=500

TEACHER=$(ls -t logs/PBHC_TPU/*kb2_teacher*/ckpt/model_${TI}* | head -1)
echo "teacher: $TEACHER"

python -m pbhc_tpu.train exp=general_tracking robot=g1_29dof \
    obs=general_tracking_student rewards=general_tracking domain_rand=main \
    simulator=tpu robot.motion.motion_file=$LIB num_envs=2048 \
    experiment_name=kb2_student seed=1 \
    algo.config.teacher_model_path=$TEACHER algo.config.dagger_only=true \
    algo.config.num_learning_iterations=$SI algo.config.save_interval=500
