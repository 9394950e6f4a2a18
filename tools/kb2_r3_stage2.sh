#!/bin/bash
# Round-3 KB2 stage 2: fires automatically when the teacher retrain completes,
# then runs the student distill (reference scripts/train/student_ue_29dof.sh
# idiom: dagger_only BC from the frozen teacher), exports the deployable
# 3-input ONNX, and runs the in-engine ratio harness + the MuJoCo sim2sim
# fall diagnostic. Artifacts land in tracked docs/kb2_r3/.
#
# Usage: bash tools/kb2_r3_stage2.sh [student_iters]
set -u
SI=${1:-8000}
LOG=/tmp/teacher_r3.log
LIB=/root/repo/assets/motions/g1_ue_walk_23dof.pkl
cd /root/repo

# ---- wait for the teacher to finish (train_retry restarts never print
# "done in"; only a completed main() does, followed by the final save) ----
while true; do
  if grep -q "\[train\] done in" "$LOG" 2>/dev/null \
     && ls logs/PBHC_TPU/*kb2_teacher23_r3*/ckpt/model_24000 >/dev/null 2>&1; then
    break
  fi
  sleep 60
done
sleep 90   # let the teacher process fully exit and release the TPU

TEACHER=$(ls -td logs/PBHC_TPU/*kb2_teacher23_r3*/ckpt/model_24000 | head -1)
echo "[stage2] teacher: $TEACHER"

# ---- student distill (verified graft+freeze recipe, round 2) ----
bash tools/train_retry.sh "$SI" exp=general_tracking robot=g1_23dof_student \
    obs=general_tracking_student rewards=general_tracking domain_rand=main \
    simulator=tpu robot.motion.motion_file=$LIB num_envs=2048 \
    experiment_name=kb2_student23_r3 seed=1 \
    algo.config.teacher_model_path="$TEACHER" algo.config.dagger_only=true \
    algo.config.save_interval=250 || exit 1

STUDENT=$(ls -td logs/PBHC_TPU/*kb2_student23_r3*/ckpt/model_${SI} | head -1)
echo "[stage2] student: $STUDENT"

# ---- export + evals (CPU: TPU is free now but these are small/CPU-bound;
# keeping them off the tunnel lets follow-up training start immediately) ----
OUT=docs/kb2_r3
mkdir -p $OUT
# nice -19: these CPU evals overlap the next chain stage's TPU training on
# the 1-core host; the TPU driver process must win the core
CPU=(nice -n 19 env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu)

"${CPU[@]}" python -m pbhc_tpu.deploy.export student "$STUDENT" \
    $OUT/kb2_student23_r3.onnx || exit 1

"${CPU[@]}" python -m pbhc_tpu.eval.batch_eval checkpoint="$STUDENT" \
    mode=ratio num_envs=64 > $OUT/student_ratio.json || exit 1
TT=$(ls -td logs/PBHC_TPU/*kb2_teacher23_r3*/ckpt/model_24000 | head -1)
"${CPU[@]}" python -m pbhc_tpu.eval.batch_eval checkpoint="$TT" \
    mode=ratio num_envs=64 > $OUT/teacher_ratio.json || exit 1

nice -n 19 python tools/diag_sim2sim_fall.py checkpoint="$STUDENT" \
    onnx=$OUT/kb2_student23_r3.onnx > $OUT/diag_sim2sim.txt 2>&1

# ---- persist the small trained artifacts in tracked docs/ ----
cp -r "$(dirname "$STUDENT")/.." /tmp/student_run_snapshot 2>/dev/null || true
cp artifacts/kb2_student23_r3/ckpt/model_${SI}.pkl $OUT/kb2_student23_r3.pkl \
  || cp artifacts/kb2_student23_r3/model_${SI}.pkl $OUT/kb2_student23_r3.pkl
cp "$(dirname "$(dirname "$STUDENT")")/config.yaml" $OUT/kb2_student23_r3.config.yaml
echo "[stage2] done — artifacts in $OUT"
tail -3 $OUT/student_ratio.json
grep -E "first z<0.35|mean" $OUT/diag_sim2sim.txt | head -6
