#!/bin/bash
# Round-5 TPU chain, in VERDICT-r4 priority order:
#
#   A. Side_kick resume 3k -> 10.5k (golden clip #2; r4 fell in sim2sim at 3k
#      with the penalty curriculum unsaturated).
#   B-D. Horse-stance_pose / Hooks_punch / Roundhouse_kick fresh golden runs
#      (-> >=5 of the reference's 7 example clips have trained policies;
#      note pretrained_horse_stance_pose_2 tracks the SAME Horse-stance_pose
#      clip — reference example/pretrained_horse_stance_pose_2/config.yaml:539
#      — so clip coverage, not policy count, is what grows the table).
#   P. pair3 / bf16 throughput rows VERDICT r4 weak #3 demanded (warm cache).
#   E. 29-DoF KB2 teacher (reference scripts/train/student_ue_29dof.sh recipe)
#      for the remaining clock, then a dagger_only student distill.
#
# All KB1 runs use rewards.reward_penalty_degree=1.6e-5 (vs default 1e-5):
# curricula restart from initial values on resume/fresh start (reference
# parity), and the punch precedent shows sim2sim transfer emerges at penalty
# SATURATION (~ln(10)/(24*degree) iters: 9.6k at 1e-5, 6k at 1.6e-5) — the
# only way 4 clips + the 29-DoF path fit one round's TPU clock.
#
# Evals run niced on CPU in the background so the TPU rolls straight into
# the next stage. Mirrors ride the force-updated refs/heads/mirrors branch
# (tools/mirror_commit.sh); main gets one artifact commit per shipped policy.
set -u
cd /root/repo
STOP_EPOCH=${STOP_EPOCH:?unix time when the TPU must be free (driver bench)}
PDEG="rewards.reward_penalty_degree=0.000016"
PACED="env.config.termination_curriculum.terminate_when_motion_far_curriculum_level_up_threshold=250 env.config.termination_curriculum.terminate_when_motion_far_curriculum_level_down_threshold=100 env.config.termination_curriculum.terminate_when_motion_far_threshold_min=0.8"
CPU=(nice -n 19 env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu)
OUT=docs/golden_table
mkdir -p $OUT docs/sweeps
left() { echo $(( STOP_EPOCH - $(date +%s) )); }

bash tools/mirror_commit.sh 300 kb1_side_kick kb1_horse_stance_pose \
    kb1_hooks_punch kb1_roundhouse_kick kb2_teacher29_r5 kb2_student29_r5 \
    >/tmp/mirror.log 2>&1 &
MIRROR_PID=$!

# Background CPU eval of a finished clip: in-engine metrics + MuJoCo sim2sim,
# then table row + ONE commit for this policy's artifacts.
eval_clip() {  # $1=EXP $2=CKPT
  local EXP=$1 CKPT=$2 N RUN
  N=$(basename "$CKPT"); N=${N#model_}
  "${CPU[@]}" python -m pbhc_tpu.eval_agent checkpoint="$CKPT" sim2sim=true \
      > /tmp/eval_${EXP}.log 2>&1 \
    || { echo "[chain] $EXP eval FAILED (see /tmp/eval_${EXP}.log)"; return 1; }
  RUN=$(dirname "$(dirname "$CKPT")")
  cp "$RUN/eval_model_${N}.json" $OUT/${EXP}_eval.json
  cp "$RUN/exported/model_${N}.npz" $OUT/${EXP}_policy.npz 2>/dev/null || true
  python tools/golden_table.py > $OUT/TABLE.md
  git add $OUT "artifacts/$EXP" 2>/dev/null
  git commit -q -m "Golden table: $EXP trained + evaluated (iter $N)" || true
  echo "[chain] $EXP eval committed (iter $N)"
}

run_clip() {  # $1=EXP $2=CLIP $3=TOTAL_ITERS $4=extra args
  local EXP=$1 CLIP=$2 TOTAL=$3; shift 3
  [ "$(left)" -gt 600 ] || { echo "[chain] skip $EXP (no time)"; return; }
  echo "[chain] === $EXP -> $TOTAL iters ($(left)s left) ==="
  timeout -s TERM "$(( $(left) - 300 ))" bash tools/train_retry.sh "$TOTAL" \
      exp=motion_tracking robot=g1_23dof \
      obs=motion_tracking rewards=motion_tracking domain_rand=main \
      simulator=tpu robot.motion.motion_file=assets/motions/${CLIP}.pkl \
      num_envs=4096 experiment_name=$EXP seed=1 \
      algo.config.save_interval=500 $PDEG "$@" \
    || echo "[chain] $EXP train stopped (timeout/failure; mirror resumable)"
  sleep 20   # let the trainer release the TPU tunnel
  local CKPT
  CKPT=$(ls -td logs/PBHC_TPU/*-${EXP}-*/ckpt/model_* 2>/dev/null | head -1)
  if [ -z "${CKPT:-}" ]; then
    CKPT=$(ls -t artifacts/${EXP}/ckpt/model_*.pkl 2>/dev/null | head -1)
  fi
  [ -z "${CKPT:-}" ] && { echo "[chain] $EXP: no checkpoint"; return; }
  eval_clip "$EXP" "$CKPT" &
}

# --- A-D: golden clips ---------------------------------------------------
run_clip kb1_side_kick         Side_kick         10500 $PACED
run_clip kb1_horse_stance_pose Horse-stance_pose  8000
run_clip kb1_hooks_punch       Hooks_punch        8000
run_clip kb1_roundhouse_kick   Roundhouse_kick    8000

# --- P: the two unmeasured throughput rows (VERDICT r4 weak #3) ----------
if [ "$(left)" -gt 4500 ]; then
  echo "[chain] === perf sweep: pair3 + bf16 ($(left)s left) ==="
  timeout -s TERM 2100 python tools/sweep_knobs.py pair3 pair4_bf16 \
      > docs/sweeps/r5_throughput.jsonl 2>/tmp/sweep_r5.log \
    || echo "[chain] sweep timed out/failed (see /tmp/sweep_r5.log)"
  cat docs/sweeps/r5_throughput.jsonl
fi

# --- E: 29-DoF KB2 teacher -> student (reference student_ue_29dof.sh) ----
LIB29=assets/motions/g1_rig_Skeleton_Sequence_converted_processed_g1_29dof_rev_1_0.pkl
if [ "$(left)" -gt 3000 ]; then
  TBUDGET=$(( $(left) - 2100 ))   # leave ~35 min for the student
  echo "[chain] === 29-DoF teacher (${TBUDGET}s budget) ==="
  timeout -s TERM "$TBUDGET" bash tools/train_retry.sh 20000 \
      exp=general_tracking robot=g1_29dof \
      obs=general_tracking_teacher rewards=general_tracking domain_rand=main \
      simulator=tpu robot.motion.motion_file=$LIB29 num_envs=2048 \
      experiment_name=kb2_teacher29_r5 seed=1 algo.config.save_interval=500 \
    || echo "[chain] teacher stopped at budget"
  sleep 20
  TEACHER=$(ls -td logs/PBHC_TPU/*kb2_teacher29_r5*/ckpt/model_* 2>/dev/null | head -1)
  git add artifacts/kb2_teacher29_r5 2>/dev/null
  git commit -q -m "KB2 29-DoF teacher checkpoint (round-5 chain)" || true
  if [ -n "${TEACHER:-}" ] && [ "$(left)" -gt 900 ]; then
    echo "[chain] === 29-DoF student distill from $TEACHER ==="
    timeout -s TERM "$(( $(left) - 120 ))" bash tools/train_retry.sh 2000 \
        exp=general_tracking robot=g1_29dof \
        obs=general_tracking_student rewards=general_tracking domain_rand=main \
        simulator=tpu robot.motion.motion_file=$LIB29 num_envs=2048 \
        experiment_name=kb2_student29_r5 seed=1 \
        algo.config.teacher_model_path="$TEACHER" algo.config.dagger_only=true \
        algo.config.save_interval=250 \
      || echo "[chain] student stopped at budget"
    git add artifacts/kb2_student29_r5 2>/dev/null
    git commit -q -m "KB2 29-DoF student checkpoint (round-5 chain)" || true
  fi
fi

wait  # background evals
touch /tmp/mirror_stop
echo "[chain] DONE ($(left)s before deadline)"
