#!/bin/bash
# Round-5c stage manager — takes over from round5b_chain.sh after its first
# real stage. Context: the 5b chain's terrain stage fast-failed on a wedged
# TPU tunnel (FAILED_PRECONDITION on the first device->host transfer,
# inherited from a killed predecessor's claim) and the chain skipped it
# instead of retrying; the pose stage claimed fine and is training now.
#
# This manager: (1) waits for the running kb1_horse_stance_pose trainer to
# finish and evals it; (2) re-runs terrain_walk_v3 FIRST (VERDICT r4 #2);
# (3) hooks_punch golden clip; (4) 29-DoF teacher->student; (5) roundhouse /
# perf sweep if the clock allows. Every TPU launch goes through
# run_guarded(), which treats a crash within 240 s of launch as a tunnel
# wedge: sleep 150 s (lease lapse) and retry, up to 4 attempts.
set -u
cd /root/repo
STOP_EPOCH=${STOP_EPOCH:?unix time when the TPU must be free}
POSE_PID=${POSE_PID:-}
PDEG="rewards.reward_penalty_degree=0.000016"
PACED="env.config.termination_curriculum.terminate_when_motion_far_curriculum_level_up_threshold=250 env.config.termination_curriculum.terminate_when_motion_far_curriculum_level_down_threshold=100 env.config.termination_curriculum.terminate_when_motion_far_threshold_min=0.8"
CPU=(nice -n 19 env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu)
OUT=docs/golden_table
mkdir -p $OUT docs/sweeps docs/terrain/r5 docs/kb2_29
left() { echo $(( STOP_EPOCH - $(date +%s) )); }

eval_clip() {  # $1=EXP $2=CKPT — background CPU: in-engine + sim2sim + table row
  local EXP=$1 CKPT=$2 N RUN
  N=$(basename "$CKPT"); N=${N%.pkl}; N=${N#model_}
  "${CPU[@]}" python -m pbhc_tpu.eval_agent checkpoint="$CKPT" sim2sim=true \
      > /tmp/eval_${EXP}.log 2>&1 \
    || { echo "[5c] $EXP eval FAILED (see /tmp/eval_${EXP}.log)"; return 1; }
  RUN=$(dirname "$(dirname "$CKPT")")
  cp "$RUN/eval_model_${N}.json" $OUT/${EXP}_eval.json
  cp "$RUN/exported/model_${N}.npz" $OUT/${EXP}_policy.npz 2>/dev/null || true
  python tools/golden_table.py > $OUT/TABLE.md
  git add $OUT "artifacts/$EXP" 2>/dev/null
  git commit -q -m "Golden table: $EXP trained + evaluated (iter $N)" || true
  echo "[5c] $EXP eval committed (iter $N)"
}

newest_ckpt() {  # $1=EXP
  local C
  C=$(ls -td logs/PBHC_TPU/*-$1-*/ckpt/model_* 2>/dev/null | head -1)
  [ -z "${C:-}" ] && C=$(ls -t artifacts/$1/ckpt/model_*.pkl 2>/dev/null | head -1)
  echo "$C"
}

run_guarded() {  # $1=total_iters; rest = train args. Wedge-aware launcher.
  local TOTAL=$1; shift
  local tries=0 t0 rc
  while [ $tries -lt 4 ]; do
    t0=$(date +%s)
    timeout -s TERM "$(( $(left) - 240 ))" bash tools/train_retry.sh "$TOTAL" "$@"
    rc=$?
    [ $rc -eq 0 ] && return 0
    if [ $(( $(date +%s) - t0 )) -lt 240 ]; then
      tries=$(( tries + 1 ))
      echo "[5c] fast-fail rc=$rc within 240s (wedged tunnel?) — retry $tries/4 after 150s"
      sleep 150
      continue
    fi
    echo "[5c] train stopped after $(( $(date +%s) - t0 ))s rc=$rc (budget/real failure)"
    return $rc
  done
  echo "[5c] giving up after 4 fast-fails"
  return 1
}

# --- 0: wait for the in-flight pose trainer, then eval it ----------------
if [ -n "$POSE_PID" ]; then
  echo "[5c] waiting for kb1_horse_stance_pose (pid $POSE_PID)..."
  while kill -0 "$POSE_PID" 2>/dev/null; do sleep 30; done
  sleep 25
  CKPT=$(newest_ckpt kb1_horse_stance_pose)
  if [ -n "${CKPT:-}" ]; then eval_clip kb1_horse_stance_pose "$CKPT" & else
    echo "[5c] pose: no checkpoint found"; fi
fi

# --- 1: terrain_walk_v3 (VERDICT r4 #2; skipped by 5b's wedge) -----------
if [ "$(left)" -gt 2400 ]; then
  echo "[5c] === terrain_walk_v3 ($(left)s left) ==="
  run_guarded 6500 \
      exp=motion_tracking robot=g1_23dof \
      obs=motion_tracking rewards=motion_tracking domain_rand=main \
      simulator=tpu terrain=locomotion terrain.curriculum=true \
      terrain.max_init_terrain_level=0 \
      robot.motion.motion_file=assets/motions/g1_ue_walk_23dof.pkl \
      num_envs=4096 experiment_name=terrain_walk_v3 seed=1 \
      algo.config.save_interval=500 $PDEG $PACED \
    || echo "[5c] terrain_v3 stopped"
  sleep 20
  git add artifacts/terrain_walk_v3 2>/dev/null
  git commit -q -m "terrain_walk_v3 checkpoint (saturated penalty curriculum on fixed hfield scene)" || true
  V3=$(newest_ckpt terrain_walk_v3)
  if [ -n "${V3:-}" ]; then
    (
      for RC in "0 1" "0 0" "2 0" "4 0"; do
        set -- $RC
        "${CPU[@]}" python tools/terrain_demo.py checkpoint="$V3" row=$1 col=$2 \
            out=docs/terrain/r5/walkv3_r$1c$2.json >> /tmp/walkv3_demo.log 2>&1 \
          && echo "[5c] walkv3 r$1c$2: $(python -c "import json;d=json.load(open('docs/terrain/r5/walkv3_r$1c$2.json'));print('COMPLETED' if d.get('completed') else 'fall@%s'%d.get('first_fall_tick'))")" \
          || echo "[5c] walkv3 r$1c$2 demo failed"
      done
      cp artifacts/terrain_walk_v3/config.yaml docs/terrain/r5/terrain_walk_v3.config.yaml 2>/dev/null
      git add docs/terrain/r5 artifacts/terrain_walk_v3 2>/dev/null
      git commit -q -m "terrain_walk_v3 hfield demos (box-sole scene)" || true
    ) &
  fi
fi

# --- 2: Hooks_punch golden clip ------------------------------------------
if [ "$(left)" -gt 2400 ]; then
  echo "[5c] === kb1_hooks_punch ($(left)s left) ==="
  run_guarded 6500 \
      exp=motion_tracking robot=g1_23dof \
      obs=motion_tracking rewards=motion_tracking domain_rand=main \
      simulator=tpu robot.motion.motion_file=assets/motions/Hooks_punch.pkl \
      num_envs=4096 experiment_name=kb1_hooks_punch seed=1 \
      algo.config.save_interval=500 $PDEG \
    || echo "[5c] hooks stopped"
  sleep 20
  CKPT=$(newest_ckpt kb1_hooks_punch)
  [ -n "${CKPT:-}" ] && eval_clip kb1_hooks_punch "$CKPT" &
fi

# --- 3: Roundhouse_kick (5th distinct clip) — only with room for 29dof ---
if [ "$(left)" -gt 12000 ]; then
  echo "[5c] === kb1_roundhouse_kick ($(left)s left) ==="
  run_guarded 6500 \
      exp=motion_tracking robot=g1_23dof \
      obs=motion_tracking rewards=motion_tracking domain_rand=main \
      simulator=tpu robot.motion.motion_file=assets/motions/Roundhouse_kick.pkl \
      num_envs=4096 experiment_name=kb1_roundhouse_kick seed=1 \
      algo.config.save_interval=500 $PDEG $PACED \
    || echo "[5c] roundhouse stopped"
  sleep 20
  CKPT=$(newest_ckpt kb1_roundhouse_kick)
  [ -n "${CKPT:-}" ] && eval_clip kb1_roundhouse_kick "$CKPT" &
fi

# --- 4: 29-DoF KB2 teacher -> student ------------------------------------
LIB29=assets/motions/g1_rig_Skeleton_Sequence_converted_processed_g1_29dof_rev_1_0.pkl
if [ "$(left)" -gt 2100 ]; then
  TB=$(( $(left) - 1800 )); [ "$TB" -lt 1200 ] && TB=1200
  echo "[5c] === 29-DoF teacher (budget ${TB}s, $(left)s left) ==="
  timeout -s TERM "$TB" bash tools/train_retry.sh 3000 \
      exp=general_tracking robot=g1_29dof \
      obs=general_tracking_teacher rewards=general_tracking domain_rand=main \
      simulator=tpu robot.motion.motion_file=$LIB29 num_envs=2048 \
      experiment_name=kb2_teacher29_r5 seed=1 algo.config.save_interval=250 \
    || echo "[5c] teacher stopped at budget"
  sleep 20
  git add artifacts/kb2_teacher29_r5 2>/dev/null
  git commit -q -m "KB2 29-DoF teacher checkpoint (round 5)" || true
  TEACHER=$(newest_ckpt kb2_teacher29_r5)
  if [ -n "${TEACHER:-}" ] && [ "$(left)" -gt 700 ]; then
    echo "[5c] === 29-DoF student distill from $TEACHER ==="
    timeout -s TERM "$(( $(left) - 240 ))" bash tools/train_retry.sh 2000 \
        exp=general_tracking robot=g1_29dof \
        obs=general_tracking_student rewards=general_tracking domain_rand=main \
        simulator=tpu robot.motion.motion_file=$LIB29 num_envs=2048 \
        experiment_name=kb2_student29_r5 seed=1 \
        algo.config.teacher_model_path="$TEACHER" algo.config.dagger_only=true \
        algo.config.save_interval=250 \
      || echo "[5c] student stopped at budget"
    sleep 20
    git add artifacts/kb2_student29_r5 2>/dev/null
    git commit -q -m "KB2 29-DoF student checkpoint (round 5)" || true
    ST=$(newest_ckpt kb2_student29_r5)
    if [ -n "${ST:-}" ]; then
      (
        "${CPU[@]}" python -m pbhc_tpu.deploy.export student "$ST" \
            docs/kb2_29/kb2_student29_r5.onnx >/tmp/export29.log 2>&1 \
          && echo "[5c] 29dof student ONNX exported" || echo "[5c] 29dof export failed"
        "${CPU[@]}" python -m pbhc_tpu.eval.batch_eval checkpoint="$ST" \
            mode=ratio num_envs=64 > docs/kb2_29/student_ratio.json 2>/tmp/ratio29.log \
          || echo "[5c] student ratio failed"
        "${CPU[@]}" python -m pbhc_tpu.eval.batch_eval checkpoint="$TEACHER" \
            mode=ratio num_envs=64 > docs/kb2_29/teacher_ratio.json 2>>/tmp/ratio29.log \
          || true
        nice -n 19 python tools/diag_sim2sim_fall.py checkpoint="$ST" \
            onnx=docs/kb2_29/kb2_student29_r5.onnx > docs/kb2_29/diag_sim2sim.txt 2>&1 \
          || echo "[5c] 29dof sim2sim diag failed"
        git add docs/kb2_29 artifacts/kb2_student29_r5 artifacts/kb2_teacher29_r5 2>/dev/null
        git commit -q -m "KB2 29-DoF student evals (ratio + sim2sim diag)" || true
      ) &
    fi
  fi
fi

# --- 5: perf sweep rows (only if time remains) ---------------------------
if [ "$(left)" -gt 1500 ]; then
  echo "[5c] === perf sweep: pair3 + bf16 ($(left)s left) ==="
  timeout -s TERM "$(( $(left) - 300 ))" python tools/sweep_knobs.py pair3 pair4_bf16 \
      > docs/sweeps/r5_throughput.jsonl 2>/tmp/sweep_r5.log \
    || echo "[5c] sweep timed out/failed (see /tmp/sweep_r5.log)"
  cat docs/sweeps/r5_throughput.jsonl
  git add docs/sweeps 2>/dev/null
  git commit -q -m "Throughput sweep rows: pair_cap=3 + bf16 contact matvec (warm cache)" || true
fi

wait
touch /tmp/mirror_stop
echo "[5c] DONE ($(left)s before deadline)"
