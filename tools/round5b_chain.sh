#!/bin/bash
# Round-5b TPU chain (second TPU block of round 5) — the VERDICT-r4 items the
# first block did not reach, in priority order:
#
#   1. terrain_walk_v3: hfield retrain with the SATURATED penalty curriculum
#      (round-5 root cause: v2's falls = box-sole/registration scene bugs,
#      both fixed, + 42%-saturated curriculum) -> CPU demos on >=2 tiles.
#   2-3. Horse-stance_pose / Hooks_punch golden clips (fast curriculum,
#      saturation ~6k iters; punch precedent: transfer emerges at saturation).
#   4. 29-DoF KB2 teacher -> dagger_only student (reference
#      scripts/train/student_ue_29dof.sh recipe at round-budget scale;
#      round-1 precedent: end_time_ratio 0.943 at 3k teacher iters).
#   5. Roundhouse_kick golden clip (5th distinct clip; a kick, so the named
#      pivot-contact engine gap may keep sim2sim from standing — row is
#      honest either way).
#   6. pair3/bf16 throughput sweep rows (VERDICT r4 weak #3 leftovers).
#
# Evals run niced on CPU in the background; the TPU rolls into the next
# stage. Mirrors ride the force-updated refs/heads/mirrors branch.
set -u
cd /root/repo
STOP_EPOCH=${STOP_EPOCH:?unix time when the TPU must be free (driver bench)}
PDEG="rewards.reward_penalty_degree=0.000016"
PACED="env.config.termination_curriculum.terminate_when_motion_far_curriculum_level_up_threshold=250 env.config.termination_curriculum.terminate_when_motion_far_curriculum_level_down_threshold=100 env.config.termination_curriculum.terminate_when_motion_far_threshold_min=0.8"
CPU=(nice -n 19 env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu)
OUT=docs/golden_table
mkdir -p $OUT docs/sweeps docs/terrain/r5 docs/kb2_29
left() { echo $(( STOP_EPOCH - $(date +%s) )); }

bash tools/mirror_commit.sh 300 terrain_walk_v3 kb1_horse_stance_pose \
    kb1_hooks_punch kb1_roundhouse_kick kb2_teacher29_r5 kb2_student29_r5 \
    >/tmp/mirror.log 2>&1 &

eval_clip() {  # $1=EXP $2=CKPT — background CPU: in-engine + sim2sim + table row
  local EXP=$1 CKPT=$2 N RUN
  N=$(basename "$CKPT"); N=${N%.pkl}; N=${N#model_}
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

newest_ckpt() {  # $1=EXP
  local C
  C=$(ls -td logs/PBHC_TPU/*-$1-*/ckpt/model_* 2>/dev/null | head -1)
  [ -z "${C:-}" ] && C=$(ls -t artifacts/$1/ckpt/model_*.pkl 2>/dev/null | head -1)
  echo "$C"
}

run_clip() {  # $1=EXP $2=CLIP $3=TOTAL_ITERS $4=min-seconds-needed; rest extra args
  local EXP=$1 CLIP=$2 TOTAL=$3 NEED=$4; shift 4
  [ "$(left)" -gt "$NEED" ] || { echo "[chain] skip $EXP ($(left)s left < ${NEED}s)"; return 1; }
  echo "[chain] === $EXP -> $TOTAL iters ($(left)s left) ==="
  timeout -s TERM "$(( $(left) - 240 ))" bash tools/train_retry.sh "$TOTAL" \
      exp=motion_tracking robot=g1_23dof \
      obs=motion_tracking rewards=motion_tracking domain_rand=main \
      simulator=tpu robot.motion.motion_file=assets/motions/${CLIP}.pkl \
      num_envs=4096 experiment_name=$EXP seed=1 \
      algo.config.save_interval=500 $PDEG "$@" \
    || echo "[chain] $EXP train stopped (timeout/failure; mirror resumable)"
  sleep 20   # let the trainer release the TPU tunnel
  local CKPT; CKPT=$(newest_ckpt $EXP)
  [ -z "${CKPT:-}" ] && { echo "[chain] $EXP: no checkpoint"; return 1; }
  eval_clip "$EXP" "$CKPT" &
}

# --- 1: terrain_walk_v3 (saturated curriculum on the fixed box-sole scene) ---
if [ "$(left)" -gt 2400 ]; then
  echo "[chain] === terrain_walk_v3 ($(left)s left) ==="
  timeout -s TERM "$(( $(left) - 240 ))" bash tools/train_retry.sh 6500 \
      exp=motion_tracking robot=g1_23dof \
      obs=motion_tracking rewards=motion_tracking domain_rand=main \
      simulator=tpu terrain=locomotion terrain.curriculum=true \
      terrain.max_init_terrain_level=0 \
      robot.motion.motion_file=assets/motions/g1_ue_walk_23dof.pkl \
      num_envs=4096 experiment_name=terrain_walk_v3 seed=1 \
      algo.config.save_interval=500 $PDEG $PACED \
    || echo "[chain] terrain_v3 stopped at budget"
  sleep 20
  git add artifacts/terrain_walk_v3 2>/dev/null
  git commit -q -m "terrain_walk_v3 checkpoint (saturated penalty curriculum on fixed hfield scene)" || true
  V3=$(newest_ckpt terrain_walk_v3)
  if [ -n "${V3:-}" ]; then
    (  # background CPU: hfield demos — flat control + rough tiles
      for RC in "0 1" "0 0" "2 0" "4 0"; do
        set -- $RC
        "${CPU[@]}" python tools/terrain_demo.py checkpoint="$V3" row=$1 col=$2 \
            out=docs/terrain/r5/walkv3_r$1c$2.json >> /tmp/walkv3_demo.log 2>&1 \
          && echo "[chain] walkv3 r$1c$2: $(python -c "import json;d=json.load(open('docs/terrain/r5/walkv3_r$1c$2.json'));print('COMPLETED' if d.get('completed') else 'fall@%s'%d.get('first_fall_tick'))")" \
          || echo "[chain] walkv3 r$1c$2 demo failed"
      done
      cp artifacts/terrain_walk_v3/config.yaml docs/terrain/r5/terrain_walk_v3.config.yaml 2>/dev/null
      git add docs/terrain/r5 artifacts/terrain_walk_v3 2>/dev/null
      git commit -q -m "terrain_walk_v3 hfield demos (box-sole scene)" || true
    ) &
  fi
fi

# --- 2-3: golden clips (double-stance: expected to transfer at saturation) ---
run_clip kb1_horse_stance_pose Horse-stance_pose 7000 2400
run_clip kb1_hooks_punch       Hooks_punch       7000 2400

# --- 4: 29-DoF KB2 teacher -> student -----------------------------------
LIB29=assets/motions/g1_rig_Skeleton_Sequence_converted_processed_g1_29dof_rev_1_0.pkl
if [ "$(left)" -gt 2700 ]; then
  TB=$(( $(left) - 1800 ))
  echo "[chain] === 29-DoF teacher (budget ${TB}s, $(left)s left) ==="
  timeout -s TERM "$TB" bash tools/train_retry.sh 3000 \
      exp=general_tracking robot=g1_29dof \
      obs=general_tracking_teacher rewards=general_tracking domain_rand=main \
      simulator=tpu robot.motion.motion_file=$LIB29 num_envs=2048 \
      experiment_name=kb2_teacher29_r5 seed=1 algo.config.save_interval=500 \
    || echo "[chain] teacher stopped at budget"
  sleep 20
  git add artifacts/kb2_teacher29_r5 2>/dev/null
  git commit -q -m "KB2 29-DoF teacher checkpoint (round 5)" || true
  TEACHER=$(newest_ckpt kb2_teacher29_r5)
  if [ -n "${TEACHER:-}" ] && [ "$(left)" -gt 900 ]; then
    echo "[chain] === 29-DoF student distill from $TEACHER ==="
    timeout -s TERM "$(( $(left) - 240 ))" bash tools/train_retry.sh 2000 \
        exp=general_tracking robot=g1_29dof \
        obs=general_tracking_student rewards=general_tracking domain_rand=main \
        simulator=tpu robot.motion.motion_file=$LIB29 num_envs=2048 \
        experiment_name=kb2_student29_r5 seed=1 \
        algo.config.teacher_model_path="$TEACHER" algo.config.dagger_only=true \
        algo.config.save_interval=250 \
      || echo "[chain] student stopped at budget"
    sleep 20
    git add artifacts/kb2_student29_r5 2>/dev/null
    git commit -q -m "KB2 29-DoF student checkpoint (round 5)" || true
    ST=$(newest_ckpt kb2_student29_r5)
    TE=$TEACHER
    if [ -n "${ST:-}" ]; then
      (  # background CPU: export + ratio evals + sim2sim diag
        "${CPU[@]}" python -m pbhc_tpu.deploy.export student "$ST" \
            docs/kb2_29/kb2_student29_r5.onnx >/tmp/export29.log 2>&1 \
          && echo "[chain] 29dof student ONNX exported" || echo "[chain] 29dof export failed"
        "${CPU[@]}" python -m pbhc_tpu.eval.batch_eval checkpoint="$ST" \
            mode=ratio num_envs=64 > docs/kb2_29/student_ratio.json 2>/tmp/ratio29.log \
          || echo "[chain] student ratio failed"
        "${CPU[@]}" python -m pbhc_tpu.eval.batch_eval checkpoint="$TE" \
            mode=ratio num_envs=64 > docs/kb2_29/teacher_ratio.json 2>>/tmp/ratio29.log \
          || true
        nice -n 19 python tools/diag_sim2sim_fall.py checkpoint="$ST" \
            onnx=docs/kb2_29/kb2_student29_r5.onnx > docs/kb2_29/diag_sim2sim.txt 2>&1 \
          || echo "[chain] 29dof sim2sim diag failed"
        git add docs/kb2_29 artifacts/kb2_student29_r5 artifacts/kb2_teacher29_r5 2>/dev/null
        git commit -q -m "KB2 29-DoF student evals (ratio + sim2sim diag)" || true
      ) &
    fi
  fi
fi

# --- 5: Roundhouse_kick (5th distinct clip) ------------------------------
run_clip kb1_roundhouse_kick Roundhouse_kick 7000 2400 $PACED

# --- 6: perf sweep rows (VERDICT r4 weak #3 leftovers) -------------------
if [ "$(left)" -gt 1800 ]; then
  echo "[chain] === perf sweep: pair3 + bf16 ($(left)s left) ==="
  timeout -s TERM "$(( $(left) - 300 ))" python tools/sweep_knobs.py pair3 pair4_bf16 \
      > docs/sweeps/r5_throughput.jsonl 2>/tmp/sweep_r5.log \
    || echo "[chain] sweep timed out/failed (see /tmp/sweep_r5.log)"
  cat docs/sweeps/r5_throughput.jsonl
  git add docs/sweeps 2>/dev/null
  git commit -q -m "Throughput sweep rows: pair_cap=3 + bf16 contact matvec (warm cache)" || true
fi

wait  # background evals
touch /tmp/mirror_stop
echo "[chain] DONE ($(left)s before deadline)"
