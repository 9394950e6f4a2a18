#!/bin/bash
# Round-5f stage manager (final tail). Replan: after terrain_v3 the clock
# fits ONE more cold-compile config family, not two — the 29-DoF KB2
# teacher->student recipe (VERDICT r4 missing #3, never demonstrated
# end-to-end) outranks a 4th golden clip (hooks), so hooks is dropped and
# the whole tail goes to the 29-DoF pair + evals.
set -u
cd /root/repo
STOP_EPOCH=${STOP_EPOCH:?unix time when the TPU must be free}
TERRAIN_PID=${TERRAIN_PID:-}
CPU=(nice -n 19 env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu)
mkdir -p docs/terrain/r5 docs/kb2_29
left() { echo $(( STOP_EPOCH - $(date +%s) )); }

newest_ckpt() {
  local C
  C=$(ls -td logs/PBHC_TPU/*-$1-*/ckpt/model_* 2>/dev/null | head -1)
  [ -z "${C:-}" ] && C=$(ls -t artifacts/$1/ckpt/model_*.pkl 2>/dev/null | head -1)
  echo "$C"
}

# --- 0: wait out the running terrain trainer, then demos -----------------
if [ -n "$TERRAIN_PID" ]; then
  echo "[5f] waiting for terrain_walk_v3 (pid $TERRAIN_PID)..."
  while kill -0 "$TERRAIN_PID" 2>/dev/null; do sleep 30; done
  sleep 25
fi
git add artifacts/terrain_walk_v3 2>/dev/null
git commit -q -m "terrain_walk_v3 checkpoint (saturated penalty curriculum on fixed hfield scene)" || true
V3=$(newest_ckpt terrain_walk_v3)
if [ -n "${V3:-}" ]; then
  (
    for RC in "0 1" "0 0" "2 0" "4 0"; do
      set -- $RC
      "${CPU[@]}" python tools/terrain_demo.py checkpoint="$V3" row=$1 col=$2 \
          out=docs/terrain/r5/walkv3_r$1c$2.json >> /tmp/walkv3_demo.log 2>&1 \
        && echo "[5f] walkv3 r$1c$2: $(python -c "import json;d=json.load(open('docs/terrain/r5/walkv3_r$1c$2.json'));print('COMPLETED' if d.get('completed') else 'fall@%s'%d.get('first_fall_tick'))")" \
        || echo "[5f] walkv3 r$1c$2 demo failed"
    done
    cp artifacts/terrain_walk_v3/config.yaml docs/terrain/r5/terrain_walk_v3.config.yaml 2>/dev/null
    git add docs/terrain/r5 artifacts/terrain_walk_v3 2>/dev/null
    git commit -q -m "terrain_walk_v3 hfield demos (box-sole scene)" || true
  ) &
fi

# --- 1: 29-DoF KB2 teacher -> student (the whole tail) -------------------
LIB29=assets/motions/g1_rig_Skeleton_Sequence_converted_processed_g1_29dof_rev_1_0.pkl
if [ "$(left)" -gt 1500 ]; then
  TB=$(( $(left) - 2400 )); [ "$TB" -lt 1200 ] && TB=1200
  echo "[5f] === 29-DoF teacher (budget ${TB}s, $(left)s left) ==="
  timeout -s TERM "$TB" bash tools/train_retry.sh 3000 \
      exp=general_tracking robot=g1_29dof \
      obs=general_tracking_teacher rewards=general_tracking domain_rand=main \
      simulator=tpu robot.motion.motion_file=$LIB29 num_envs=2048 \
      experiment_name=kb2_teacher29_r5 seed=1 algo.config.save_interval=250 \
    || echo "[5f] teacher stopped at budget"
  sleep 20
  git add artifacts/kb2_teacher29_r5 2>/dev/null
  git commit -q -m "KB2 29-DoF teacher checkpoint (round 5)" || true
  TEACHER=$(newest_ckpt kb2_teacher29_r5)
  if [ -n "${TEACHER:-}" ] && [ "$(left)" -gt 600 ]; then
    echo "[5f] === 29-DoF student distill from $TEACHER ($(left)s left) ==="
    timeout -s TERM "$(( $(left) - 240 ))" bash tools/train_retry.sh 2000 \
        exp=general_tracking robot=g1_29dof \
        obs=general_tracking_student rewards=general_tracking domain_rand=main \
        simulator=tpu robot.motion.motion_file=$LIB29 num_envs=2048 \
        experiment_name=kb2_student29_r5 seed=1 \
        algo.config.teacher_model_path="$TEACHER" algo.config.dagger_only=true \
        algo.config.save_interval=250 \
      || echo "[5f] student stopped at budget"
    sleep 20
    git add artifacts/kb2_student29_r5 2>/dev/null
    git commit -q -m "KB2 29-DoF student checkpoint (round 5)" || true
    ST=$(newest_ckpt kb2_student29_r5)
    if [ -n "${ST:-}" ]; then
      (
        "${CPU[@]}" python -m pbhc_tpu.deploy.export student "$ST" \
            docs/kb2_29/kb2_student29_r5.onnx >/tmp/export29.log 2>&1 \
          && echo "[5f] 29dof student ONNX exported" || echo "[5f] 29dof export failed"
        "${CPU[@]}" python -m pbhc_tpu.eval.batch_eval checkpoint="$ST" \
            mode=ratio num_envs=64 > docs/kb2_29/student_ratio.json 2>/tmp/ratio29.log \
          || echo "[5f] student ratio failed"
        "${CPU[@]}" python -m pbhc_tpu.eval.batch_eval checkpoint="$TEACHER" \
            mode=ratio num_envs=64 > docs/kb2_29/teacher_ratio.json 2>>/tmp/ratio29.log \
          || true
        nice -n 19 python tools/diag_sim2sim_fall.py checkpoint="$ST" \
            onnx=docs/kb2_29/kb2_student29_r5.onnx > docs/kb2_29/diag_sim2sim.txt 2>&1 \
          || echo "[5f] 29dof sim2sim diag failed"
        git add docs/kb2_29 artifacts/kb2_student29_r5 artifacts/kb2_teacher29_r5 2>/dev/null
        git commit -q -m "KB2 29-DoF student evals (ratio + sim2sim diag)" || true
      ) &
    fi
  fi
fi

wait
touch /tmp/mirror_stop
echo "[5f] DONE ($(left)s before deadline)"
