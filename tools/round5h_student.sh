#!/bin/bash
# Round-5h: 29-DoF student distill on the TPU slot freed by the teacher
# finishing inside its budget. dagger_only BC from the just-trained teacher
# (reference scripts/train/student_ue_29dof.sh stage 2 at round-tail scale),
# then CPU export + sim2sim diag + ratio evals.
set -u
cd /root/repo
STOP_EPOCH=${STOP_EPOCH:?}
TEACHER_WAIT_PID=${TEACHER_WAIT_PID:-}
LIB29=assets/motions/g1_rig_Skeleton_Sequence_converted_processed_g1_29dof_rev_1_0.pkl
CPU=(nice -n 19 env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu)
left() { echo $(( STOP_EPOCH - $(date +%s) )); }

if [ -n "$TEACHER_WAIT_PID" ]; then
  echo "[5h] waiting for teacher (pid $TEACHER_WAIT_PID)..."
  while kill -0 "$TEACHER_WAIT_PID" 2>/dev/null; do sleep 20; done
  sleep 25
fi
TEACHER=$(ls -td logs/PBHC_TPU/*kb2_teacher29_r5*/ckpt/model_* 2>/dev/null | head -1)
[ -z "${TEACHER:-}" ] && TEACHER=$(ls -t artifacts/kb2_teacher29_r5/ckpt/model_*.pkl 2>/dev/null | head -1)
[ -z "${TEACHER:-}" ] && { echo "[5h] no teacher checkpoint"; exit 1; }

bash tools/mirror_commit.sh 240 kb2_student29_r5 >/tmp/mirror5h.log 2>&1 &

tries=0
while [ $tries -lt 3 ] && [ "$(left)" -gt 420 ]; do
  t0=$(date +%s)
  timeout -s TERM "$(( $(left) - 180 ))" bash tools/train_retry.sh 2000 \
      exp=general_tracking robot=g1_29dof \
      obs=general_tracking_student rewards=general_tracking domain_rand=main \
      simulator=tpu robot.motion.motion_file=$LIB29 num_envs=2048 \
      experiment_name=kb2_student29_r5 seed=1 \
      algo.config.teacher_model_path="$TEACHER" algo.config.dagger_only=true \
      algo.config.save_interval=250 watchdog_boot_timeout_s=2700
  rc=$?
  [ $rc -eq 0 ] && break
  if [ $(( $(date +%s) - t0 )) -lt 240 ]; then
    tries=$(( tries + 1 ))
    echo "[5h] fast-fail rc=$rc — wedge retry $tries/3 after 150s"
    sleep 150
    continue
  fi
  echo "[5h] student stopped rc=$rc after $(( $(date +%s) - t0 ))s"
  break
done
sleep 15
git add artifacts/kb2_student29_r5 2>/dev/null
git commit -q -m "KB2 29-DoF student checkpoint (dagger_only distill, round-5 tail)" || true
touch /tmp/mirror_stop

ST=$(ls -td logs/PBHC_TPU/*kb2_student29_r5*/ckpt/model_* 2>/dev/null | head -1)
[ -z "${ST:-}" ] && ST=$(ls -t artifacts/kb2_student29_r5/ckpt/model_*.pkl 2>/dev/null | head -1)
mkdir -p docs/kb2_29
if [ -n "${ST:-}" ]; then
  "${CPU[@]}" python -m pbhc_tpu.deploy.export student "$ST" \
      docs/kb2_29/kb2_student29_r5.onnx >/tmp/export29.log 2>&1 \
    && echo "[5h] student ONNX exported" || echo "[5h] export failed"
  git add docs/kb2_29 && git commit -q -m "KB2 29-DoF student ONNX export" || true
  nice -n 19 python tools/diag_sim2sim_fall.py checkpoint="$ST" \
      onnx=docs/kb2_29/kb2_student29_r5.onnx > docs/kb2_29/diag_sim2sim.txt 2>&1 \
    && echo "[5h] sim2sim diag done" || echo "[5h] sim2sim diag failed"
  "${CPU[@]}" python -m pbhc_tpu.eval.batch_eval checkpoint="$ST" \
      mode=ratio num_envs=64 > docs/kb2_29/student_ratio.json 2>/tmp/ratio29.log \
    && echo "[5h] student ratio done" || echo "[5h] student ratio failed"
  "${CPU[@]}" python -m pbhc_tpu.eval.batch_eval checkpoint="$TEACHER" \
      mode=ratio num_envs=64 > docs/kb2_29/teacher_ratio.json 2>>/tmp/ratio29.log \
    && echo "[5h] teacher ratio done" || echo "[5h] teacher ratio failed"
  git add docs/kb2_29 && git commit -q -m "KB2 29-DoF evals (sim2sim diag + ratio rows)" || true
fi
echo "[5h] DONE ($(left)s)"
