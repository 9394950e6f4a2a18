#!/bin/bash
# Round-5g: direct 29-DoF teacher run for the session tail. The 5f stage's
# default 900 s boot watchdog is SHORTER than this graph's cold compile
# (~15-20 min on the contended single-core host), so attempts 1-3 died in a
# compile->watchdog->relaunch loop without training an iteration. Here the
# boot watchdog is raised to 2700 s (it still catches true wedges — this
# session's real wedge showed no-first-batch for 300 s AFTER iterations had
# been flowing, which the steady-state watchdog covers) and the run is
# wedge-retried like round5c's run_guarded.
set -u
cd /root/repo
STOP_EPOCH=${STOP_EPOCH:?}
LIB29=assets/motions/g1_rig_Skeleton_Sequence_converted_processed_g1_29dof_rev_1_0.pkl
left() { echo $(( STOP_EPOCH - $(date +%s) )); }

tries=0
while [ $tries -lt 3 ] && [ "$(left)" -gt 420 ]; do
  t0=$(date +%s)
  timeout -s TERM "$(( $(left) - 240 ))" bash tools/train_retry.sh 3000 \
      exp=general_tracking robot=g1_29dof \
      obs=general_tracking_teacher rewards=general_tracking domain_rand=main \
      simulator=tpu robot.motion.motion_file=$LIB29 num_envs=2048 \
      experiment_name=kb2_teacher29_r5 seed=1 algo.config.save_interval=250 \
      watchdog_boot_timeout_s=2700
  rc=$?
  [ $rc -eq 0 ] && break
  if [ $(( $(date +%s) - t0 )) -lt 240 ]; then
    tries=$(( tries + 1 ))
    echo "[5g] fast-fail rc=$rc — wedge retry $tries/3 after 150s"
    sleep 150
    continue
  fi
  echo "[5g] teacher stopped rc=$rc after $(( $(date +%s) - t0 ))s"
  break
done
sleep 15
git add artifacts/kb2_teacher29_r5 2>/dev/null
git commit -q -m "KB2 29-DoF teacher checkpoint (round 5 tail)" || true
touch /tmp/mirror_stop
echo "[5g] DONE ($(left)s before deadline)"
