#!/bin/bash
# Round-4 session-C extension: round4b_chain.sh frees the TPU at its
# DEADLINE_EPOCH, which was sized for the PREVIOUS session's wall clock.
# This session has ~1h more, so once the chain's Side_kick stage is killed,
# resume the same run (identical args -> auto_load_latest picks up the
# newest checkpoint) until STOP_EPOCH, then eval whatever iteration it
# reached (golden_table.sh only evals an exact model_$ITERS, which a
# deadline-bounded run never produces) and regenerate the golden table.
#
# Usage: STOP_EPOCH=<epoch> bash tools/round4c_sidekick.sh
set -u
STOP_EPOCH=${STOP_EPOCH:?unix time when the TPU must be freed (driver bench)}
cd /root/repo
PACED="env.config.termination_curriculum.terminate_when_motion_far_curriculum_level_up_threshold=250 env.config.termination_curriculum.terminate_when_motion_far_curriculum_level_down_threshold=100 env.config.termination_curriculum.terminate_when_motion_far_threshold_min=0.8"
CPU=(nice -n 19 env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu)
left() { echo $(( STOP_EPOCH - $(date +%s) )); }

# --- resume Side_kick until STOP_EPOCH (same args as round4b stage C) ----
if [ "$(left)" -gt 120 ]; then
  timeout -s TERM "$(left)" bash tools/train_retry.sh 12000 \
      exp=motion_tracking robot=g1_23dof \
      obs=motion_tracking rewards=motion_tracking domain_rand=main \
      simulator=tpu robot.motion.motion_file=assets/motions/Side_kick.pkl \
      num_envs=4096 experiment_name=kb1_side_kick seed=1 \
      algo.config.save_interval=1000 $PACED \
    || echo "[4c] side_kick stopped at STOP_EPOCH (mirror committed; resumable)"
fi

# --- eval the newest checkpoint it reached ------------------------------
CKPT=$(ls -td logs/PBHC_TPU/*-kb1_side_kick-*/ckpt/model_* 2>/dev/null | head -1)
if [ -z "${CKPT:-}" ]; then
  # logs/ died with a VM recycle: fall back to the committed mirror
  CKPT=$(ls -t artifacts/kb1_side_kick/ckpt/model_*.pkl 2>/dev/null | head -1)
fi
[ -z "${CKPT:-}" ] && { echo "[4c] no side_kick checkpoint found"; exit 1; }
N=$(basename "$CKPT" .pkl); N=${N#model_}
echo "[4c] eval $CKPT (iter $N)"
# in-engine rollout on the (now free) TPU, MuJoCo replay inside the same run
python -m pbhc_tpu.eval_agent checkpoint="$CKPT" sim2sim=true \
  || { echo "[4c] eval FAILED"; exit 1; }
RUN=$(dirname "$(dirname "$CKPT")")
mkdir -p docs/golden_table
cp "$RUN/eval_model_${N}.json" docs/golden_table/kb1_side_kick_eval.json
cp "$RUN/exported/model_${N}.npz" docs/golden_table/kb1_side_kick_policy.npz 2>/dev/null || true
python tools/golden_table.py > docs/golden_table/TABLE.md
cat docs/golden_table/TABLE.md
echo "[4c] done (iter $N)"
