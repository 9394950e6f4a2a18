#!/bin/bash
# KB1 golden table: train a motion-tracking policy per reference example clip,
# then eval in-engine + MuJoCo sim2sim with the full metric suite
# (reference idiom: train -> replay in MuJoCo -> measure_traj metrics,
# reference README.md:104, measure_traj.py:208-287, example/motion_data/).
# Artifacts (policy npz + eval json) land in tracked docs/golden_table/.
#
# Usage: bash tools/golden_table.sh <iters> <clip> [clip ...]
#   clip = basename under assets/motions/ (e.g. Side_kick)
set -u
ITERS=$1; shift
cd /root/repo
OUT=docs/golden_table
mkdir -p $OUT
# nice -19: CPU evals may overlap the NEXT clip's TPU training on a 1-core
# host; the TPU driver process must win the core or training fps halves
CPU=(nice -n 19 env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu)

for CLIP in "$@"; do
  EXP=kb1_$(echo "$CLIP" | tr 'A-Z-' 'a-z_')
  echo "[golden] training $CLIP ($ITERS iters) as $EXP"
  bash tools/train_retry.sh "$ITERS" exp=motion_tracking robot=g1_23dof \
      obs=motion_tracking rewards=motion_tracking domain_rand=main \
      simulator=tpu robot.motion.motion_file=assets/motions/${CLIP}.pkl \
      num_envs=4096 experiment_name=$EXP seed=1 \
      algo.config.save_interval=1000 ${GOLDEN_EXTRA:-} \
      || { echo "[golden] $CLIP train FAILED"; continue; }
  CKPT=$(ls -td logs/PBHC_TPU/*-${EXP}-*/ckpt/model_${ITERS} | head -1)
  echo "[golden] eval $CKPT"
  "${CPU[@]}" python -m pbhc_tpu.eval_agent checkpoint="$CKPT" sim2sim=true \
      || { echo "[golden] $CLIP eval FAILED"; continue; }
  RUN=$(dirname "$(dirname "$CKPT")")
  cp "$RUN/eval_model_${ITERS}.json" $OUT/${EXP}_eval.json
  cp "$RUN/exported/model_${ITERS}.npz" $OUT/${EXP}_policy.npz
  echo "[golden] $CLIP done"
done
python tools/golden_table.py > $OUT/TABLE.md
cat $OUT/TABLE.md
