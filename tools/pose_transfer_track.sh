#!/bin/bash
# Horse-stance_pose sim2sim transfer curve from mirror-reflog checkpoints
# (the punch_transfer_track idiom): extract each 500-iter snapshot that the
# keep=2 rotation deleted from the worktree but the disaster-recovery mirror
# ref still reaches via its reflog, sim2sim-eval it, and append one JSONL row
# per iter. Answers whether the 7k sim2sim fall is monotone undertraining or
# a transfer window the rotation skipped past.
set -u
cd /root/repo
CPU=(nice -n 19 env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu)
SCRATCH=/tmp/pose_track
OUTJL=docs/golden_table/pose_transfer_track.jsonl
mkdir -p $SCRATCH/ckpt $SCRATCH/exported
cp artifacts/kb1_horse_stance_pose/config.yaml $SCRATCH/config.yaml
: > $OUTJL

for IT in "$@"; do
  # find a mirror reflog entry carrying this iter
  SRC=""
  for i in $(seq 0 25); do
    C=$(git rev-parse "mirrors@{$i}" 2>/dev/null) || continue
    if git cat-file -e "$C:artifacts/kb1_horse_stance_pose/ckpt/model_${IT}.pkl" 2>/dev/null; then
      SRC="$C"; break
    fi
  done
  [ -z "$SRC" ] && { echo "[track] iter $IT: not in mirror reflog"; continue; }
  git show "$SRC:artifacts/kb1_horse_stance_pose/ckpt/model_${IT}.pkl" \
      > $SCRATCH/ckpt/model_${IT}.pkl
  "${CPU[@]}" python -m pbhc_tpu.eval_agent \
      checkpoint=$SCRATCH/ckpt/model_${IT}.pkl sim2sim=true \
      > /tmp/pose_track_${IT}.log 2>&1 \
    || { echo "[track] iter $IT eval failed"; continue; }
  python - "$IT" <<'EOF' >> docs/golden_table/pose_transfer_track.jsonl
import json, sys
it = sys.argv[1]
d = json.load(open(f"/tmp/pose_track/eval_model_{it}.json"))
print(json.dumps({
    "iter": int(it),
    "completion_ratio": d["completion_ratio"],
    "E_mpjpe": d["accuracy"]["E_mpjpe"],
    "sim2sim_final_z": d["sim2sim_final_z"],
    "sim2sim_E_mpjpe": d["sim2sim"]["accuracy"]["E_mpjpe"],
    "sim2sim_L2_dof_jerk": d["sim2sim"]["smoothness"]["L2_dof_jerk"],
}))
EOF
  tail -1 $OUTJL
done
echo "[track] done"
