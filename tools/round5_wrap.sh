#!/bin/bash
# Round-5 wrap: CPU-only evals that run AFTER the TPU chain frees the chip.
#   - terrain_walk_v3 hfield demos (box-sole scene, VERDICT r4 #2 "done"
#     criterion: completed:true on >=2 tiles + a flat-tile control)
#   - 29-DoF student: 3-input ONNX export + in-engine ratio + sim2sim diag
#   - golden table regen + single artifact commits
set -u
cd /root/repo
CPU=(nice -n 19 env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu)
mkdir -p docs/terrain/r5 docs/kb2_29 docs/golden_table

# --- terrain_walk_v3 demos ----------------------------------------------
V3=$(ls -t artifacts/terrain_walk_v3/ckpt/model_*.pkl 2>/dev/null | head -1)
if [ -n "${V3:-}" ]; then
  for RC in "0 1" "0 0" "2 0" "4 0"; do
    set -- $RC
    "${CPU[@]}" python tools/terrain_demo.py checkpoint="$V3" row=$1 col=$2 \
        out=docs/terrain/r5/walkv3_r$1c$2.json \
        >> /tmp/walkv3_demo.log 2>&1 \
      && echo "[wrap] walkv3 r$1c$2: $(python -c "import json;d=json.load(open('docs/terrain/r5/walkv3_r$1c$2.json'));print('COMPLETED' if d['completed'] else 'fall@%s'%d['first_fall_tick'])")" \
      || echo "[wrap] walkv3 r$1c$2 demo failed"
  done
  cp "$V3" docs/terrain/r5/terrain_walk_v3.pkl
  cp artifacts/terrain_walk_v3/config.yaml docs/terrain/r5/terrain_walk_v3.config.yaml
  git add docs/terrain/r5 && git commit -q -m "terrain_walk_v3 hfield demos (box-sole scene)" || true
fi

# --- 29-DoF student evals ------------------------------------------------
ST=$(ls -t artifacts/kb2_student29_r5/ckpt/model_*.pkl 2>/dev/null | head -1)
TE=$(ls -t artifacts/kb2_teacher29_r5/ckpt/model_*.pkl 2>/dev/null | head -1)
if [ -n "${ST:-}" ]; then
  "${CPU[@]}" python -m pbhc_tpu.deploy.export student "$ST" \
      docs/kb2_29/kb2_student29_r5.onnx \
    && echo "[wrap] 29dof student ONNX exported" || echo "[wrap] export failed"
  "${CPU[@]}" python -m pbhc_tpu.eval.batch_eval checkpoint="$ST" \
      mode=ratio num_envs=64 > docs/kb2_29/student_ratio.json 2>/tmp/ratio29.log \
    || echo "[wrap] student ratio failed"
  [ -n "${TE:-}" ] && "${CPU[@]}" python -m pbhc_tpu.eval.batch_eval \
      checkpoint="$TE" mode=ratio num_envs=64 \
      > docs/kb2_29/teacher_ratio.json 2>>/tmp/ratio29.log \
    || true
  nice -n 19 python tools/diag_sim2sim_fall.py checkpoint="$ST" \
      onnx=docs/kb2_29/kb2_student29_r5.onnx > docs/kb2_29/diag_sim2sim.txt 2>&1 \
    || echo "[wrap] 29dof sim2sim diag failed"
  git add docs/kb2_29 && git commit -q -m "KB2 29-DoF student evals (ratio + sim2sim diag)" || true
fi

python tools/golden_table.py > docs/golden_table/TABLE.md
git add docs/golden_table && git commit -q -m "Golden table regen (round-5 wrap)" || true
echo "[wrap] done"
