#!/bin/bash
# Round-4 stage 1 (VERDICT r3 #2 then #1, in the cheap-first order #8 demands):
#   a) measure the pair-budget sweep rows that were coded but never run in
#      round 3 (tools/sweep_knobs.py pair*) — minutes of TPU, primes the
#      compile cache, and produces the RESULTS.md round-4 throughput record;
#   b) RESUME the KB2 teacher from the round-3 checkpoint (iter 12500,
#      logs/PBHC_TPU/*kb2_teacher23_r3*/ckpt/model_12500) to 24000 iters.
#      Resume, don't restart: restarting cost round 3 ~2 h.
# Appends teacher output to /tmp/teacher_r3.log so tools/kb2_r3_stage2.sh's
# wait condition ("[train] done in" + model_24000) fires unchanged.
set -u
cd /root/repo
mkdir -p docs/sweeps

for CFG in pair4 pair2 pair0_global_top8 pair4_bf16 pair4_pallas; do
  [ -f /tmp/round4_stop ] && exit 0
  timeout 600 python tools/sweep_knobs.py "$CFG" \
      >> docs/sweeps/r4_pair_budget.jsonl 2>>/tmp/sweep_r4.err \
    || echo "{\"config\": \"$CFG\", \"error\": true}" >> docs/sweeps/r4_pair_budget.jsonl
done
echo "[stage1] sweep done:"
cat docs/sweeps/r4_pair_budget.jsonl

[ -f /tmp/round4_stop ] && exit 0
bash tools/train_retry.sh 24000 exp=general_tracking robot=g1_23dof_student \
    obs=general_tracking_teacher rewards=general_tracking domain_rand=main \
    simulator=tpu robot.motion.motion_file=assets/motions/g1_ue_walk_23dof.pkl \
    num_envs=2048 experiment_name=kb2_teacher23_r3 seed=1 \
    algo.config.save_interval=250 >> /tmp/teacher_r3.log 2>&1
echo "[stage1] teacher done rc=$?"
