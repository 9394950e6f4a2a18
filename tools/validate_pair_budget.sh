#!/bin/bash
# VERDICT r3 follow-up: validate a smaller self-collision pair budget against
# a trained self-collision-heavy policy before adopting it as the default.
# Runs the in-engine episode-ratio harness on the same checkpoint under the
# shipped pair_cap=4 and the candidate cap, printing both JSONs; the candidate
# is adoptable when its completion ratio matches pair4 (and the crossing-arms
# gate in tests/test_contact_budget.py stays green).
#
# Usage: bash tools/validate_pair_budget.sh <checkpoint> [cap] [num_envs]
set -eu
CKPT=$1
CAP=${2:-3}
NENV=${3:-64}
cd /root/repo

echo "[pair_budget] checkpoint: $CKPT"
echo "[pair_budget] pair_cap=4 (shipped):"
python -m pbhc_tpu.eval.batch_eval checkpoint="$CKPT" mode=ratio \
    num_envs="$NENV" simulator.config.pair_cap=4
echo "[pair_budget] pair_cap=$CAP (candidate):"
python -m pbhc_tpu.eval.batch_eval checkpoint="$CKPT" mode=ratio \
    num_envs="$NENV" simulator.config.pair_cap="$CAP"
