#!/bin/bash
# Round-4 session-D: the 06:44 and 06:59 Side_kick relaunches both wedged in
# env init (stuck tunnel grant — same signature round4_recover.sh handled).
# Probe with a tiny jitted op until a claim succeeds, then hand off to the
# session-C resume+eval chain (round4c_sidekick.sh). All stages bounded so
# the TPU is free for the driver bench by STOP_EPOCH+~10min.
#
# Usage: STOP_EPOCH=<epoch> bash tools/round4d_chain.sh
set -u
STOP_EPOCH=${STOP_EPOCH:?unix time when the TPU must be freed}
cd /root/repo

echo "[4d] probing tunnel..."
for i in $(seq 1 20); do
  [ "$(date +%s)" -ge "$STOP_EPOCH" ] && { echo "[4d] deadline before recovery"; exit 1; }
  if timeout 150 python -c "
import jax, jax.numpy as jnp
print('probe devices:', jax.devices())
print('probe op:', jax.jit(lambda x: (x + 1).sum())(jnp.ones(8)))
"; then
    echo "[4d] tunnel healthy after $i probes"
    break
  fi
  echo "[4d] probe $i failed; sleeping 120s"
  sleep 120
done

STOP_EPOCH=$STOP_EPOCH exec bash tools/round4c_sidekick.sh
