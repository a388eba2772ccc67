#!/bin/bash
# Wait for the axon TPU to become claimable, then run the round-4/5
# measurement runbook (scripts/tpu_runbook_r4.sh).  Serial by design:
# one probe OR the runbook is the only TPU client at any moment
# (CLAUDE.md: one TPU-using process at a time).
#
# v2 strategy: PATIENT claims.  The device claim hangs while the chip
# is held elsewhere; a long-lived claimant grabs it the moment it
# frees, whereas frequent short-lived ones can miss the window and —
# if the pool treats a killed claimant as activity — keep resetting the
# server's recovery quiet-time.  So: one 40-minute claim attempt, then
# a 20-minute window with NO clients, repeated for up to ~12 h.
set -u
cd "$(dirname "$0")/.."
mkdir -p r4_logs

for i in $(seq 1 12); do
  echo "[$(date +%F' '%T)] patient claim attempt $i (40 min)" >> r4_logs/wait.log
  timeout 2400 python3 -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.sum(jnp.ones((8,128)))))" >> r4_logs/wait.log 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "[$(date +%F' '%T)] TPU claimable; starting runbook" >> r4_logs/wait.log
    bash scripts/tpu_runbook_r4.sh >> r4_logs/runbook.log 2>&1
    echo "[$(date +%F' '%T)] runbook finished (rc=$?)" >> r4_logs/wait.log
    exit 0
  fi
  echo "  claim rc=$rc; quiet for 1200 s" >> r4_logs/wait.log
  sleep 1200
done
echo "[$(date +%F' '%T)] gave up after 12 patient attempts" >> r4_logs/wait.log
exit 1
