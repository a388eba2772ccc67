#!/bin/bash
# Wait for the axon TPU to become claimable, then run the round-4
# measurement runbook (scripts/tpu_runbook_r4.sh).  Serial by design:
# one probe OR the runbook is the only TPU client at any moment
# (CLAUDE.md: one TPU-using process at a time).
#
# The probe can hang at the device claim when the chip is held
# elsewhere; each attempt gets a generous timeout (the claim phase
# involves no remote compile, so timing out is safe), then we back off.
set -u
cd "$(dirname "$0")/.."
mkdir -p r4_logs
: > r4_logs/wait.log

for i in $(seq 1 40); do
  echo "[$(date +%F' '%T)] probe attempt $i" >> r4_logs/wait.log
  timeout 300 python3 -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.sum(jnp.ones((8,128)))))" >> r4_logs/wait.log 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "[$(date +%F' '%T)] TPU claimable; starting runbook" >> r4_logs/wait.log
    bash scripts/tpu_runbook_r4.sh >> r4_logs/runbook.log 2>&1
    echo "[$(date +%F' '%T)] runbook finished (rc=$?)" >> r4_logs/wait.log
    exit 0
  fi
  echo "  probe rc=$rc; sleeping 600 s" >> r4_logs/wait.log
  sleep 600
done
echo "[$(date +%F' '%T)] gave up after 40 attempts" >> r4_logs/wait.log
exit 1
