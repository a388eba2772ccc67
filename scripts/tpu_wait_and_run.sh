#!/bin/bash
# Wait for the axon TPU to become claimable, then run the measurement
# queue.  Serial by design: one probe OR one runbook is the only TPU
# client at any moment (CLAUDE.md: one TPU-using process at a time).
#
# Deadline-aware: NDSM_WAIT_DEADLINE / NDSM_WAIT_FULL_UNTIL are epoch
# seconds.  After FULL_UNTIL only the reduced queue (~1.5 h) launches;
# after DEADLINE nothing launches and the waiter exits, so a driver-run
# bench.py at round end never contends with our processes.
#
# Claim behavior observed (rounds 4-5): the pool alternates between
# refusing fast (rc=1 "Unavailable") and hanging at the claim (rc=124).
# Patient 40-min attempts catch the chip the moment it frees; 20-min
# quiet gaps leave recovery room between attempts.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

DEADLINE=${NDSM_WAIT_DEADLINE:-0}
FULL_UNTIL=${NDSM_WAIT_FULL_UNTIL:-0}

while :; do
  now=$(date +%s)
  if [ "$DEADLINE" -gt 0 ] && [ "$now" -ge "$DEADLINE" ]; then
    echo "[$(date +%F' '%T)] deadline reached; waiter exiting" >> logs/wait.log
    exit 1
  fi
  echo "[$(date +%F' '%T)] patient claim attempt (40 min)" >> logs/wait.log
  timeout 2400 python3 -c "import jax, jax.numpy as jnp; print(jax.devices()); print('PROBE_OK', float(jnp.sum(jnp.ones((8,128)))))" >> logs/wait.log 2>&1
  rc=$?
  if [ $rc -eq 0 ] && grep -q "PROBE_OK 1024.0" logs/wait.log; then
    # Re-check the clock AFTER the (possibly ~40-min) claim: never
    # launch anything past DEADLINE, and keep even the reduced (~1.5 h)
    # queue from overrunning it.
    now=$(date +%s)
    if [ "$DEADLINE" -gt 0 ] && [ "$now" -ge $((DEADLINE - 5700)) ]; then
      echo "[$(date +%F' '%T)] claim succeeded but too close to the deadline; not launching" >> logs/wait.log
      exit 1
    fi
    queue=${NDSM_WAIT_QUEUE:-full}
    if [ "$FULL_UNTIL" -gt 0 ] && [ "$now" -ge "$FULL_UNTIL" ]; then
      queue=reduced
    fi
    echo "[$(date +%F' '%T)] TPU claimable; starting queue '$queue'" >> logs/wait.log
    bash scripts/tpu_runbook.sh "$queue" >> logs/runbook.log 2>&1
    echo "[$(date +%F' '%T)] runbook finished (rc=$?)" >> logs/wait.log
    exit 0
  fi
  echo "  claim rc=$rc; quiet for 1200 s" >> logs/wait.log
  sleep 1200
done
