#!/bin/bash
# Round-6 TPU queue: the highest-value subset of the r4/r5 measurement
# backlog, sized to fit inside one driver round (~45 min worst case) so
# the chip is free again before the driver's end-of-round bench.
set -u
cd "$(dirname "$0")/.."
mkdir -p r4_logs

step() {
  name=$1; tmo=$2; shift 2
  echo "=== $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" >"r4_logs/$name.log" 2>&1
  echo "    exit=$? (log: r4_logs/$name.log)"
}

step probe 180 python3 -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.sum(jnp.ones((8,128)))))"
grep -q "8.0\|1024" r4_logs/probe.log || { echo "TPU not available; aborting"; exit 1; }

# 1. headline golden-gated bench (accuracy gate = digit re-verification;
#    also warms the server-side compile cache for the driver's bench run)
NDSM_BENCH_TIMEOUT=1400 NDSM_BENCH_N=220 step bench_220 1500 python3 bench.py

# 2. round-5 metric fusion: on-chip bitwise parity + per-cycle saving
step perf_r5 1100 python3 scripts/perf_r5.py 256

# 3. per-phase V-cycle breakdown (decides restrict/prolong fusion)
step perf_r5_phases 700 python3 scripts/perf_r5.py --phases 256

echo "=== r6 runbook complete; see r4_logs/ ==="
