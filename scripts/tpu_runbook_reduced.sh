#!/bin/bash
# Reduced TPU measurement queue (~1.5 h) for when the chip comes back
# LATE in a round: the highest-value subset of tpu_runbook_r4.sh —
# on-chip bitwise validation of the metric fusion, and the golden-gated
# headline benches (which re-verify the 160/220 digit parity via
# bench.py's accuracy gate).
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

# metric fusion on-chip: bitwise parity + per-cycle saving
step perf_r5 1800 python3 scripts/perf_r5.py 256

# golden-gated benches (accuracy gate = digit re-verification)
NDSM_BENCH_TIMEOUT=1500 NDSM_BENCH_THROUGHPUT=0 NDSM_BENCH_N=160 step bench_160 1600 python3 bench.py
NDSM_BENCH_TIMEOUT=2100 NDSM_BENCH_N=220 step bench_220 2200 python3 bench.py

echo "=== reduced runbook complete; see r4_logs/ ==="
