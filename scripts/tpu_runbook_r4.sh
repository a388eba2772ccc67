#!/bin/bash
# Round-4 TPU measurement queue — run when the axon tunnel is back.
# Serial (ONE TPU process at a time), generous timeouts, continue on
# failure, everything logged under r4_logs/.
set -u
cd "$(dirname "$0")/.."
mkdir -p r4_logs

step() {
  name=$1; tmo=$2; shift 2
  echo "=== $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" >"r4_logs/$name.log" 2>&1
  echo "    exit=$? (log: r4_logs/$name.log)"
}

# 0. probe
step probe 180 python3 -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.sum(jnp.ones((8,128)))))"
grep -q "8.0\|1024" r4_logs/probe.log || { echo "TPU not available; aborting"; exit 1; }

# 0b. transfer characterization (threaded vs serial download)
step transfer 900 python3 scripts/transfer_probe.py 220

# 1. round-4 micro/solve measurements (df fused vs unfused vs f64;
#    batched vs sequential) at 256 and the 220 headline size
step perf_256 2400 python3 scripts/perf_r4.py 256
step perf_220 2400 python3 scripts/perf_r4.py 220

# 1b. round-5: metric-fused final post-smooth vs the XLA du pass
#     (bitwise-identical solutions; measures the per-cycle saving),
#     plus the per-phase V-cycle breakdown that decides whether
#     transfer-op (restrict/prolong) fusion is worth building
step perf_r5 2400 python3 scripts/perf_r5.py 256 220
step perf_r5_phases 1800 python3 scripts/perf_r5.py --phases 256

# 2. golden-gated benches at the df32-affected sizes + headline
NDSM_BENCH_TIMEOUT=2100 NDSM_BENCH_THROUGHPUT=0 NDSM_BENCH_N=160 step bench_160 2200 python3 bench.py
NDSM_BENCH_TIMEOUT=2100 NDSM_BENCH_THROUGHPUT=0 NDSM_BENCH_N=176 step bench_176 2200 python3 bench.py
NDSM_BENCH_TIMEOUT=2700 NDSM_BENCH_REPS=2       NDSM_BENCH_N=220 step bench_220 2800 python3 bench.py

# 3. 512^3 (BASELINE config 4) incl. the 512^3 smoother SoL measurement
NDSM_BENCH_TIMEOUT=3000 NDSM_BENCH_N=512 step bench_512 3100 python3 bench.py

# 4. golden digits, both metrics, at 160/176/220 (reference table rows)
step digits_max  5400 python3 examples/integration_scaling.py --scales 7.3 8 10 --out r4_logs/rows_max.txt
step digits_mean 5400 python3 examples/integration_scaling.py --mean --scales 7.3 8 10 --out r4_logs/rows_mean.txt

step digits_diff_max 60 python3 scripts/compare_golden.py r4_logs/rows_max.txt /root/reference/tests/integration_test/results_test1.txt
step digits_diff_mean 60 python3 scripts/compare_golden.py r4_logs/rows_mean.txt /root/reference/tests/integration_test/results_test2.txt

echo "=== runbook complete; see r4_logs/ ==="
