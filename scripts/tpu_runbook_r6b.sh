#!/bin/bash
# Round-6 queue B: remaining high-value r4 backlog after the r6 queue —
# golden-gated benches at the df32-affected sizes, the df32/batched
# timing comparisons, and the mean-metric digit rows at 160/176/220.
set -u
cd "$(dirname "$0")/.."
mkdir -p r4_logs

step() {
  name=$1; tmo=$2; shift 2
  echo "=== $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" >"r4_logs/$name.log" 2>&1
  echo "    exit=$? (log: r4_logs/$name.log)"
}

NDSM_BENCH_TIMEOUT=500 NDSM_BENCH_THROUGHPUT=0 NDSM_BENCH_N=160 step bench_160 600 python3 bench.py
NDSM_BENCH_TIMEOUT=500 NDSM_BENCH_THROUGHPUT=0 NDSM_BENCH_N=176 step bench_176 600 python3 bench.py

step perf_r4_256 900 python3 scripts/perf_r4.py 256
step perf_r4_220 900 python3 scripts/perf_r4.py 220

step digits_mean 1500 python3 examples/integration_scaling.py --warm --mean --scales 7.3 8 10 --out r4_logs/rows_mean.txt
step digits_diff_mean 60 python3 scripts/compare_golden.py r4_logs/rows_mean.txt /root/reference/tests/integration_test/results_test2.txt

echo "=== r6b runbook complete; see r4_logs/ ==="
