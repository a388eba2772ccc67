#!/bin/bash
# Round-4 remaining measurement queue (serial; ONE TPU client at a time).
# Run AFTER the interactive jobs finish.  Logs under logs/.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
fail=0

step() {
  name=$1; tmo=$2; shift 2
  echo "=== $name (timeout ${tmo}s) ===" >> logs/r4queue.log
  timeout "$tmo" "$@" > "logs/$name.log" 2>&1
  rc=$?
  [ $rc -ne 0 ] && fail=1
  echo "    exit=$rc (log: logs/$name.log)" >> logs/r4queue.log
}

step v2d_r4 2700 python3 scripts/perf_v2d.py
step shard1_r4 2700 python3 scripts/perf_shard1.py 256
step zc_pass512_r4 3600 python3 scripts/perf_zc_ns.py pass 512
step configs_r4 2700 python3 scripts/perf_configs.py
step scaling_max_r4 7200 python3 examples/integration_scaling.py --warm --fast \
  --out logs/rows_max_r4.txt
step digits_max_r4 60 python3 scripts/compare_golden.py logs/rows_max_r4.txt \
  /root/reference/tests/integration_test/results_test1.txt
step scaling_mean_r4 5400 python3 examples/integration_scaling.py --warm --fast --strict \
  --mean --scales 7.3 8 10 --out logs/rows_mean_r4.txt
step digits_mean_r4 60 python3 scripts/compare_golden.py logs/rows_mean_r4.txt \
  /root/reference/tests/integration_test/results_test2.txt
step bench_512_r4 3400 env NDSM_BENCH_TIMEOUT=3300 NDSM_BENCH_N=512 python3 bench.py

echo "=== r4queue complete (fail=$fail) ===" >> logs/r4queue.log
exit $fail
