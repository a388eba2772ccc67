#!/bin/bash
# Round-3 resume session queue: validate new kernels, then headline, then
# shard1 anchor + phases.  Serial; generous timeouts (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
fail=0
step() {
  name=$1; tmo=$2; shift 2
  echo "=== $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" >"logs/$name.log" 2>&1
  rc=$?
  [ $rc -ne 0 ] && fail=1
  echo "    exit=$rc (log: logs/$name.log)"
}
step zc_pass 2400 python3 scripts/perf_zc_ns.py pass 256 512
NDSM_BENCH_TIMEOUT=3300 NDSM_BENCH_REPS=2 NDSM_BENCH_N=220 step bench_220 3400 python3 bench.py
step perf_shard1 2400 python3 scripts/perf_shard1.py 256
step phases_256 1500 python3 scripts/perf_phases.py --phases 256
step widths_256 3600 python3 scripts/perf_zc_ns.py solve 256 2 4 auto
echo "=== session queue complete (fail=$fail) ==="
exit $fail
