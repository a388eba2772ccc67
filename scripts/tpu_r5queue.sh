#!/bin/bash
# Round-5 closing measurement queue (serial; CLAUDE.md rules).
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
step probe_r5q 900 python3 -c "import jax, jax.numpy as jnp; print(jax.devices()); print('PROBE_OK', float(jnp.sum(jnp.ones((8,128)))))"
grep -q "PROBE_OK 1024.0" logs/probe_r5q.log || { echo "TPU down"; exit 1; }
# full 9-row golden table under the round-5 solver (width-2 fine levels)
step scaling_max_r5 7200 python3 examples/integration_scaling.py --warm --fast --out logs/rows_max_r5.txt
step digits_max_r5_diff 60 python3 scripts/compare_golden.py logs/rows_max_r5.txt /root/reference/tests/integration_test/results_test1.txt
# second single-shard anchor at 512^3 (halo vs ext, same session)
step shard1_512_halo 3600 python3 scripts/perf_shard1.py 512
step shard1_512_ext  3600 env NDSM_TPU_ZC_HALO_ARGS=0 python3 scripts/perf_shard1.py 512
# BASELINE configs 1-2 refresh under the new widths
step configs_r5 2700 python3 scripts/perf_configs.py
echo "=== r5queue complete (fail=$fail) ==="
exit $fail
