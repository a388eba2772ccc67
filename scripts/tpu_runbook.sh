#!/bin/bash
# TPU measurement runbook — ONE parameterized queue script (replaces the
# former r4/r6/r6b/reduced runbooks).
#
#   scripts/tpu_runbook.sh [QUEUE]      QUEUE in: full | headline | perf |
#                                       reduced  (default: full)
#
# Rules (CLAUDE.md): serial — one TPU process at a time; generous
# timeouts (killing a client mid-compile can wedge the shared compile
# service); logs under logs/ (gitignored).  Exit status: 0 only if every
# step of the queue exited 0 (parity failures in perf scripts surface
# here).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
QUEUE=${1:-full}
fail=0

step() {
  name=$1; tmo=$2; shift 2
  echo "=== $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" >"logs/$name.log" 2>&1
  rc=$?
  [ $rc -ne 0 ] && fail=1
  echo "    exit=$rc (log: logs/$name.log)"
}

probe() {
  # First-call backend init + one tiny remote compile: allow the full
  # "tens of seconds to minutes, high variance" window before declaring
  # the chip down (a short timeout here can kill a healthy client
  # mid-compile and wedge the service).  Unique sentinel, anchored grep.
  step probe 900 python3 -c "import jax, jax.numpy as jnp; print(jax.devices()); print('PROBE_OK', float(jnp.sum(jnp.ones((8,128)))))"
  grep -q "PROBE_OK 1024.0" logs/probe.log || { echo "TPU not available; aborting"; exit 1; }
}

q_headline() {
  # Golden-gated headline bench: digit re-verification + f32-download
  # mode + 256^3/512^3 smoother SoL fields.  (env vars go through
  # `env` INSIDE the step invocation — a VAR=... prefix on a shell
  # function is bash-specific temporary export and leaks under POSIX
  # mode; ADVICE r3.)
  step bench_220 3400 env NDSM_BENCH_TIMEOUT=3300 NDSM_BENCH_REPS=2 NDSM_BENCH_N=220 python3 bench.py
}

q_perf() {
  # End-to-end solve timings (default/strict/batched) + phase breakdown.
  step perf_solves 2700 python3 scripts/perf_phases.py 256
  step perf_phases 1200 python3 scripts/perf_phases.py --phases 256
  # Sharded-engine single-shard overhead anchor (VERDICT r2 item 7).
  step perf_shard1 2700 python3 scripts/perf_shard1.py 256
}

q_widths() {
  # Round-8 kernel validation + measurements, in dependency order:
  # 1. bitwise A/B of the in-place-halves kernel vs the saved capture
  #    (dense outputs must be BITWISE; mean sums may re-grid),
  # 2. pass-rate sweeps at the default and re-calibrated VMEM budgets,
  # 3. end-to-end width A/Bs on the fixed (pre-upload) harness,
  # 4. V-cycle phase breakdown at the auto widths.
  if [ -f /tmp/zc_ab_r4.npz ]; then
    step zc_ab 3000 python3 scripts/zc_ab_capture.py check /tmp/zc_ab_r4.npz
  elif [ -f /tmp/zc_ab_r3.npz ]; then
    step zc_ab 3000 python3 scripts/zc_ab_capture.py check /tmp/zc_ab_r3.npz
  fi
  step zc_pass 3000 python3 scripts/perf_zc_ns.py pass 256 512
  step zc_pass_vmem14 3000 env NDSM_TPU_ZC_VMEM=14680064 python3 scripts/perf_zc_ns.py pass 256 512
  step widths_512 5400 python3 scripts/perf_zc_ns.py solve 512 2 4
  step widths_256 5400 python3 scripts/perf_zc_ns.py solve 256 2 4 auto
  step phases_256 1800 python3 scripts/perf_phases.py --phases 256
}

q_digits() {
  step digits_max  5400 python3 examples/integration_scaling.py --warm --scales 7.3 8 10 --out logs/rows_max.txt
  step digits_diff_max 60 python3 scripts/compare_golden.py logs/rows_max.txt /root/reference/tests/integration_test/results_test1.txt
  step digits_mean 5400 python3 examples/integration_scaling.py --warm --mean --scales 7.3 8 10 --out logs/rows_mean.txt
  step digits_diff_mean 60 python3 scripts/compare_golden.py logs/rows_mean.txt /root/reference/tests/integration_test/results_test2.txt
}

q_r4() {
  # Round-4 items (VERDICT r3): pipelined-fetch headline decomposition,
  # split16 golden validation, 220^3 width A/B, v2d on-chip, phase
  # breakdown (restrict/prolong fusion call), single-shard overhead,
  # 512^3 pass-rate table.
  step headline_phases 2400 env NDSM_PERF_REPS=3 python3 scripts/perf_headline_phases.py 220
  step headline_split16 2400 env NDSM_PERF_REPS=3 python3 scripts/perf_headline_phases.py 220 split16
  step widths_220 5400 python3 scripts/perf_zc_ns.py solve 220 3 4
  step v2d 2700 python3 scripts/perf_v2d.py
  step phases_256 1800 python3 scripts/perf_phases.py --phases 256
  step shard1 2700 python3 scripts/perf_shard1.py 256
  step zc_pass_512 3000 python3 scripts/perf_zc_ns.py pass 512
}

q_r5ab() {
  # VERDICT r4 item 5: settle the 256^3 pass-width question with a
  # SAME-SESSION A/B on both bases (smoother_gdof_s AND end-to-end
  # solve_s) — bench.py twice (width 2 pinned vs auto), then the perf
  # harness end-to-end width sweep and the raw kernel pass rates.
  step bench_220_w2   3400 env NDSM_BENCH_TIMEOUT=3300 NDSM_TPU_PALLAS_NSWEEPS=2 python3 bench.py
  step bench_220_auto 3400 env NDSM_BENCH_TIMEOUT=3300 python3 bench.py
  step widths_256_r5  5400 python3 scripts/perf_zc_ns.py solve 256 2 4 auto
  step zc_pass_256_r5 3000 python3 scripts/perf_zc_ns.py pass 256
}

q_r5perf() {
  # Round-5 kernel landing measurements: single-shard overhead with the
  # in-kernel halo-DMA path vs the extended-input path (same session),
  # then the headline + 512^3 benches under the recalibrated width
  # picker (width 2 on fine levels).
  step shard1_halo 3600 python3 scripts/perf_shard1.py 256
  step shard1_ext  3600 env NDSM_TPU_ZC_HALO_ARGS=0 python3 scripts/perf_shard1.py 256
  step bench_220_r5 3400 env NDSM_BENCH_TIMEOUT=3300 python3 bench.py
  step bench_512_r5 3400 env NDSM_BENCH_TIMEOUT=3300 NDSM_BENCH_N=512 python3 bench.py
}

case "$QUEUE" in
  r5perf)   probe; q_r5perf ;;
  r5ab)     probe; q_r5ab ;;
  headline) probe; q_headline ;;
  r4)       probe; q_r4; q_headline ;;
  perf)     probe; q_perf ;;
  widths)   probe; q_widths ;;
  digits)   probe; q_digits ;;
  r8)       probe; q_widths; q_headline
            step bench_512 3400 env NDSM_BENCH_TIMEOUT=3300 NDSM_BENCH_N=512 python3 bench.py ;;
  reduced)  probe; q_perf; q_headline ;;
  full)
    probe
    q_headline
    q_perf
    step bench_512 3400 env NDSM_BENCH_TIMEOUT=3300 NDSM_BENCH_N=512 python3 bench.py
    q_digits
    ;;
  *) echo "unknown queue: $QUEUE"; exit 2 ;;
esac

echo "=== runbook '$QUEUE' complete (fail=$fail); see logs/ ==="
exit $fail
