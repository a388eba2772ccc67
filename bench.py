#!/usr/bin/env python3
"""Headline benchmark + north-star metrics.

Primary: full Coulomb-gauge vector-potential solve at NDSM_BENCH_N^3
(default 220 — the reference's largest golden configuration,
results_test1.txt row 9: 174.06 s max-metric on its multicore CPU).

Prints ONE JSON line whose required keys are
  {"metric": ..., "value": <wall seconds>, "unit": "s", "vs_baseline": <x>}
plus north-star diagnostics (BASELINE.json: "Stencil updates (DOF)/s/chip;
V-cycles + wall-clock to vc_tol"):
  solve_s           wall of the nine sub-solves (compute path, excludes
                    the host<->device result transfers that dominate on
                    tunneled runtimes — PERF_NOTES.md),
  transfer_s        wall - pipeline time (result download + glue),
  cycles            per-sub-solve V-cycle counts,
  smoother_gdof_s   smoother-phase throughput in 1e9 stencil point-updates
                    per second per chip, measured from a single compiled
                    K-sweep loop program (the only timing form that is
                    honest through the tunnel),
  smoother_sol_pct  fraction of the HBM speed-of-light bound for the
                    measured configuration's TRUE streamed bytes: the
                    zc kernel streams 12 B/point per PASS (read u, read
                    rhs, write u) and fuses ``nsweeps`` sweeps per pass,
                    so an ms-sweep smooth composed of passes of width
                    ns costs 12*len(passes)/ms B per point-sweep
                    (7.2 B at ms=5, ns=2 -> 2+2+1).  The XLA fallback
                    basis is 24 B/pt-sw (two masked half-updates, each
                    3 arrays).  By construction the bound is an upper
                    bound for the measured program, so sol_pct <= 100,
  smoother_backend  "pallas-zc" / ... / "xla" (fallback); measured at
                    256^3 and (smoother512_* fields) at 512^3 — the
                    north-star size (BASELINE.json).

The run is accepted only if the computed errors match the golden table
(or, for non-golden sizes, the h^2 trend fitted to it); otherwise
vs_baseline is 0.0.

Env: NDSM_BENCH_N (220), NDSM_BENCH_PRECISION (mixed), NDSM_BENCH_REPS
(2), NDSM_BENCH_TIMEOUT (2700 s watchdog), NDSM_BENCH_THROUGHPUT (1 —
set 0 to skip the smoother-phase measurement), NDSM_BENCH_HBM_GBS (819,
v5e peak HBM bandwidth for the SoL reference).
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from ndsm_tpu import vector_potential  # noqa: E402
from ndsm_tpu.utils.testing import potential_field_case, build_test_mesh  # noqa: E402

# Golden rows (tests/integration_test/results_test1.txt): n -> (Ea_max,
# Eb_max, ref_time_s).  ref times from the max-metric table.
GOLDEN = {
    22: (1.86048e-03, 7.65805e-02, 5.468e-01),
    44: (4.44560e-04, 1.95261e-02, 1.141e00),
    66: (1.94618e-04, 8.72558e-03, 4.344e00),
    77: (1.42398e-04, 6.42133e-03, 7.923e00),
    88: (1.08647e-04, 4.92049e-03, 1.173e01),
    99: (8.56395e-05, 3.89144e-03, 1.587e01),
    160: (3.25317e-05, 1.49319e-03, 6.701e01),
    176: (2.68552e-05, 1.23446e-03, 8.930e01),
    220: (1.71483e-05, 7.90579e-04, 1.741e02),
}

# h^2 prefactors fitted to the golden table (errors = a * dx^2), for
# accuracy-gating non-golden sizes; and the reference's fitted runtime
# exponent t ~ N^2.66 (ndsm_notes.pdf 5.1.2 Fig. 2) for extrapolating
# vs_baseline beyond 220^3.
_EA_PREFAC = 1.86048e-03 / 4.76190e-02**2
_EB_PREFAC = 7.65805e-02 / 4.76190e-02**2
_REF_T220 = 1.741e02
_REF_EXP = 2.66


def _arm_watchdog(seconds: float, metric: str):
    """Emit a failure JSON and hard-exit if the benchmark wedges (e.g. a
    hung remote compile service) so the driver always gets one line."""

    def fire():
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": -1.0,
                    "unit": "s",
                    "vs_baseline": 0.0,
                }
            ),
            flush=True,
        )
        print("bench watchdog fired: run exceeded budget", file=sys.stderr)
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def _sol_bytes_per_pt_sweep(backend: str, ms: int, shape=None) -> float:
    """True streamed bytes per point-sweep for the measured smooth call.

    The Pallas kernels stream 12 B/point per HBM pass (f32 u in, rhs in,
    u out — ops/pallas_zc.py docstring) and fuse a per-level pass width
    (env NDSM_TPU_PALLAS_NSWEEPS, else ops/pallas_zc.auto_pass_width);
    the engine composes an ms-sweep smooth from ceil-chunks of that
    width.  The XLA compact fallback runs 2 masked half-updates each
    touching 3 arrays.
    """
    if backend.startswith("pallas"):
        from ndsm_tpu.mg.engine import _pallas_nsweeps

        ns = min(ms, _pallas_nsweeps(shape))
        n_passes = ms // ns + (1 if ms % ns else 0)
        return 12.0 * n_passes / ms
    return 24.0


def smoother_throughput(m: int, precision: str):
    """Measure the production smoother's phase throughput at an eligible
    3D shape: K sweeps inside ONE compiled program, result reduced to a
    scalar on device and fetched (forces completion; per-op timings lie
    through tunneled runtimes — PERF_NOTES.md).  Returns a dict or None.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ndsm_tpu.grids import GridHierarchy
    from ndsm_tpu.mg.poisson import PoissonBVP
    from ndsm_tpu.options import Options

    x = np.linspace(0.0, 1.0, m)
    h = GridHierarchy.from_mesh((x, x, x), ngrids=2)
    bcs = (("D", "D"), ("D", "D"), ("N", "N"))
    bvp = PoissonBVP(h, bcs, Options(precision="mixed"))
    eng = bvp._inner  # float32 engine: the production smoothing path
    w0 = eng._pass_width(bvp.options.ms, 0)  # per-level auto width
    if eng._pallas_zc_fn(0, w0) is not None:
        backend = "pallas-zc"
    elif eng._pallas_compact_fn(0, 2) is not None:
        backend = "pallas-compact"
    elif eng._pallas_smooth_fn(0, 2) is not None:
        backend = "pallas-fused"
    else:
        backend = "xla"

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((m, m, m)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((m, m, m)), jnp.float32)
    K = 12  # K * ms sweeps per timed program
    ms = bvp.options.ms

    def loop(K, u, r):
        return jnp.sum(
            lax.fori_loop(0, K, lambda _, v: eng.t_smooth(v, r, 0), u)
        )

    f = jax.jit(loop, static_argnums=0)
    # K-differenced: subtracts the fixed dispatch/tunnel floor (~30 ms)
    # that a single-K timing would fold into the rate (PERF_NOTES.md).
    K2 = 3 * K
    float(jax.device_get(f(K, u, r)))  # warm (compile)
    float(jax.device_get(f(K2, u, r)))
    t0 = time.perf_counter()
    float(jax.device_get(f(K, u, r)))
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jax.device_get(f(K2, u, r)))
    d2 = time.perf_counter() - t0
    dt = max(d2 - d1, 1e-9)
    sweeps = (K2 - K) * ms
    rate = m**3 * sweeps / dt
    bw = float(os.environ.get("NDSM_BENCH_HBM_GBS", "819")) * 1e9
    sol = bw / _sol_bytes_per_pt_sweep(backend, ms, (m, m, m))
    # Honest SoL basis: the TRUE HBM traffic of the measured passes,
    # INCLUDING the halo overread (each pass reads u and rhs as
    # (W_z, W_y) windows but writes only the (tz, ty) tile, so bytes
    # per point per pass = (2/frac + 1) * 4, not 12).  The 12 B basis
    # is the zero-overread ideal; the gap between the two quantifies
    # what bigger VMEM windows (tile fraction -> 1) would buy.
    honest = {}
    if backend == "pallas-zc":
        from ndsm_tpu.ops.pallas_zc import auto_pass_width, pick_tiles_zc

        shape = (m, m, m)
        ns0 = min(ms, int(os.environ.get(
            "NDSM_TPU_PALLAS_NSWEEPS", auto_pass_width(shape, ms)
        )))
        widths = [ns0] * (ms // ns0) + ([ms % ns0] if ms % ns0 else [])
        bpp = 0.0
        for w in widths:
            p = pick_tiles_zc(shape, w)
            frac = (p[0] * p[1]) / (p[2] * p[3]) if p else 1.0
            bpp += (2.0 / frac + 1.0) * 4.0
        honest_bytes = bpp / ms
        honest = {
            "smoother_sol_honest_pct": round(
                100.0 * rate * honest_bytes / bw, 1
            ),
            "smoother_hbm_gbs": round(rate * honest_bytes / 1e9, 1),
        }
    return {
        "smoother_shape": m,
        "smoother_backend": backend,
        "smoother_gdof_s": round(rate / 1e9, 2),
        "smoother_sol_pct": round(100.0 * rate / sol, 1),
        **honest,
        # Outer-defect arithmetic at the aligned shape: "df32" = the
        # double-float Pallas kernel (ops/pallas_df.py), "f64" = emulated
        # float64 XLA.
        "defect_backend": "df32" if getattr(bvp, "df_defect", False) else "f64",
    }


def main():
    n = int(os.environ.get("NDSM_BENCH_N", "220"))
    precision = os.environ.get("NDSM_BENCH_PRECISION", "mixed")
    # 2 reps by default: the headline is link-bound and the relay's
    # bandwidth swings 2-4x minute-to-minute (PERF_NOTES round 4);
    # min-of-2 shields a single bad-weather rep.  Cache-warm reps
    # cost ~7-17 s each, well inside the watchdog.
    reps = int(os.environ.get("NDSM_BENCH_REPS", "2"))
    do_tp = os.environ.get("NDSM_BENCH_THROUGHPUT", "1") != "0"

    budget = float(os.environ.get("NDSM_BENCH_TIMEOUT", "2700"))
    watchdog = _arm_watchdog(budget, f"vector_potential_{n}^3_wall_clock")

    x, y, z = build_test_mesh(n)
    Z, Y, X = np.meshgrid(z, y, x, indexing="ij")
    A1, b1 = potential_field_case(X, Y, Z)

    # host_curl: compute B = curl(A) host-side from the downloaded A
    # (ulp-identical; halves the result download — decisive through the
    # tunnel, where the download is most of the wall).  NDSM_BENCH_HOST_CURL=0
    # restores the all-device path.
    from ndsm_tpu import Options

    host_curl = os.environ.get("NDSM_BENCH_HOST_CURL", "1") != "0"
    # split16 wire format (f32 + int16 correction, 6 B/point): validated
    # on chip round 4 — 220^3 golden digits EXACT (logs/
    # headline_split16_r4.log); reconstruction error ~2e-13, five orders
    # below truncation.  The golden gate below still guards every run;
    # NDSM_BENCH_ENCODING=f64 reverts to raw 8 B/point downloads.
    encoding = os.environ.get("NDSM_BENCH_ENCODING", "split16")
    opts = Options(
        precision=precision, host_curl=host_curl, fetch_encoding=encoding
    )

    # Warmup (includes compilation)
    t0 = time.perf_counter()
    ierr, A2, b2, winfo = vector_potential(
        x, y, z, b1.copy(), options=opts, full_output=True
    )
    warm = time.perf_counter() - t0
    print(f"warmup (incl. compile): {warm:.2f}s ierr={ierr}", file=sys.stderr)

    times = []
    info = None
    for _ in range(reps):
        # b1 is passed WITHOUT a defensive copy: the API reads only the
        # boundary faces and never mutates its input (asserted by
        # tests/test_api.py), and a 256 MB host copy inside the timed
        # region is overhead the reference doesn't pay.
        t0 = time.perf_counter()
        ierr, A2, b2, info = vector_potential(
            x, y, z, b1, options=opts, full_output=True
        )
        times.append(time.perf_counter() - t0)
    wall = min(times)
    solve_s = 0.0
    cycles = {}
    if info is not None:
        seen_batches = set()
        for s in info.chi + info.components:
            cycles[s.name] = s.cycles
            # batched lanes share one program wall; count it once
            key = (s.wall_time, s.batch_size)
            if s.batch_size > 1 and key in seen_batches:
                continue
            seen_batches.add(key)
            solve_s += s.wall_time
            print(
                f"  {s.name}: {s.wall_time:.3f}s cycles={s.cycles} "
                f"du={s.du_last:.2e} batch={s.batch_size}",
                file=sys.stderr,
            )
    pipeline_s = info.wall_time if info is not None else wall
    transfer_s = max(0.0, wall - solve_s)

    Ea = np.linalg.norm(A1 - A2, axis=0)
    Eb = np.linalg.norm(b1 - b2, axis=0)
    ea_max, eb_max = float(Ea.max()), float(Eb.max())

    ok = ierr == 0
    dx = 1.0 / (n - 1)
    if n in GOLDEN:
        g_ea, g_eb, ref_time = GOLDEN[n]
        ok = ok and abs(ea_max - g_ea) < 2e-3 * g_ea and abs(eb_max - g_eb) < 2e-3 * g_eb
        ref_extrapolated = False
    else:
        g_ea, g_eb = _EA_PREFAC * dx**2, _EB_PREFAC * dx**2
        ok = ok and abs(ea_max - g_ea) < 0.2 * g_ea and abs(eb_max - g_eb) < 0.2 * g_eb
        ref_time = _REF_T220 * (n / 220.0) ** _REF_EXP
        ref_extrapolated = True
    print(
        f"errors: Ea_max={ea_max:.5e} (target {g_ea:.5e}) "
        f"Eb_max={eb_max:.5e} (target {g_eb:.5e}) accuracy_ok={ok}",
        file=sys.stderr,
    )
    vs = (ref_time / wall) if (ok and ref_time) else 0.0

    # float32-download mode: the result arrays leave the device as f32,
    # halving the dominant transfer (with host_curl only A is fetched).
    # Measured as a SECOND configuration with its own accuracy fields:
    # the digit gate (matching the f64 golden digits to 2e-3 relative)
    # may legitimately fail at f32 resolution even though the physical
    # errors (~1e-5, truncation-dominated) are unchanged — the trend
    # gate (20% of the fitted h^2 law) is the meaningful bound there.
    f32_fields = {}
    if os.environ.get("NDSM_BENCH_F32_OUT", "1") != "0":
        import dataclasses as _dc

        opts32 = _dc.replace(opts, output_dtype="float32")
        t0 = time.perf_counter()
        ierr32, A3, b3, _ = vector_potential(
            x, y, z, b1.copy(), options=opts32, full_output=True
        )
        _w = time.perf_counter() - t0  # cold (new output-stage programs)
        t0 = time.perf_counter()
        ierr32, A3, b3, _ = vector_potential(
            x, y, z, b1.copy(), options=opts32, full_output=True
        )
        wall32 = time.perf_counter() - t0
        ea32 = float(np.linalg.norm(A1 - A3, axis=0).max())
        eb32 = float(np.linalg.norm(b1 - b3, axis=0).max())
        digit_ok32 = (
            ierr32 == 0
            and abs(ea32 - g_ea) < 2e-3 * g_ea
            and abs(eb32 - g_eb) < 2e-3 * g_eb
        )
        trend_ok32 = (
            ierr32 == 0
            and abs(ea32 - g_ea) < 0.2 * g_ea
            and abs(eb32 - g_eb) < 0.2 * g_eb
        )
        f32_fields = {
            "wall_f32_out": round(wall32, 4),
            "ea_max_f32": ea32,
            "eb_max_f32": eb32,
            "accuracy_digits_ok_f32": digit_ok32,
            # digits_ok_f32=False is the EXPECTED outcome for the f32
            # download mode (outputs truncated to f32 cannot reproduce
            # the golden table's f64 digits); the gate that must hold
            # for it is trend_ok (errors within 20% of golden).  The
            # headline gate is the f64 accuracy_ok field above.
            "accuracy_digits_f32_expected": False,
            "accuracy_trend_ok_f32": trend_ok32,
        }
        print(
            f"f32-out: wall={wall32:.2f}s Ea={ea32:.5e} Eb={eb32:.5e} "
            f"digits_ok={digit_ok32} trend_ok={trend_ok32}",
            file=sys.stderr,
        )

    out = {
        "metric": f"vector_potential_{n}^3_wall_clock",
        "value": round(wall, 4),
        "unit": "s",
        "vs_baseline": round(vs, 2),
        "solve_s": round(solve_s, 3),
        "transfer_s": round(transfer_s, 3),
        "pipeline_s": round(pipeline_s, 3),
        "cycles": cycles,
        "accuracy_ok": ok,
        "ea_max": ea_max,
        "eb_max": eb_max,
        "precision": precision,
        "host_curl": host_curl,
        "fetch_encoding": encoding,
        "phases": {
            k: round(v, 3) for k, v in (info.phases or {}).items()
        } if info is not None else {},
        "ref_time_extrapolated": ref_extrapolated,
    }
    out.update(f32_fields)
    if do_tp:
        # 256^3 (the aligned production size nearest the bench headline)
        # and 512^3 (the north-star size, BASELINE.json) — independent
        # programs, second shape skippable via NDSM_BENCH_THROUGHPUT_512=0.
        try:
            tp = smoother_throughput(256, precision)
            if tp:
                out.update(tp)
        except Exception as e:  # never let the metric sink the headline
            print(f"smoother throughput failed: {e}", file=sys.stderr)
        if os.environ.get("NDSM_BENCH_THROUGHPUT_512", "1") != "0":
            try:
                tp = smoother_throughput(512, precision)
                if tp:
                    out.update(
                        {
                            "smoother512_backend": tp["smoother_backend"],
                            "smoother512_gdof_s": tp["smoother_gdof_s"],
                            "smoother512_sol_pct": tp["smoother_sol_pct"],
                        }
                    )
                    for k in ("smoother_sol_honest_pct", "smoother_hbm_gbs"):
                        if k in tp:
                            out[k.replace("smoother_", "smoother512_")] = tp[k]
            except Exception as e:
                print(f"512^3 smoother throughput failed: {e}", file=sys.stderr)

    watchdog.cancel()
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — driver needs ONE JSON line
        if isinstance(e, SystemExit):
            raise
        import traceback

        traceback.print_exc()
        n = os.environ.get("NDSM_BENCH_N", "220")
        print(
            json.dumps(
                {
                    "metric": f"vector_potential_{n}^3_wall_clock",
                    "value": -1.0,
                    "unit": "s",
                    "vs_baseline": 0.0,
                    "error": f"{type(e).__name__}: {e}"[:300],
                }
            ),
            flush=True,
        )
        sys.exit(2)
