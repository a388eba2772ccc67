#!/usr/bin/env python3
"""Headline benchmark: full Coulomb-gauge vector-potential solve at 220^3
(the reference's largest golden configuration, results_test1.txt row 9:
174.06 s max-metric / 126.13 s mean-metric on its multicore CPU).

Prints ONE JSON line:
  {"metric": ..., "value": <wall seconds>, "unit": "s", "vs_baseline": <x>}
where vs_baseline is the reference wall time divided by ours (speedup).

The run is accepted only if the computed errors match the golden table
(truncation-error metrics agree to ~1e-3 relative); otherwise
vs_baseline is reported as 0.0.

Env overrides: NDSM_BENCH_N (default 220), NDSM_BENCH_PRECISION
(default mixed), NDSM_BENCH_REPS (default 1 timed rep after warmup).
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


def main():
    n = int(os.environ.get("NDSM_BENCH_N", "220"))
    precision = os.environ.get("NDSM_BENCH_PRECISION", "mixed")
    reps = int(os.environ.get("NDSM_BENCH_REPS", "1"))

    budget = float(os.environ.get("NDSM_BENCH_TIMEOUT", "2700"))
    watchdog = _arm_watchdog(budget, f"vector_potential_{n}^3_wall_clock")

    x, y, z = build_test_mesh(n)
    Z, Y, X = np.meshgrid(z, y, x, indexing="ij")
    A1, b1 = potential_field_case(X, Y, Z)

    # Warmup (includes compilation)
    t0 = time.perf_counter()
    ierr, A2, b2, winfo = vector_potential(
        x, y, z, b1.copy(), precision=precision, full_output=True
    )
    warm = time.perf_counter() - t0
    print(f"warmup (incl. compile): {warm:.2f}s ierr={ierr}", file=sys.stderr)
    for s_ in winfo.chi + winfo.components:
        print(
            f"  [warm] {s_.name}: {s_.wall_time:.3f}s cycles={s_.cycles}",
            file=sys.stderr,
        )

    times = []
    info = None
    for _ in range(reps):
        t0 = time.perf_counter()
        ierr, A2, b2, info = vector_potential(
            x, y, z, b1.copy(), precision=precision, full_output=True
        )
        times.append(time.perf_counter() - t0)
    wall = min(times)
    if info is not None:
        for s in info.chi + info.components:
            print(
                f"  {s.name}: {s.wall_time:.3f}s cycles={s.cycles} "
                f"du={s.du_last:.2e}",
                file=sys.stderr,
            )

    Ea = np.linalg.norm(A1 - A2, axis=0)
    Eb = np.linalg.norm(b1 - b2, axis=0)
    ea_max, eb_max = float(Ea.max()), float(Eb.max())

    ok = ierr == 0
    ref_time = None
    if n in GOLDEN:
        g_ea, g_eb, ref_time = GOLDEN[n]
        ok = ok and abs(ea_max - g_ea) < 2e-3 * g_ea and abs(eb_max - g_eb) < 2e-3 * g_eb
        print(
            f"errors: Ea_max={ea_max:.5e} (golden {g_ea:.5e}) "
            f"Eb_max={eb_max:.5e} (golden {g_eb:.5e}) accuracy_ok={ok}",
            file=sys.stderr,
        )
    vs = (ref_time / wall) if (ok and ref_time) else 0.0

    watchdog.cancel()
    print(
        json.dumps(
            {
                "metric": f"vector_potential_{n}^3_wall_clock",
                "value": round(wall, 4),
                "unit": "s",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
