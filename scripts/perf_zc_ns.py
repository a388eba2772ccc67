#!/usr/bin/env python3
"""On-chip pass-width (nsweeps) sweep for the zc kernel.

_pallas_nsweeps() defaults to 2 on a measurement from the first kernel
generation ("29% SoL" era).  A deeper pass streams 12/ns B per
point-sweep at the cost of a bigger halo (smaller useful tile fraction)
and more Mosaic scoped stack; with the round-3 single-buffered streams
the VMEM math changed, so re-measure:

  1. per-ns kernel pass rate (K-differenced), ns = 1..4, at 256^3 and
     512^3 — plus bitwise parity vs the XLA oracle at each ns;
  2. the decision rule: END-TO-END mixed solve at 256^3 with
     NDSM_TPU_PALLAS_NSWEEPS = 2 vs 3 (phase rates overestimate;
     PERF_NOTES round 7 measurement lesson).

Usage: python3 scripts/perf_zc_ns.py [pass|solve] [sizes...]
(Run the two modes as SEPARATE invocations: `pass` holds the device
claim in-process, and `solve` spawns TPU subprocesses — combining them
in one process would deadlock the one-claimant-at-a-time axon plugin.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

REPS = int(os.environ.get("NDSM_PERF_REPS", "3"))


def _field(shape, seed):
    n = int(np.prod(shape))
    i = lax.iota(jnp.float32, n).reshape(shape)
    return jnp.sin(0.001 * i + seed) + 0.1 * jnp.cos(0.013 * i)


def pass_rates(sizes):
    from ndsm_tpu.ops import pallas_zc as z
    from ndsm_tpu.ops import stencils as st

    for m in sizes:
        shape = (m, m, m)
        dq = np.array([1.0 / (m - 1)] * 3)
        dqj = jnp.asarray(dq)
        bcs = (("D", "D"), ("D", "D"), ("N", "N"))
        u = _field(shape, 0.0)
        r = _field(shape, 1.0)
        K, K2 = 6, 18
        print(f"== {m}^3 kernel pass rates ==", flush=True)
        for ns in (1, 2, 3, 4):
            pick = z.pick_tiles_zc(shape, ns)
            if pick is None:
                print(f"  ns={ns}: no valid tiles", flush=True)
                continue
            try:
                kern = z.zc_smooth_3d(bcs, dq, shape, ns)

                # rhs as an ARGUMENT (a closure constant becomes a
                # full-array HLO literal; HTTP 413 at 512^3)
                def loop(k, v, rr, kern=kern):
                    return jnp.sum(
                        lax.fori_loop(0, k, lambda _, a: kern(a, rr), v)
                    )

                f = jax.jit(loop, static_argnums=0)
                # parity gate at this ns (bitwise vs XLA sweeps)
                ref = u
                for _ in range(ns):
                    ref = st.rb_sweep(ref, r, dqj, bcs)
                d = float(jnp.max(jnp.abs(kern(u, r) - ref)))
                float(jax.device_get(f(K, u, r)))
                float(jax.device_get(f(K2, u, r)))
                # median of per-rep differenced rates: max-of-reps let a
                # single tunnel hiccup in the K run inflate the rate past
                # the physical bound (the round-8 "116 G at 512^3 ns=1"
                # artifact — remeasured at ~27 G)
                rates = []
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    float(jax.device_get(f(K, u, r)))
                    d1 = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    float(jax.device_get(f(K2, u, r)))
                    d2 = time.perf_counter() - t0
                    rates.append(m**3 * (K2 - K) * ns / max(d2 - d1, 1e-9))
                best = float(np.median(rates))
                frac = pick[0] * pick[1] / (pick[2] * pick[3])
                print(
                    f"  ns={ns} tiles={pick} frac={frac:.3f}: "
                    f"{best/1e9:7.2f} G pt-sw/s  parity={d:.1e}"
                    f"{'' if d == 0 else ' (NONZERO)'}",
                    flush=True,
                )
            except Exception as e:
                print(f"  ns={ns}: FAILED {type(e).__name__}: {e}", flush=True)


def solve(m=256, widths=("2", "3")):
    import subprocess

    for nsw in widths:
        env = dict(os.environ, NDSM_TPU_PALLAS_NSWEEPS=nsw)
        if nsw == "auto":  # per-level default (pallas_zc.auto_pass_width)
            env.pop("NDSM_TPU_PALLAS_NSWEEPS")
        p = subprocess.run(
            [sys.executable, "scripts/perf_phases.py", str(m)],
            env=env, capture_output=True, text=True, timeout=2700,
        )
        print(f"== end-to-end, NSWEEPS={nsw} ==", flush=True)
        for line in p.stdout.splitlines():
            if "ms" in line or "==" in line:
                print(" ", line, flush=True)
        if p.returncode:
            print(f"  exit={p.returncode}: {p.stderr[-500:]}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "pass"
    if mode == "pass":
        sizes = [int(a) for a in sys.argv[2:]] or [256, 512]
        pass_rates(sizes)
    elif mode == "solve":
        # solve [size] [ns ...]   e.g. `solve 256 2 4 5`
        m = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        widths = sys.argv[3:] or ("2", "3")
        solve(m, widths)
    else:
        sys.exit(f"unknown mode {mode!r} (pass|solve)")
