#!/usr/bin/env python3
"""Round-5 TPU measurement: metric-fused final post-smooth
(MGEngine.t_vcycle_du) vs the separate XLA du pass.

Warm, device-resident, single-program timings of the same mixed solve
with NDSM_TPU_METRIC_FUSED on/off (engine caches cleared in between so
both configurations really build).  Solutions and cycle counts must be
BITWISE identical — the fusion only moves where the max is computed.

Usage:  python3 scripts/perf_r5.py [N ...]   (default: 256 220)
Env: NDSM_PERF_REPS (3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REPS = int(os.environ.get("NDSM_PERF_REPS", "3"))


def _timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return out, min(ts)


def _fresh_bvp(n, fused: bool):
    os.environ["NDSM_TPU_METRIC_FUSED"] = "1" if fused else "0"
    # Engines memoize their kernel builders; clear so the toggle takes.
    from ndsm_tpu.mg import poisson as P

    P._ENGINE_CACHE.clear()
    from ndsm_tpu import GridHierarchy, Options
    from ndsm_tpu.mg.poisson import PoissonBVP

    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x))
    bcs = (("N", "N"), ("D", "D"), ("D", "D"))  # Az-style component BCs
    return PoissonBVP(h, bcs, Options(precision="mixed"))


def main(sizes):
    rng = np.random.default_rng(3)
    for n in sizes:
        print(f"== mixed component-style solve, {n}^3, metric fused vs not ==",
              flush=True)
        u0_np = np.zeros((n, n, n))
        u0_np[0], u0_np[-1] = rng.standard_normal((n, n)), rng.standard_normal((n, n))
        results = {}
        for fused in (True, False):
            bvp = _fresh_bvp(n, fused)
            u0 = jnp.asarray(u0_np)
            (u, info), dt = _timed(lambda b=bvp, v=u0: b.solve(v, None, zero_rhs=True))
            results[fused] = (np.asarray(u), info, dt)
            print(
                f"  fused={str(fused):5s}: {dt*1e3:8.2f} ms  "
                f"cycles={info.cycles} du={info.du_last:.2e}",
                flush=True,
            )
        same = np.array_equal(results[True][0], results[False][0])
        cyc = results[True][1].cycles == results[False][1].cycles
        print(f"  bitwise-identical solutions: {same}  cycle parity: {cyc}")
        print(
            f"  speedup from metric fusion: "
            f"{results[False][2] / results[True][2]:.3f}x",
            flush=True,
        )
    os.environ.pop("NDSM_TPU_METRIC_FUSED", None)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [256, 220])
