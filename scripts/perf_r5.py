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


def phase_breakdown(n, K=20):
    """K-differenced single-program timings of every V-cycle phase at
    the finest level (the honest form through the tunnel): kernel
    smoothing passes, the residual- and correction+metric-fused passes,
    the restrict/prolong matrix chain, and the XLA du pass the metric
    fusion replaces.  Decides whether transfer-op fusion is the next
    kernel worth building."""
    os.environ["NDSM_TPU_METRIC_FUSED"] = "1"
    from ndsm_tpu import GridHierarchy
    from ndsm_tpu.mg.poisson import _cached_engine, _ENGINE_CACHE

    _ENGINE_CACHE.clear()
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x))
    bcs = (("N", "N"), ("D", "D"), ("D", "D"))
    eng = _cached_engine(
        h, bcs, 5, True, jnp.float32, coarse_direct=True,
        use_pallas=os.environ.get("NDSM_PERF_PALLAS", "on"),
    )
    w0 = eng._work_shapes[0]
    w1 = eng._work_shapes[1]
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(w0), jnp.float32)
    r = jnp.asarray(rng.standard_normal(w0), jnp.float32)
    c = jnp.asarray(rng.standard_normal(w0), jnp.float32)
    pts = float(np.prod(w0))

    def loopK(f):
        return jax.jit(lambda v: jax.lax.fori_loop(0, K, lambda _, a: f(a), v))

    def kdiff(name, prog, v, work_desc=""):
        out = prog(v)
        jax.block_until_ready(out)
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(prog(v))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / K
        print(f"  {name:28s}: {per*1e3:8.3f} ms/pass  "
              f"({pts/per/1e9:6.1f} Gpt/s) {work_desc}", flush=True)
        return per

    print(f"== V-cycle phase breakdown, {n}^3 (work {w0}), K={K} ==", flush=True)
    kdiff("smooth pass (ns=2)", loopK(lambda v: eng.t_smooth(v, r, 0, nsweeps=2)), u)
    kdiff("residual-fused (2+res)",
          loopK(lambda v: eng.t_smooth_residual(v, r, 0)[1]), u)
    kdiff("cor+metric fused (ms=5)",
          loopK(lambda v: eng.t_smooth_cor_metric(v, c, r, 0, u)[0]), u)
    kdiff("cor fused only (ms=5)",
          loopK(lambda v: eng.t_smooth_cor(v, c, r, 0)), u)
    # restrict+prolong round trip at the finest level pair
    kdiff("restrict+prolong (L0<->L1)",
          loopK(lambda v: eng.t_prolong(eng.t_restrict(v, 0), 0)), u,
          f"coarse {w1}")
    # the XLA du pass the metric fusion replaces
    kdiff("XLA du pass (max|a-b|)",
          loopK(lambda v: v + eng.t_metric(v, r) * 0), u)
    kdiff("full t_vcycle", loopK(
        lambda v: eng.t_vcycle(v, r, 1e-6, 10)[0]), u)
    kdiff("full t_vcycle_du", loopK(
        lambda v: eng.t_vcycle_du(v, r, 1e-6, 10, v)[0]), u)


def main(sizes):
    rng = np.random.default_rng(3)
    ok = True
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
        ok = ok and same and cyc
        print(f"  bitwise-identical solutions: {same}  cycle parity: {cyc}")
        print(
            f"  speedup from metric fusion: "
            f"{results[False][2] / results[True][2]:.3f}x",
            flush=True,
        )
    os.environ.pop("NDSM_TPU_METRIC_FUSED", None)
    if not ok:
        # the round's core invariant failed — make the runbook's
        # exit-code line show it, not just the log body
        print("PARITY FAILURE: fused vs unfused solves differ", flush=True)
        sys.exit(2)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    if args and args[0] == "--phases":
        for n in [int(a) for a in args[1:]] or [256]:
            phase_breakdown(n)
    else:
        main([int(a) for a in args] or [256, 220])
