#!/usr/bin/env python3
"""V-cycle phase breakdown + end-to-end solve timings on the chip.

Two modes:
  python3 scripts/perf_phases.py [N ...]          end-to-end mixed solves
      (default/strict/batched configurations), warm, device-resident.
  python3 scripts/perf_phases.py --phases [N ...] K-differenced
      single-program timings of every V-cycle phase at the finest level
      (kernel smoothing passes, residual-/correction-fused passes, the
      restrict/prolong matrix chain, the XLA du pass, the full cycle).

Caveat (measured, PERF_NOTES.md round 7): standalone K-loop phase
timings systematically OVERESTIMATE in-program phase costs — the full
compiled cycle overlaps DMA across phases, which is how a 5.8 ms
t_vcycle coexists with per-pass numbers that sum to more than that.
Optimization decisions must be confirmed by end-to-end deltas.

Env: NDSM_PERF_REPS (3), NDSM_PERF_PALLAS (on).
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


def phase_breakdown(n, K=20):
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
    kdiff("cor fused (ms=5)",
          loopK(lambda v: eng.t_smooth_cor(v, c, r, 0)), u)
    kdiff("restrict+prolong (L0<->L1)",
          loopK(lambda v: eng.t_prolong(eng.t_restrict(v, 0), 0)), u,
          f"coarse {w1}")
    kdiff("XLA du pass (max|a-b|)",
          loopK(lambda v: v + eng.t_metric(v, r) * 0), u)
    kdiff("full t_vcycle", loopK(
        lambda v: eng.t_vcycle(v, r, 1e-6, 10)[0]), u)


def main(sizes):
    from ndsm_tpu import GridHierarchy, Options
    from ndsm_tpu.mg.batched import MultiBCSolver
    from ndsm_tpu.mg.poisson import PoissonBVP

    rng = np.random.default_rng(3)
    for n in sizes:
        x = np.linspace(0, 1, n)
        h = GridHierarchy.from_mesh((x, x, x))
        bcs = (("N", "N"), ("D", "D"), ("D", "D"))
        u0_np = np.zeros((n, n, n))
        u0_np[0], u0_np[-1] = rng.standard_normal((n, n)), rng.standard_normal((n, n))
        # Pre-upload ONCE: jnp.asarray inside the timed lambda adds the
        # full f64 tunnel upload (~10 s at 512^3) to every rep.
        u0_dev = jax.block_until_ready(jnp.asarray(u0_np))
        print(f"== end-to-end mixed solves, {n}^3 ==", flush=True)

        for cname, opts in [
            ("default (groups<=6)", Options(precision="mixed")),
            ("strict (inner_max=1)", Options(precision="mixed", mixed_inner_max=1)),
        ]:
            bvp = PoissonBVP(h, bcs, opts)
            (u, info), dt = _timed(
                lambda b=bvp: b.solve(u0_dev, None, zero_rhs=True)
            )
            print(
                f"  {cname:22s}: {dt*1e3:8.2f} ms  cycles={info.cycles} "
                f"du={info.du_last:.2e}",
                flush=True,
            )

        if 3 * float(n) ** 3 * 48.0 >= 0.85 * 16e9:
            # Same HBM working-set gate vector_potential applies: the
            # 3-lane batch at 512^3 needs ~19 GB and OOMs.
            print("  batched 3-lane        : skipped (HBM gate)", flush=True)
            continue
        bcs_list = [
            tuple(("N", "N") if (2 - ax) == c else ("D", "D") for ax in range(3))
            for c in range(3)
        ]
        mbs = MultiBCSolver(h, bcs_list, Options(precision="mixed"))
        u0 = jax.block_until_ready(jnp.asarray(np.stack([u0_np] * 3)))
        (u, infos), dt = _timed(
            lambda: mbs.solve(u0 + 0.0, names=["Ax", "Ay", "Az"])
        )
        print(
            f"  {'batched 3-lane':22s}: {dt*1e3:8.2f} ms  "
            f"cycles={infos[0].cycles} du={infos[0].du_last:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    if args and args[0] == "--phases":
        for n in [int(a) for a in args[1:]] or [256]:
            phase_breakdown(n)
    else:
        main([int(a) for a in args] or [256])
