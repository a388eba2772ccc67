#!/usr/bin/env python3
"""Transfer-cost experiments at the finest level pair (VERDICT r2 item
1 groundwork): how much of the V-cycle do restrict/prolong REALLY cost
in-program, and what do cheap knobs buy?

Measures, warm K-differenced single programs at N^3:
  1. restrict+prolong chain, HIGHEST vs DEFAULT MXU precision;
  2. full t_vcycle with each precision (the honest in-program delta —
     the precision flip halves the transfer matmul work, so twice the
     t_vcycle delta estimates the total in-program transfer cost);
  3. end-to-end mixed solve with each precision (cycle counts must
     stay comparable — transfer precision is a convergence-rate knob
     under the f64 defect, not an accuracy one).

Usage: python3 scripts/perf_transfer.py [N]   (default 256)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REPS = int(os.environ.get("NDSM_PERF_REPS", "3"))


def kdiff(name, prog, v, K, pts):
    out = prog(v)
    jax.block_until_ready(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(prog(v))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / K
    print(f"  {name:34s}: {per*1e3:8.3f} ms/pass ({pts/per/1e9:6.1f} Gpt/s)",
          flush=True)
    return per


def main(n=256, K=20):
    from ndsm_tpu import GridHierarchy, Options
    from ndsm_tpu.mg.poisson import PoissonBVP, _cached_engine, _ENGINE_CACHE

    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x))
    bcs = (("N", "N"), ("D", "D"), ("D", "D"))
    rng = np.random.default_rng(0)

    def loopK(f):
        return jax.jit(lambda v: jax.lax.fori_loop(0, K, lambda _, a: f(a), v))

    for prec in ("highest", "default"):
        os.environ["NDSM_TPU_TRANSFER_PRECISION"] = prec
        _ENGINE_CACHE.clear()
        eng = _cached_engine(
            h, bcs, 5, True, jnp.float32, coarse_direct=True, use_pallas="on"
        )
        w0 = eng._work_shapes[0]
        u = jnp.asarray(rng.standard_normal(w0), jnp.float32)
        r = jnp.asarray(rng.standard_normal(w0), jnp.float32)
        pts = float(np.prod(w0))
        print(f"== transfer precision = {prec}, {n}^3 ==", flush=True)
        kdiff("restrict+prolong (L0<->L1)",
              loopK(lambda v: eng.t_prolong(eng.t_restrict(v, 0), 0)), u, K, pts)
        kdiff("full t_vcycle",
              loopK(lambda v: eng.t_vcycle(v, r, 1e-6, 10)[0]), u, K, pts)

    # 3. end-to-end solves: cycle-count effect of the precision knob
    u0_np = np.zeros((n, n, n))
    u0_np[0], u0_np[-1] = rng.standard_normal((n, n)), rng.standard_normal((n, n))
    u0 = jnp.asarray(u0_np)  # pre-upload: keep the tunnel out of dt
    for prec in ("highest", "default"):
        os.environ["NDSM_TPU_TRANSFER_PRECISION"] = prec
        _ENGINE_CACHE.clear()
        bvp = PoissonBVP(h, bcs, Options(precision="mixed"))
        (uu, info) = bvp.solve(u0, None, zero_rhs=True)
        jax.block_until_ready(uu)
        t0 = time.perf_counter()
        (uu, info) = bvp.solve(u0, None, zero_rhs=True)
        jax.block_until_ready(uu)
        dt = time.perf_counter() - t0
        print(f"solve [{prec:7s}]: {dt*1e3:8.2f} ms  cycles={info.cycles} "
              f"du={info.du_last:.2e}", flush=True)
    os.environ.pop("NDSM_TPU_TRANSFER_PRECISION", None)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
