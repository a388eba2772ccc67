#!/usr/bin/env python3
"""On-chip validation + timing of the VMEM-resident 2D smoother
(ops/pallas_v2d.py) — the chi-face kernel.

1. parity: kernel vs stencils.rb_sweep at an aligned shape (expect
   bitwise or rounding-level agreement on the TPU toolchain);
2. vmap: the batched (6-lane) form the chi driver uses;
3. throughput: K-differenced single-program smooth timings (ms=5) at
   512^2 x 6 lanes, kernel vs the XLA compact path;
4. end-to-end: batched all-Neumann chi-style solve_batch at 512^2 x 6,
   kernel vs XLA wall (the VERDICT r2 item-4 'done' metric).

Usage: python3 scripts/perf_v2d.py    Env: NDSM_PERF_REPS (3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REPS = int(os.environ.get("NDSM_PERF_REPS", "3"))
FAIL = 0


def parity(n=256, nsweeps=5):
    global FAIL
    from ndsm_tpu.ops import pallas_v2d as v2d
    from ndsm_tpu.ops import stencils

    shape = (n, n)
    bcs = (("N", "N"), ("N", "N"))
    dq = np.array([0.9, 1.1])
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    r0 = rng.standard_normal(shape)
    r = jnp.asarray(r0 - r0.mean(), jnp.float32)
    f = v2d.v2d_smooth(bcs, dq, shape, nsweeps)
    if f is None:
        print("parity: kernel unsupported at", shape)
        FAIL = 1
        return
    got = np.asarray(jax.jit(f)(u, r))
    w = u
    for _ in range(nsweeps):
        w = stencils.rb_sweep(w, r, jnp.asarray(dq), bcs)
    want = np.asarray(w)
    d = np.abs(got - want).max()
    scale = np.abs(want).max()
    print(f"parity {n}^2 ns={nsweeps}: max diff {d:.3e} (scale {scale:.3f}) "
          f"bitwise={np.array_equal(got, want)}")
    if d > 1e-5 * scale:
        FAIL = 1

    # vmapped 6-lane form
    U = jnp.stack([u] * 6)
    R = jnp.stack([r] * 6)
    gotB = np.asarray(jax.jit(jax.vmap(f))(U, R))
    dB = np.abs(gotB - got[None]).max()
    print(f"vmap 6-lane: max lane diff vs unbatched {dB:.3e}")
    if dB > 0:
        print("  (vmap path differs from unbatched — rounding-level is ok)")
    if dB > 1e-6 * scale:
        FAIL = 1


def throughput(n=512, B=6, ms=5, K=30):
    from ndsm_tpu.mg.poisson import _cached_engine, _ENGINE_CACHE
    from ndsm_tpu import GridHierarchy

    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x))
    bcs = (("N", "N"), ("N", "N"))
    rng = np.random.default_rng(1)
    U = jnp.asarray(rng.standard_normal((B, n, n)), jnp.float32)
    R = jnp.asarray(rng.standard_normal((B, n, n)), jnp.float32)
    pts = float(B * n * n)

    os.environ["NDSM_TPU_PALLAS_2D"] = "1"
    for mode in ("1", "0"):
        os.environ["NDSM_TPU_PALLAS"] = mode
        _ENGINE_CACHE.clear()
        eng = _cached_engine(
            h, bcs, ms, True, jnp.float32, coarse_direct=True,
            use_pallas=("on" if mode == "1" else "off"),
        )
        f = jax.jit(
            lambda v, r: jax.lax.fori_loop(
                0, K, lambda _, a: jax.vmap(
                    lambda ai, ri: eng.t_smooth(ai, ri, 0)
                )(a, r), v
            )
        )
        jax.block_until_ready(f(U, R))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(f(U, R))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / K
        print(f"t_smooth ms={ms} {n}^2 x{B} [{mode:3s}]: {per*1e3:8.3f} ms "
              f"({pts*ms/per/1e9:6.1f} G pt-sw/s)")
    os.environ.pop("NDSM_TPU_PALLAS", None)


def end_to_end(n=512, B=6):
    global FAIL
    from ndsm_tpu import GridHierarchy, Options
    from ndsm_tpu.mg.poisson import PoissonBVP, _ENGINE_CACHE

    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x))
    bcs = (("N", "N"), ("N", "N"))
    rng = np.random.default_rng(2)
    rhss = []
    for _ in range(B):
        r = rng.standard_normal((n, n))
        rhss.append(jnp.asarray(r - r.mean()))  # device-resident
    u0s = [jnp.zeros((n, n)) for _ in range(B)]
    os.environ["NDSM_TPU_PALLAS_2D"] = "1"
    res = {}
    for mode in ("1", "0"):
        os.environ["NDSM_TPU_PALLAS"] = mode
        _ENGINE_CACHE.clear()
        bvp = PoissonBVP(h, bcs, Options(precision="mixed"))
        us, infos = bvp.solve_batch(u0s, rhss)  # warm
        t0 = time.perf_counter()
        us, infos = bvp.solve_batch(u0s, rhss)
        dt = time.perf_counter() - t0
        res[mode] = (np.stack([np.asarray(u) for u in us]), infos, dt)
        print(f"chi-style batched solve {n}^2 x{B} [{mode:3s}]: "
              f"{dt*1e3:8.1f} ms  cycles={[i.cycles for i in infos]}")
    os.environ.pop("NDSM_TPU_PALLAS", None)
    os.environ.pop("NDSM_TPU_PALLAS_2D", None)
    d = np.abs(res["1"][0] - res["0"][0]).max()
    cyc_on = [i.cycles for i in res["1"][1]]
    cyc_off = [i.cycles for i in res["0"][1]]
    cyc_ok = all(abs(a - b) <= 1 for a, b in zip(cyc_on, cyc_off))
    speed = res["0"][2] / res["1"][2]
    print(f"solution diff {d:.3e}; cycle parity(+-1) {cyc_ok}; "
          f"kernel speedup {speed:.2f}x")
    if d > 1e-8 or not cyc_ok:
        FAIL = 1


if __name__ == "__main__":
    parity()
    throughput()
    end_to_end()
    if FAIL:
        print("V2D PARITY FAILURE")
        sys.exit(2)
