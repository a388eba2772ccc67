#!/usr/bin/env python3
"""On-chip validation + tile sweep for the single-buffered zc kernels.

Round-3 finding (PERF_NOTES): single-buffering the consumed-once HBM
streams (rhs/cor/mean) to buy larger tiles was measured 10-20% SLOWER
end-to-end despite the better tile fraction at 512^3 — DMA stream
concurrency beats useful-area fraction on this chip; the kernel stays
double-buffered, and this harness measures tile/width choices on it.

Three stages, each gated on the previous:
  1. parity  — rounding-level equality of every kernel variant against
     a jitted XLA masked-sweep oracle ON CHIP (interpret-mode tests
     cannot see DMA races; this can).  The oracle jit context rounds
     ~1 ulp differently than the kernel (measured identically on the
     double-buffered kernel), so the gates are few-ulp relative bounds;
     the BITWISE gate for kernel changes is scripts/zc_ab_capture.py
     (save outputs on the old kernel, check array_equal on the new).
  2. rate    — bench.py's exact smoother_throughput at 256^3 and 512^3
     (engine path, default tile picks): the apples-to-apples number
     against BENCH_r02 / PERF_NOTES round 7.
  3. sweep   — K-differenced ns=2 pass rate at 512^3 for candidate
     (tz, ty) overrides via NDSM_TPU_ZC_TILES, to check whether the
     area-fraction heuristic picks the actual winner.

Usage: python3 scripts/perf_zc_tiles.py [parity|rate|sweep|all]
Env: NDSM_PERF_REPS (3), NDSM_ZC_SWEEP_MAX (6 candidates).
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
    """Deterministic device-side field (no 512 MB tunnel uploads)."""
    n = int(np.prod(shape))
    i = lax.iota(jnp.float32, n).reshape(shape)
    return jnp.sin(0.001 * i + seed) + 0.1 * jnp.cos(0.013 * i)


def parity():
    from ndsm_tpu.ops import pallas_zc as z
    from ndsm_tpu.ops import stencils as st

    m = 256
    dq = np.array([1.0 / (m - 1)] * 3)
    bcs = (("D", "D"), ("D", "D"), ("N", "N"))
    shape = (m, m, m)
    u = _field(shape, 0.0)
    r = _field(shape, 1.0)
    c = _field(shape, 2.0)
    dqj = jnp.asarray(dq)
    ok = True

    def gate(name, a, b, rel=1e-6):
        # few-ulp RELATIVE bound: scale by the field's magnitude (the
        # residual fields reach ~1/dq^2 ~ 1e5, where 1 ulp is ~8e-3)
        nonlocal ok
        d = float(jnp.max(jnp.abs(a - b)))
        scale = max(float(jnp.max(jnp.abs(b))), 1.0)
        good = d <= rel * scale
        ok &= good
        print(f"  parity {name:16s}: max|diff|={d:.3e} (scale {scale:.1e}) "
              f"{'OK' if good else 'FAIL'}", flush=True)

    def sweeps(u0, rhs, k):
        v = u0
        for _ in range(k):
            v = st.rb_sweep(v, rhs, dqj, bcs)
        return v

    ns = 2
    k = z.zc_smooth_3d(bcs, dq, shape, ns)
    assert k is not None, "zc ineligible at 256^3?"
    gate("smooth ns=2", jax.jit(k)(u, r), jax.jit(lambda: sweeps(u, r, ns))())

    kc = z.zc_smooth_cor_3d(bcs, dq, shape, ns)
    gate("cor ns=2", jax.jit(kc)(u, c, r),
         jax.jit(lambda: sweeps(u + c, r, ns))())

    kr = z.zc_smooth_residual_3d(bcs, dq, shape, ns)
    ur, rr = jax.jit(kr)(u, r)
    uref = jax.jit(lambda: sweeps(u, r, ns))()
    gate("res/u ns=2", ur, uref)
    gate("res/r ns=2", rr,
         jax.jit(lambda: st.poisson_residual(uref, r, dqj, bcs))())

    # all-Neumann mean pass.  The oracle gets the SAME subtracted scalar
    # (recomputing jnp.mean in a different jit context shifts every
    # point by the two reduction trees' rounding difference, ~1e-5);
    # the per-window sums still reduce in a different order than
    # jnp.sum, hence the looser relative bound on the sum gate.
    bn = (("N", "N"),) * 3
    km = z.zc_smooth_mean_3d(bn, dq, shape)
    assert km is not None
    mu = float(jnp.mean(u))
    sub = jnp.full((8, 128), mu, jnp.float32)
    um, sums = jax.jit(km)(u, r, sub)
    un = jax.jit(
        lambda: st.rb_sweep(u - jnp.float32(mu), r, dqj, bn)
    )()
    gate("mean/u", um, un)
    gate("mean/sum", jnp.sum(sums) / u.size, jnp.mean(un), rel=1e-4)
    print(f"parity: {'ALL OK' if ok else 'FAILURES'}", flush=True)
    return ok


def rate():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    for m in (256, 512):
        t0 = time.perf_counter()
        tp = bench.smoother_throughput(m, "mixed")
        print(f"  rate {m}^3: {tp['smoother_gdof_s']} G pt-sw/s "
              f"({tp['smoother_sol_pct']}% SoL, {tp['smoother_backend']}) "
              f"[{time.perf_counter()-t0:.0f}s incl compile]", flush=True)


def _candidates(shape, nsweeps, max_n):
    """Valid (tz, ty) picks at this shape, diverse in aspect, sorted by
    useful-area fraction."""
    from ndsm_tpu.ops.pallas_zc import _halos, _VMEM_BUDGET

    nz, ny, nx = shape
    H_z, H_y = _halos(nsweeps, False)
    cands = []
    for tz in range(2, min(nz, 256) + 1, 2):
        if nz % tz:
            continue
        wz = min(nz, tz + 2 * H_z)
        if wz % 2:
            continue
        for ty in range(8, min(ny, 512) + 1, 8):
            if ny % ty:
                continue
            wy = min(ny, ty + 2 * H_y)
            if 6 * wz * wy * nx * 4 > _VMEM_BUDGET:
                continue
            cands.append((tz * ty / (wz * wy), tz, ty, wz, wy))
    cands.sort(reverse=True)
    # top by fraction + the most-z-elongated and most-y-elongated valid
    picks = []
    for frac, tz, ty, wz, wy in cands:
        if len(picks) >= max_n - 2:
            break
        picks.append((tz, ty))
    for key in (lambda c: (c[1], c[0]), lambda c: (c[2], c[0])):
        best = max(cands, key=key)
        if (best[1], best[2]) not in picks:
            picks.append((best[1], best[2]))
    return picks


def sweep():
    from ndsm_tpu.ops import pallas_zc as z

    m = 512
    ns = 2
    shape = (m, m, m)
    dq = np.array([1.0 / (m - 1)] * 3)
    bcs = (("D", "D"), ("D", "D"), ("N", "N"))
    u = _field(shape, 0.0)
    r = _field(shape, 1.0)
    K, K2 = 6, 18

    def timed(kern):
        # rhs rides as an ARGUMENT: a closed-over device array becomes
        # an HLO constant (512 MB at 512^3 — the remote compile service
        # rejects the request body with HTTP 413)
        def loop(k, v, rr):
            return jnp.sum(lax.fori_loop(0, k, lambda _, a: kern(a, rr), v))

        f = jax.jit(loop, static_argnums=0)
        float(jax.device_get(f(K, u, r)))
        float(jax.device_get(f(K2, u, r)))
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(jax.device_get(f(K, u, r)))
            d1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jax.device_get(f(K2, u, r)))
            d2 = time.perf_counter() - t0
            dt = max(d2 - d1, 1e-9)
            rate = m**3 * (K2 - K) * ns / dt
            best = rate if best is None else max(best, rate)
        return best

    base = z.pick_tiles_zc(shape, ns)
    print(f"  default pick {base}", flush=True)
    os.environ.pop("NDSM_TPU_ZC_TILES", None)
    r0 = timed(z.zc_smooth_3d(bcs, dq, shape, ns))
    print(f"  default {base[:2]}: {r0/1e9:7.2f} G pt-sw/s", flush=True)

    max_n = int(os.environ.get("NDSM_ZC_SWEEP_MAX", "6"))
    for tz, ty in _candidates(shape, ns, max_n):
        if (tz, ty) == base[:2]:
            continue
        os.environ["NDSM_TPU_ZC_TILES"] = f"{tz},{ty}"
        pick = z.pick_tiles_zc(shape, ns)
        if pick is None:
            print(f"  ({tz},{ty}): rejected by checker", flush=True)
            continue
        rr = timed(z.zc_smooth_3d(bcs, dq, shape, ns))
        print(f"  tiles ({tz:3d},{ty:3d}) win {pick[2:]}: "
              f"{rr/1e9:7.2f} G pt-sw/s ({rr/r0:5.2f}x default)", flush=True)
    os.environ.pop("NDSM_TPU_ZC_TILES", None)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("parity", "all"):
        if not parity() and mode == "all":
            sys.exit(2)
    if mode in ("rate", "all"):
        rate()
    if mode in ("sweep", "all"):
        sweep()
