#!/usr/bin/env python3
"""Round-4 TPU measurements: padded batched components + df32 padded /
update-fused defect.

Runs warm, device-resident, single-program timings (the only honest
form through the tunnel — PERF_NOTES.md) for:

  1. Mixed component-style solve at N^3 (unaligned OK): df32-fused vs
     df32-unfused vs f64 defect.  Cycle counts + solution agreement are
     printed so semantic drift is visible immediately.
  2. The batched 3-lane component solve vs three sequential solves at
     the same size (both warm).

Usage:  python3 scripts/perf_r4.py [N ...]   (default: 220)
Env: NDSM_PERF_REPS (3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ndsm_tpu import GridHierarchy, Options  # noqa: E402
from ndsm_tpu.mg.batched import MultiBCSolver  # noqa: E402
from ndsm_tpu.mg.poisson import PoissonBVP  # noqa: E402

REPS = int(os.environ.get("NDSM_PERF_REPS", "3"))

COMPONENT_BCS = [
    tuple(("N", "N") if (2 - ax) == c else ("D", "D") for ax in range(3))
    for c in range(3)
]


def _component_u0s(n, rng):
    """Dirichlet boundary data resembling the component solves."""
    u0s = []
    for c in range(3):
        u0 = np.zeros((n, n, n))
        if c != 2:
            u0[0], u0[-1] = rng.standard_normal((n, n)), rng.standard_normal((n, n))
        if c != 1:
            u0[:, 0], u0[:, -1] = rng.standard_normal((n, n)), rng.standard_normal(
                (n, n)
            )
        if c != 0:
            u0[:, :, 0], u0[:, :, -1] = rng.standard_normal((n, n)), (
                rng.standard_normal((n, n))
            )
        u0s.append(u0)
    return u0s


def _block(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if isinstance(leaf, jax.Array):
            leaf.block_until_ready()


def _timed(fn, *args):
    out = fn(*args)
    _block(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        _block(out)
        ts.append(time.perf_counter() - t0)
    return out, min(ts)


def bench_single(n):
    print(f"== single mixed solve, {n}^3, component BCs (Az) ==", flush=True)
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x))
    rng = np.random.default_rng(3)
    u0 = jnp.asarray(_component_u0s(n, rng)[2])
    results = {}
    for tag, opts in [
        ("df32-fused", Options(precision="mixed", mixed_defect="df32")),
        ("f64", Options(precision="mixed", mixed_defect="f64")),
    ]:
        bvp = PoissonBVP(h, COMPONENT_BCS[2], opts)
        if tag == "df32-fused" and not bvp.df_defect:
            print("  df32 unsupported at this size; skipping")
            continue
        (u, info), dt = _timed(lambda b=bvp: b.solve(u0, None, zero_rhs=True))
        results[tag] = (np.asarray(u), info, dt)
        print(
            f"  {tag:12s}: {dt*1e3:8.2f} ms  cycles={info.cycles} "
            f"ierr={info.ierr} du={info.du_last:.2e}",
            flush=True,
        )
        # unfused df32: disable the update kernels on the same bvp
        if tag == "df32-fused" and bvp._df_upd is not None:
            import dataclasses as _dc

            bvp2 = PoissonBVP(
                h, COMPONENT_BCS[2], _dc.replace(opts, vc_tol=opts.vc_tol)
            )
            bvp2._df_upd = bvp2._df_upd_zero = None
            bvp2._solve_zero_rhs_jit = jax.jit(
                bvp2._solve_impl_zero_rhs, static_argnums=(5,)
            )
            bvp2._solve_zero_rhs_jit_donate = jax.jit(
                bvp2._solve_impl_zero_rhs, donate_argnums=(0,), static_argnums=(5,)
            )
            (u2, info2), dt2 = _timed(lambda: bvp2.solve(u0, None, zero_rhs=True))
            results["df32-unfused"] = (np.asarray(u2), info2, dt2)
            print(
                f"  df32-unfused: {dt2*1e3:8.2f} ms  cycles={info2.cycles} "
                f"(bitwise vs fused: "
                f"{np.array_equal(np.asarray(u2), results['df32-fused'][0])})",
                flush=True,
            )
    if "df32-fused" in results and "f64" in results:
        d = np.abs(results["df32-fused"][0] - results["f64"][0]).max()
        print(f"  df32 vs f64 solution: max|d| = {d:.2e}")


def bench_batched(n):
    print(f"== batched vs sequential components, {n}^3 ==", flush=True)
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x))
    rng = np.random.default_rng(3)
    u0s = _component_u0s(n, rng)
    opts = Options(precision="mixed")
    mbs = MultiBCSolver(h, COMPONENT_BCS, opts)
    print(
        f"  padded={mbs._padded[0]} work={mbs._work_shapes[0]} "
        f"df={mbs._df} df_upd={mbs._df_lane_upd is not None}"
    )
    u0 = jnp.stack([jnp.asarray(u) for u in u0s])
    # _solve_jit donates its input: hand each call a device-side copy
    # (~0.3 ms at 220^3 — noise next to the solve).
    (ub, infos), dtb = _timed(
        lambda: mbs.solve(u0.copy(), names=["Ax", "Ay", "Az"])
    )
    print(
        f"  batched    : {dtb*1e3:8.2f} ms  cycles="
        f"{[i.cycles for i in infos]}",
        flush=True,
    )
    bvps = [PoissonBVP(h, b, opts) for b in COMPONENT_BCS]

    # Pre-upload the sequential arm's inputs like the batched arm's:
    # passing host numpy would re-upload 3 x 85 MB f64 per rep through
    # the tunnel (~2.6 s) and measure the link, not the solves (the
    # round-4 first run of this script did exactly that).
    u0s_dev = [jax.block_until_ready(jnp.asarray(u)) for u in u0s]

    def seq():
        outs = []
        for bvp, u in zip(bvps, u0s_dev):
            outs.append(bvp.solve(u, None, zero_rhs=True))
        return outs

    outs, dts = _timed(seq)
    print(
        f"  sequential : {dts*1e3:8.2f} ms  cycles="
        f"{[i.cycles for _, i in outs]}",
        flush=True,
    )
    for c in range(3):
        d = np.abs(np.asarray(ub[c]) - np.asarray(outs[c][0])).max()
        print(f"  lane {c}: max|batched - sequential| = {d:.2e}")


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [220]
    for n in sizes:
        bench_single(n)
        bench_batched(n)
