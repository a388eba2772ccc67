#!/usr/bin/env python3
"""1024^3 memory envelope (VERDICT r4 item 4): bytes per level pytree
per shard, plus MEASURED XLA buffer-assignment stats, and the 16 GB
single-chip feasibility verdict.

Two parts:

  1. Analytic per-shard table: for each mesh size, the per-level local
     array bytes the mixed-precision sharded solve carries (outer f32
     pair + rhs pair at the fine level, per-level u/rhs work arrays on
     every V-cycle level, the scaled-defect array, and the halo-args
     edge buffers which replaced full halo-extended copies in round 5).
  2. Measured: ``jit(solve).lower(...).compile().memory_analysis()`` —
     XLA's actual buffer assignment (arguments + outputs + temp arena)
     for the single-device mixed solve at --sizes.  Run on CPU: the
     same HLO passes assign buffers as on TPU modulo kernel temps, so
     this grounds the analytic table (the measured temp arena is the
     XLA-fusion working set the analytic table cannot see).

Usage:
  python3 scripts/mem_envelope.py                  # analytic + 256
  python3 scripts/mem_envelope.py --sizes 256 512  # measure more
  python3 scripts/mem_envelope.py --sizes 1024     # the real question
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

GB = 1024.0**3
HBM_GB = 16.0  # v5e-class single chip


def analytic(n: int, ndev: int, min_rows: int = 2) -> float:
    """Per-shard bytes of the mixed sharded solve's carried state."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ndsm_tpu import GridHierarchy

    x = np.linspace(0.0, 1.0, n)
    h = GridHierarchy.from_mesh((x, x, x))
    f32 = 4
    rows = []
    total = 0.0
    for lvl, shape in enumerate(h.shapes):
        nz, ny, nx = shape
        loc_z = nz // ndev if nz // ndev >= min_rows else nz  # replicated
        sharded = loc_z != nz or ndev == 1
        per = ny * nx * f32
        # V-cycle state per level: u + rhs (f32 inner engine)
        lvl_bytes = 2 * loc_z * per
        extra = ""
        if lvl == 0:
            # outer f32 pair (uh, ul) + rhs pair + scaled defect r32
            lvl_bytes += 5 * loc_z * per
            # halo-args edge buffers (H_z=4 for ns=2, x3 inputs x lo/hi)
            lvl_bytes += 3 * 2 * 4 * per
            extra = " (+outer pair, rhs pair, defect, edge buffers)"
        total += lvl_bytes
        rows.append(
            f"    L{lvl} {str(shape):>18} local_z={loc_z:>5}"
            f" {'sharded' if (loc_z != nz) else 'replicated' if ndev > 1 else 'single'}"
            f"  {lvl_bytes / GB:8.3f} GB{extra}"
        )
    print(f"  analytic per-shard state, {n}^3 mixed, {ndev} shard(s):")
    for r in rows:
        print(r)
    print(f"    total carried state: {total / GB:.3f} GB")
    return total


def measured(n: int) -> None:
    """XLA buffer assignment of the actual single-device solve program."""
    import time

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from ndsm_tpu import GridHierarchy, Options
    from ndsm_tpu.mg.poisson import PoissonBVP

    x = np.linspace(0.0, 1.0, n)
    h = GridHierarchy.from_mesh((x, x, x))
    bvp = PoissonBVP(
        h,
        (("D", "D"), ("N", "N"), ("D", "D")),
        Options(precision="mixed"),
    )
    args = (
        jax.ShapeDtypeStruct((n, n, n), jnp.float64),
        jax.ShapeDtypeStruct((n, n, n), jnp.float64),
        jax.ShapeDtypeStruct((), jnp.float64),
        jax.ShapeDtypeStruct((), jnp.float64),
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    t0 = time.time()
    lowered = bvp._solve_jit.lower(*args, bvp._inner_max)
    comp = lowered.compile()
    ma = comp.memory_analysis()
    args_gb = ma.argument_size_in_bytes / GB
    out_gb = ma.output_size_in_bytes / GB
    tmp_gb = ma.temp_size_in_bytes / GB
    tot = args_gb + out_gb + tmp_gb
    print(
        f"  measured XLA buffer assignment, {n}^3 mixed solve "
        f"(compiled in {time.time() - t0:.0f}s):"
    )
    print(f"    arguments {args_gb:.3f} GB  outputs {out_gb:.3f} GB  "
          f"temp arena {tmp_gb:.3f} GB  TOTAL {tot:.3f} GB")
    print(f"    16 GB single-chip verdict: "
          f"{'FITS' if tot < HBM_GB else 'DOES NOT FIT'} "
          f"({tot / HBM_GB * 100:.0f}% of HBM)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[256])
    ap.add_argument("--n", type=int, default=1024)
    args = ap.parse_args()
    print(f"== analytic envelope for {args.n}^3 ==")
    for ndev in (1, 8, 16, 64):
        analytic(args.n, ndev)
    print("== measured (XLA buffer assignment, CPU-compiled) ==")
    for s in args.sizes:
        measured(s)
