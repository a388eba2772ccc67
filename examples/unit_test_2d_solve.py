#!/usr/bin/env python3
"""2D Poisson solver scaling test + figure — the counterpart of the
reference's tests/unit_tests/unit_test_2D_solve.f90 (data generation) and
unit_test_2D_solve.py (plot), collapsed into one script (no two-language
round-trip needed here).

Solves the all-Neumann polynomial case

    Lap(u) = a1*(2x - Lx) + b1*(2y - Ly)     (unit_test_2D_solve.f90:92)

on meshes ceil([27, 36] * s) for the reference's nine scale factors
(unit_test_2D_solve.f90:68), writes ``res.txt`` rows ``dx  Emax  Eavg``
(comparable after mean subtraction, as the analytic solution is defined
up to a constant), fits the power law, and renders the log-log figure
(unit_test_2D_solve.py:66-88).  Expected index ~2.

Usage:
  python examples/unit_test_2d_solve.py [-o unit_test_2D_solve.pdf]
  python examples/unit_test_2d_solve.py --quick     # 4 sizes only
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCALEFAC = [1.0, 1.5, 2.0, 4.0, 5.5, 10.0, 15.0, 20.0, 25.0]
NSHAPE_BASE = np.array([27, 36])


def solve_case(nshape, a1, b1, Lx=1.0, dump=None):
    """[dx, Emax, Eavg] for one resolution (solve_test_case,
    unit_test_2D_solve.f90:126-230)."""
    from ndsm_tpu import GridHierarchy, Options
    from ndsm_tpu.mg.poisson import PoissonBVP

    nx, ny = int(nshape[0]), int(nshape[1])
    dx = 1.0 / (nx - 1.0)
    x = np.arange(nx) * dx
    y = np.arange(ny) * dx
    Ly = y.max() - y.min()
    X, Y = np.meshgrid(x, y, indexing="ij")
    rhs = a1 * (2 * X - Lx) + b1 * (2 * Y - Ly)
    # Analytic solution (up to a constant): integrate twice per axis.
    ue = a1 * (X**3 / 3 - Lx * X**2 / 2) + b1 * (Y**3 / 3 - Ly * Y**2 / 2)

    h = GridHierarchy.from_mesh((x, y))
    bvp = PoissonBVP(
        h, (("N", "N"), ("N", "N")), Options(ex_tol=1e-12, ncycles_max=256)
    )
    u, info = bvp.solve(np.zeros_like(rhs), rhs)
    if info.ierr != 0:
        print("ERROR: FAILED TO CONVERGE", file=sys.stderr)
    u = np.asarray(u)
    if dump:
        # raw solution dump (reference ``filedump`` -> dump.dat,
        # unit_test_2D_solve.f90:231-238: nshape, u, ue) — .npz instead
        # of Fortran unformatted records
        print("Dumping to file:", dump)
        np.savez(dump, nshape=np.asarray(nshape), u=u, ue=ue)
    diff = (u - u.mean()) - (ue - ue.mean())
    return [dx, np.abs(diff).max(), np.abs(diff).mean()], info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default="unit_test_2D_solve.pdf")
    ap.add_argument("--data", default="res.txt")
    ap.add_argument("--quick", action="store_true", help="first 4 sizes only")
    ap.add_argument(
        "--dump", default=None, metavar="FILE",
        help="write the finest case's raw u/ue arrays to FILE.npz "
        "(the reference's optional dump.dat)",
    )
    args = ap.parse_args()

    rng = np.random.default_rng(2112)  # seed role as in the reference
    a1, b1 = rng.random(), rng.random()

    facs = SCALEFAC[:4] if args.quick else SCALEFAC
    rows = []
    print("Output file:", args.data)
    print("Solving...")
    for s in facs:
        nshape = np.ceil(NSHAPE_BASE * s).astype(int)
        t0 = time.perf_counter()
        res, info = solve_case(
            nshape, a1, b1, dump=(args.dump if s == facs[-1] else None)
        )
        rows.append(res)
        print(
            f"  {nshape[0]}x{nshape[1]}: dx={res[0]:.4g} Emax={res[1]:.4g} "
            f"Eavg={res[2]:.4g} cycles={info.cycles} "
            f"({time.perf_counter() - t0:.1f}s)"
        )
    data = np.asarray(rows)
    np.savetxt(args.data, data, header="Result dx,Emax,Eavg")

    from ndsm_tpu.utils.testing import power_law_fit

    gamma, A, ev = power_law_fit(data[:, 0], data[:, 1])
    print("Power-law index: {:.12g}".format(gamma))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    hc = np.logspace(-3, 0, 16)
    plt.loglog(data[:, 0], data[:, 1], ".", label="$E_{max}$", zorder=4, color="b")
    plt.loglog(
        hc, ev(hc), "-",
        label=r"$E_{max} \propto h^\gamma : \gamma=%3.3f$" % gamma,
        zorder=4, color="r",
    )
    plt.title("ndsm_tpu 2D Poisson solver test")
    plt.xlabel("Mesh spacing: $h$", fontsize=16)
    plt.ylabel("Numerical Error ($E_{max}$)", fontsize=16)
    plt.grid("on", which="both", color=".8", linestyle="-")
    plt.legend(loc="upper left", fontsize=14)
    plt.minorticks_on()
    plt.xlim([1e-3, 1])
    print("Writing: " + args.output)
    plt.savefig(args.output, bbox_inches="tight")


if __name__ == "__main__":
    main()
