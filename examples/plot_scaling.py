#!/usr/bin/env python3
"""Render the truncation-error scaling figure from a results table — the
counterpart of the reference's plot scripts (tests/integration_test/
integration_test1.py:139-171, tests/unit_tests/unit_test_2D_solve.py:66-75):
log-log error-vs-dx per metric with fitted power-law indices (expected ~2).

Reads the tab-separated table written by
``examples/integration_scaling.py --out FILE`` (same format as the
reference's checked-in results_test1.txt / results_test2.txt, so those
golden files plot directly too).

Usage:
  python examples/plot_scaling.py results.txt [-o scaling.pdf]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NAMES = ["Ea_max", "Ea_avg", "Eb_max", "Eb_avg", "Time"]


def load_table(path):
    rows = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            rows.append([float(v) for v in line.split()])
    if not rows:
        raise SystemExit(f"no data rows in {path}")
    data = np.asarray(rows)
    return data[:, 0], data[:, 1:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("table", help="results file (integration_scaling --out)")
    ap.add_argument("-o", "--output", default=None, help="figure path "
                    "(default: <table>.pdf)")
    args = ap.parse_args()

    from ndsm_tpu.utils.testing import power_law_fit

    dx, cols = load_table(args.table)
    out = args.output or os.path.splitext(args.table)[0] + ".pdf"

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax_e, ax_t) = plt.subplots(1, 2, figsize=(10, 4.2))
    for i, name in enumerate(NAMES[:4]):
        if i >= cols.shape[1]:
            break
        gamma, amp, _ = power_law_fit(dx, cols[:, i])
        ax_e.loglog(dx, cols[:, i], "o", label=f"{name} (γ={gamma:.3f})")
        ax_e.loglog(dx, amp * dx**gamma, "--", lw=1, color="gray")
        print(f"Power-law index {name}: {gamma:g}")
    ax_e.set_xlabel("dx")
    ax_e.set_ylabel("error")
    ax_e.set_title("Truncation-error scaling")
    ax_e.legend(fontsize=8)
    ax_e.grid(True, which="both", alpha=0.3)

    if cols.shape[1] >= 5:
        n = 1.0 / dx + 1.0
        gamma_t, amp_t, _ = power_law_fit(n, cols[:, 4])
        ax_t.loglog(n, cols[:, 4], "s", color="C3",
                    label=f"wall time (t∝N^{gamma_t:.2f})")
        ax_t.loglog(n, amp_t * n**gamma_t, "--", lw=1, color="gray")
        print(f"Power-law index Time vs N: {gamma_t:g}")
        ax_t.set_xlabel("N (mesh N³)")
        ax_t.set_ylabel("time [s]")
        ax_t.set_title("Runtime scaling")
        ax_t.legend(fontsize=8)
        ax_t.grid(True, which="both", alpha=0.3)

    fig.tight_layout()
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
