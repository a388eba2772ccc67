#!/usr/bin/env python3
"""Decompose the 220^3 headline wall into pipeline phases (info.phases).

One warmup (compiles), then NDSM_PERF_REPS (default 2) timed runs; prints
the per-phase seconds of each.  The question this answers (round 4): the
A download at the probe-measured ~74 MB/s link should be ~3.5 s, yet
transfer_s was ~16 s — where does the rest of the wall go?

Usage: python3 scripts/perf_headline_phases.py [n=220] [f32]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from ndsm_tpu import Options, vector_potential  # noqa: E402
from ndsm_tpu.utils.testing import build_test_mesh, potential_field_case  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 220
f32 = "f32" in sys.argv[2:]
enc = "split16" if "split16" in sys.argv[2:] else "f64"
reps = int(os.environ.get("NDSM_PERF_REPS", "2"))

x, y, z = build_test_mesh(n)
Z, Y, X = np.meshgrid(z, y, x, indexing="ij")
A1, b1 = potential_field_case(X, Y, Z)
opts = Options(
    host_curl=True,
    output_dtype="float32" if f32 else "float64",
    fetch_encoding=enc,
)

t0 = time.perf_counter()
ierr, A, B, info = vector_potential(x, y, z, b1.copy(), options=opts, full_output=True)
print(f"warm (incl. compile): {time.perf_counter() - t0:.2f}s ierr={ierr}", flush=True)

for r in range(reps):
    t0 = time.perf_counter()
    ierr, A, B, info = vector_potential(
        x, y, z, b1.copy(), options=opts, full_output=True
    )
    wall = time.perf_counter() - t0
    ph = {k: round(v, 3) for k, v in info.phases.items()}
    acc = sum(info.phases.values())
    print(
        f"rep {r}: wall={wall:.3f}s phases={ph} "
        f"(sum {acc:.3f}s, unattributed {wall - acc:.3f}s)",
        flush=True,
    )
    ea = float(np.linalg.norm(A1 - A, axis=0).max())
    eb = float(np.linalg.norm(b1 - B, axis=0).max())
    print(f"  Ea_max={ea:.5e} Eb_max={eb:.5e}", flush=True)
