"""User-facing API, drop-in compatible with the reference's Python entry
point ``ndsm.vector_potential`` (reference: ndsm.py:66-210) — same argument
names, defaults, and ``(ierr, A, B)`` return convention — minus the ctypes
machinery (``libname``/``libpath`` are accepted and ignored for source
compatibility: there is no shared library to locate).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .options import Options
from .potential.vector_potential import compute_vector_potential

__all__ = ["vector_potential"]


def vector_potential(
    x,
    y,
    z,
    b,
    niterex_max: int = 10000,
    ncycles_max: int = 1024,
    ex_tol: float = 1e-13,
    vc_tol: float = 1e-10,
    ms: int = 5,
    mean: bool = False,
    libname: Optional[str] = None,  # accepted for reference compatibility
    libpath: Optional[str] = None,  # accepted for reference compatibility
    debug: bool = False,
    *,
    precision: str = "auto",
    options: Optional[Options] = None,
    full_output: bool = False,
    dist=None,
):
    """Compute the potential magnetic field and Coulomb-gauge vector
    potential from boundary Bn.

    Args:
      x, y, z: 1-D mesh vectors of lengths (nx, ny, nz); uniform spacing.
      b: (3, nz, ny, nx) array; only the boundary-face normal components
        are read (the interior and output B are fully recomputed).
      niterex_max: max relaxation iterations for the coarse-grid solve.
      ncycles_max: max V-cycles before returning a not-converged flag.
      ex_tol: coarse-grid tolerance on the inter-iteration change.
      vc_tol: V-cycle tolerance on the inter-cycle change.
      ms: smoothing sweeps before/after each grid transfer.
      mean: use the mean |change| instead of the max as the metric.
      debug: print per-cycle/per-phase diagnostics.
      precision: "auto" | "fp64" | "mixed" | "fp32" (see Options).
      options: full Options override (takes precedence over the above).
      full_output: also return the diagnostics record.
      dist: optional ndsm_tpu.parallel.shard.DistConfig — run every
        sub-solve on the explicit shard_map engine over a device mesh
        (spatial domain decomposition; sub-problems whose shapes cannot
        be partitioned fall back to single-device).

    Returns:
      (ierr, A, B) with A, B numpy float64 arrays of shape (3, nz, ny, nx);
      plus info when ``full_output``.  ierr != 0 indicates a convergence
      problem in at least one sub-solve (unlike the reference, which only
      reports the final 2D chi solve — quirk Q2).
    """
    if options is None:
        options = Options(
            ms=ms,
            ncycles_max=ncycles_max,
            niterex_max=niterex_max,
            ex_tol=ex_tol,
            vc_tol=vc_tol,
            mean=mean,
            debug=debug,
            precision=precision,
        )

    b = np.asarray(b)
    ierr, A, B, info = compute_vector_potential((x, y, z), b, options, dist=dist)
    A = np.asarray(A)
    B = np.asarray(B)
    if full_output:
        return ierr, A, B, info
    return ierr, A, B
