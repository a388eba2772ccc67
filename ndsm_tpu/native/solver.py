"""Full multigrid Poisson solve on the native CPU core — a no-JAX
backend with the reference's exact algorithm and semantics.

The hot loops (red-black sweeps, residuals, per-axis transfer matmuls)
run in the C++/OpenMP library (ndsm_core.cc); this module provides the
V-cycle/driver orchestration on numpy arrays, mirroring the reference's
Fortran driver layer (solve_poisson_bvp + v_cycle/solve_exact;
fortran/ndsm_poisson.f90:63, ndsm_multigrid_core.f90:341,728).

Besides being a standalone CPU fallback, this is a second full-solver
implementation for differential testing of the JAX engine at the
whole-solve level.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from ..grids import GridHierarchy
from ..options import IERR_COVFAIL, IERR_SUCCESS, Options, SolveInfo
from ..ops.transfer import interp_matrix_1d, restrict_matrix_1d
from . import lib as nl

__all__ = ["solve_poisson_bvp_native"]


def _sweep(u, rhs, dq, bcs):
    if u.ndim == 3:
        return nl.rb_sweep_3d(u, rhs, dq, bcs)
    return nl.rb_sweep_nd(u, rhs, dq, bcs)


def _residual(u, rhs, dq, bcs):
    if u.ndim == 3:
        return nl.residual_3d(u, rhs, dq, bcs)
    # generic N-D via the same reflected-stencil math in numpy
    w = [1.0 / d**2 for d in dq]
    lap = np.zeros_like(u)
    for ax in range(u.ndim):
        lo = np.concatenate(
            [np.take(u, [1], axis=ax), np.take(u, range(u.shape[ax] - 1), axis=ax)],
            axis=ax,
        )
        hi = np.concatenate(
            [
                np.take(u, range(1, u.shape[ax]), axis=ax),
                np.take(u, [u.shape[ax] - 2], axis=ax),
            ],
            axis=ax,
        )
        lap += (lo - 2.0 * u + hi) * w[ax]
    r = rhs - lap
    for ax in range(u.ndim):
        sl = [slice(None)] * u.ndim
        if bcs[ax][0] == "D":
            sl[ax] = 0
            r[tuple(sl)] = 0.0
        if bcs[ax][1] == "D":
            sl[ax] = u.shape[ax] - 1
            r[tuple(sl)] = 0.0
    return r


def _apply_axis_mats(x: np.ndarray, mats) -> np.ndarray:
    lib = nl.get_lib()
    for ax, M in enumerate(mats):
        x = np.ascontiguousarray(np.moveaxis(x, ax, 0))
        n_in = x.shape[0]
        inner = int(np.prod(x.shape[1:])) if x.ndim > 1 else 1
        n_out = M.shape[0]
        y = np.zeros((n_out,) + x.shape[1:], dtype=np.float64)
        lib.ndsm_apply_axis_matrix(
            x.reshape(1, n_in, inner),
            y.reshape(1, n_out, inner),
            np.ascontiguousarray(M, dtype=np.float64),
            np.int64(1),
            np.int64(n_in),
            np.int64(n_out),
            np.int64(inner),
        )
        x = np.moveaxis(y, 0, ax)
    return np.ascontiguousarray(x)


def solve_poisson_bvp_native(
    u0: np.ndarray,
    rhs: np.ndarray,
    meshes: Sequence[np.ndarray],
    bcs: Sequence[Sequence[str]],
    *,
    ngrids=None,
    options: Options = Options(),
) -> Tuple[np.ndarray, SolveInfo]:
    """Native-CPU counterpart of ``ndsm_tpu.solve_poisson_bvp`` (float64,
    reference relax-to-ex_tol coarse solve)."""
    h = GridHierarchy.from_mesh(meshes, ngrids=ngrids)
    bcs = tuple(tuple(b) for b in bcs)
    o = options
    interp_mats = []
    restrict_mats = []
    for l in range(h.ngrids - 1):
        fine, coarse = h.meshes[l], h.meshes[l + 1]
        interp_mats.append([interp_matrix_1d(f, c) for f, c in zip(fine, coarse)])
        restrict_mats.append([restrict_matrix_1d(c, f) for f, c in zip(fine, coarse)])
    dq = [np.asarray(d, dtype=np.float64) for d in h.dq]

    def metric(a, b):
        d = np.abs(a - b)
        return d.max() if o.du_max else d.mean()

    noconv = [False]

    def solve_exact(u, rhs_l, level):
        u_sav = np.zeros_like(u)
        du = np.inf
        for _ in range(o.niterex_max):
            if du <= o.ex_tol:
                break
            u = _sweep(u, rhs_l, dq[level], bcs)
            du = metric(u, u_sav)
            u_sav = u.copy()
        if du > o.ex_tol:
            noconv[0] = True
        return u

    def vcycle(u, rhs_f):
        L = h.ngrids
        us = [None] * L
        rs = [None] * L
        us[0], rs[0] = u, rhs_f
        for l in range(L - 1):
            for _ in range(o.ms):
                us[l] = _sweep(us[l], rs[l], dq[l], bcs)
            r = _residual(us[l], rs[l], dq[l], bcs)
            rs[l + 1] = _apply_axis_mats(r, restrict_mats[l])
            us[l + 1] = np.zeros(h.shapes[l + 1], dtype=np.float64)
        us[L - 1] = solve_exact(us[L - 1], rs[L - 1], L - 1)
        for l in range(L - 2, -1, -1):
            for _ in range(o.ms):
                us[l + 1] = _sweep(us[l + 1], rs[l + 1], dq[l + 1], bcs)
            cor = _apply_axis_mats(us[l + 1], interp_mats[l])
            us[l] = us[l] + cor
            for _ in range(o.ms):
                us[l] = _sweep(us[l], rs[l], dq[l], bcs)
        return us[0]

    u = np.asarray(u0, dtype=np.float64).copy()
    rhs = np.asarray(rhs, dtype=np.float64)
    du = np.inf
    cycles = 0
    converged = False
    for _ in range(o.ncycles_max):
        u_new = vcycle(u, rhs)
        du = metric(u_new, u)
        u = u_new
        cycles += 1
        if du < o.vc_tol:
            converged = True
            break
    return u, SolveInfo(
        ierr=IERR_SUCCESS if converged else IERR_COVFAIL,
        du_last=float(du),
        cycles=cycles,
        coarse_noconv=noconv[0],
    )
