"""Independent loop-level oracle implementations of the reference
algorithms, used for differential testing of the vectorized JAX kernels.

These follow the Fortran semantics literally (per-point scan order,
in-place updates, index reflection) but are written directly from the
algorithm description in SURVEY.md — 0-based, numpy, row-major — so they
are an independent check, not a translation.

Array convention matches the library: C-ordered arrays whose *last* axis
corresponds to the reference's first (fastest) Fortran dimension.
"""

from __future__ import annotations

import itertools

import numpy as np


def _reflect(i: int, n: int) -> int:
    """Neumann index reflection: -1 -> 1, n -> n-2 (0-based)."""
    if i < 0:
        return 1
    if i > n - 1:
        return n - 2
    return i


def rb_gauss_3d(u: np.ndarray, rhs: np.ndarray, dq, bcs) -> np.ndarray:
    """One in-place red-black Gauss-Seidel sweep on a (n0, n1, n2) array.

    ``bcs``: per C-axis (lower, upper) in 'N'/'D'.  The first-updated color
    has 0-based sum-parity 0 when the last axis' lower BC is 'N', else 1
    (ndsm_optimized.f90:106 with lb(1)=1 or 2).  Dirichlet faces are
    skipped by shrinking the loop bounds; Neumann neighbors reflect.
    """
    u = u.copy()
    n0, n1, n2 = u.shape
    w = [1.0 / (d * d) for d in dq]  # per C axis
    w1 = 1.0 / (2.0 * sum(w))
    lo = [0, 0, 0]
    hi = [n0 - 1, n1 - 1, n2 - 1]
    for ax in range(3):
        if bcs[ax][0] == "D":
            lo[ax] += 1
        if bcs[ax][1] == "D":
            hi[ax] -= 1
    red = 0 if bcs[2][0] == "N" else 1
    for parity in (red, 1 - red):
        for i0 in range(lo[0], hi[0] + 1):
            for i1 in range(lo[1], hi[1] + 1):
                for i2 in range(lo[2], hi[2] + 1):
                    if (i0 + i1 + i2) % 2 != parity:
                        continue
                    s = (
                        (
                            u[i0, i1, _reflect(i2 - 1, n2)]
                            + u[i0, i1, _reflect(i2 + 1, n2)]
                        )
                        * w[2]
                        + (
                            u[i0, _reflect(i1 - 1, n1), i2]
                            + u[i0, _reflect(i1 + 1, n1), i2]
                        )
                        * w[1]
                        + (
                            u[_reflect(i0 - 1, n0), i1, i2]
                            + u[_reflect(i0 + 1, n0), i1, i2]
                        )
                        * w[0]
                    )
                    u[i0, i1, i2] = w1 * (s - rhs[i0, i1, i2])
    if all(b == ("N", "N") or tuple(b) == ("N", "N") for b in bcs):
        u -= u.mean()
    return u


def relax_nd(u: np.ndarray, rhs: np.ndarray, dq, bcs, coloring="sum") -> np.ndarray:
    """Generic N-D red-black sweep (ndsm_poisson.f90:451-549 semantics):
    Dirichlet points skipped; reflection at Neumann faces; mean subtracted
    for all-Neumann.

    ``coloring="sum"`` uses true sum-parity (the library's deliberate
    choice — quirk Q8); ``coloring="same"`` uses the reference's "all
    1-based indices even or all odd" rule, which coincides with sum-parity
    in 2D but is not a checkerboard for ndim >= 3 (and is racy there in
    the reference's OpenMP loop)."""
    u = u.copy()
    ndim = u.ndim
    shape = u.shape
    w = [1.0 / (d * d) for d in dq]
    w0 = 1.0 / (2.0 * sum(w))

    def at_dirichlet(idx):
        for ax in range(ndim):
            if idx[ax] == 0 and bcs[ax][0] == "D":
                return True
            if idx[ax] == shape[ax] - 1 and bcs[ax][1] == "D":
                return True
        return False

    def is_first(idx):
        if coloring == "sum":
            return sum(idx) % 2 == 0
        p = [i % 2 for i in idx]
        return all(q == p[0] for q in p)

    for which in (True, False):
        for idx in itertools.product(*[range(n) for n in shape]):
            if is_first(idx) != which:
                continue
            if at_dirichlet(idx):
                continue
            s = 0.0
            for ax in range(ndim):
                lo = list(idx)
                hi = list(idx)
                lo[ax] = _reflect(idx[ax] - 1, shape[ax])
                hi[ax] = _reflect(idx[ax] + 1, shape[ax])
                s += (u[tuple(lo)] + u[tuple(hi)]) * w[ax]
            u[idx] = (s - rhs[idx]) * w0
    if all(tuple(b) == ("N", "N") for b in bcs):
        u -= u.mean()
    return u


def residual_nd(u: np.ndarray, rhs: np.ndarray, dq, bcs) -> np.ndarray:
    """r = rhs - L[u], zero at Dirichlet faces (ndsm_poisson.f90:280-353)."""
    ndim = u.ndim
    shape = u.shape
    w = [1.0 / (d * d) for d in dq]
    r = np.zeros_like(u)
    for idx in itertools.product(*[range(n) for n in shape]):
        on_d = any(
            (idx[ax] == 0 and bcs[ax][0] == "D")
            or (idx[ax] == shape[ax] - 1 and bcs[ax][1] == "D")
            for ax in range(ndim)
        )
        if on_d:
            continue
        lap = 0.0
        for ax in range(ndim):
            lo = list(idx)
            hi = list(idx)
            lo[ax] = _reflect(idx[ax] - 1, shape[ax])
            hi[ax] = _reflect(idx[ax] + 1, shape[ax])
            lap += (u[tuple(lo)] - 2.0 * u[idx] + u[tuple(hi)]) * w[ax]
        r[idx] = rhs[idx] - lap
    return r


def nrestrict_point(f: np.ndarray, meshes_c, meshes_f, q0) -> float:
    """Full-weighting restriction of fine-grid ``f`` at one coarse point
    (ndsm_interp.f90:186-292 semantics)."""
    from ndsm_tpu.ops.transfer import bracket_uniform

    ndim = f.ndim
    ranges = []
    w2 = []
    dq_c = []
    for ax in range(ndim):
        qc = np.asarray(meshes_c[ax])
        qf = np.asarray(meshes_f[ax])
        dc = qc[1] - qc[0]
        df = qf[1] - qf[0]
        dq_c.append(dc)
        w2.append(df / dc**2)
        il, ih, ierr = bracket_uniform(qf, q0[ax] - dc)
        lo = il if ierr < 0 else ih
        il, ih, ierr = bracket_uniform(qf, q0[ax] + dc)
        hi = ih if ierr > 0 else il
        ranges.append(range(lo, hi + 1))
    out = 0.0
    for idx in itertools.product(*ranges):
        w = 1.0
        for ax in range(ndim):
            c1 = abs(np.asarray(meshes_f[ax])[idx[ax]] - q0[ax])
            w *= abs(dq_c[ax] - c1) * w2[ax]
        out += w * f[idx]
    return out
