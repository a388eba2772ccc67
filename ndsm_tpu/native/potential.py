"""Native-CPU vector-potential pipeline: the complete flagship capability
with no JAX dependency — numpy orchestration over the C++/OpenMP multigrid
solver (native/solver.py), mirroring potential/vector_potential.py
step-for-step (and the reference pipeline, ndsm_vector_potential.f90:130).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from ..options import Options, VectorPotentialInfo
from ..potential import faces as F
from .solver import solve_poisson_bvp_native

__all__ = ["vector_potential_native"]


def _trapz2(f: np.ndarray, d0: float, d1: float) -> float:
    w0 = np.ones(f.shape[0]); w0[0] = w0[-1] = 0.5
    w1 = np.ones(f.shape[1]); w1[0] = w1[-1] = 0.5
    return float((f * np.outer(w0, w1)).sum() * d0 * d1)


def _central_zero_edges(c: np.ndarray, h: float, axis: int) -> np.ndarray:
    d = np.zeros_like(c)
    sl_mid = [slice(None)] * 2
    sl_hi = [slice(None)] * 2
    sl_lo = [slice(None)] * 2
    sl_mid[axis] = slice(1, -1)
    sl_hi[axis] = slice(2, None)
    sl_lo[axis] = slice(None, -2)
    d[tuple(sl_mid)] = (c[tuple(sl_hi)] - c[tuple(sl_lo)]) * (0.5 / h)
    return d


def _deriv(u: np.ndarray, h: float, axis: int) -> np.ndarray:
    d = np.empty_like(u)
    mid = [slice(None)] * 3
    mid[axis] = slice(1, -1)
    hi = [slice(None)] * 3
    hi[axis] = slice(2, None)
    lo = [slice(None)] * 3
    lo[axis] = slice(None, -2)
    d[tuple(mid)] = (u[tuple(hi)] - u[tuple(lo)]) * (0.5 / h)

    def take(i):
        s = [slice(None)] * 3
        s[axis] = i
        return u[tuple(s)]

    first = [slice(None)] * 3
    first[axis] = 0
    last = [slice(None)] * 3
    last[axis] = -1
    d[tuple(first)] = (-3 * take(0) + 4 * take(1) - take(2)) * (0.5 / h)
    d[tuple(last)] = (3 * take(-1) - 4 * take(-2) + take(-3)) * (0.5 / h)
    return d


def vector_potential_native(
    x, y, z, b, options: Options = Options()
) -> Tuple[int, np.ndarray, np.ndarray, VectorPotentialInfo]:
    """No-JAX float64 counterpart of ``ndsm_tpu.vector_potential``."""
    x = np.asarray(x, np.float64); y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    mesh_xyz = (x, y, z)
    b = np.asarray(b, np.float64)
    nz, ny, nx = len(z), len(y), len(x)
    if b.shape != (3, nz, ny, nx):
        raise ValueError(f"b shape {b.shape} != (3, {nz}, {ny}, {nx})")
    Lq = np.array([m.max() - m.min() for m in mesh_xyz])
    dq = np.array([m[1] - m[0] for m in mesh_xyz])

    bn = []
    for f in range(6):
        comp = F.FACE_COMP[f]
        idx = F.face_volume_index(f, (nz, ny, nx))
        bn.append(np.ascontiguousarray(b[comp][idx]))

    phi = np.zeros(6)
    for f in range(6):
        d1, d2 = F.FACE_DIMS[f]
        s0, s1 = (dq[0], dq[1]) if options.reference_flux_quirk else (dq[d2], dq[d1])
        phi[f] = _trapz2(bn[f], s0, s1)
    areas = np.array([Lq[d1] * Lq[d2] for (d1, d2) in F.FACE_DIMS])

    chi = []
    chi_info = []
    for f in range(6):
        d1, d2 = F.FACE_DIMS[f]
        rhs = bn[f] - phi[f] / areas[f]
        u, info = solve_poisson_bvp_native(
            np.zeros_like(rhs), rhs, (mesh_xyz[d2], mesh_xyz[d1]),
            (("N", "N"), ("N", "N")), options=options,
        )
        info.name = f"chi_face{f}"
        chi.append(u)
        chi_info.append(info)

    At1, At2 = [], []
    for f in range(6):
        d1, d2 = F.FACE_DIMS[f]
        if options.reference_flux_quirk:
            h1 = h2 = dq[F.FACE_COMP[f]]
        else:
            h1, h2 = dq[d1], dq[d2]
        s1, s2 = F.at_signs(f)
        At1.append(s1 * _central_zero_edges(chi[f], h2, axis=0))
        At2.append(s2 * _central_zero_edges(chi[f], h1, axis=1))

    comp_info = []
    A = np.zeros((3, nz, ny, nx))
    for comp in range(3):
        bcs = tuple(
            ("N", "N") if (2 - axis) == comp else ("D", "D") for axis in range(3)
        )
        u0 = np.zeros((nz, ny, nx))
        for f in range(6):
            if F.FACE_COMP[f] == comp:
                continue
            slot = F.face_at_component(f, comp)
            data = At1[f] if slot == 1 else At2[f]
            u0[F.face_volume_index(f, (nz, ny, nx))] = data
        ms = options.ms
        if comp == 2 and not options.honor_ms_for_az:
            ms = 5
        import dataclasses

        opts = options if ms == options.ms else dataclasses.replace(options, ms=ms)
        u, info = solve_poisson_bvp_native(
            u0, np.zeros_like(u0), (z, y, x), bcs, options=opts
        )
        info.name = f"A{'xyz'[comp]}"
        comp_info.append(info)
        A[comp] = u

    # flux-balance correction + curl (default order: correct A, then curl)
    V = float(np.prod(Lq))
    g = np.array([(phi[1] - phi[0]) / V, (phi[3] - phi[2]) / V, (phi[5] - phi[4]) / V])
    X = x[None, None, :]; Y = y[None, :, None]; Z = z[:, None, None]

    def a_corr():
        lin = np.stack([
            (g[1] - g[2]) * Y * Z + 0.0 * X,
            (g[2] - g[0]) * X * Z + 0.0 * Y,
            (g[0] - g[1]) * X * Y + 0.0 * Z,
        ])
        Ac = np.stack([
            -phi[4] * Lq[2] * Y / V + 0.0 * (X + Z),
            -phi[0] * Lq[0] * Z / V + 0.0 * (X + Y),
            -phi[2] * Lq[1] * X / V + 0.0 * (Y + Z),
        ])
        return Ac + lin / 3.0

    def curl_np(Av):
        Bx = _deriv(Av[2], dq[1], 1) - _deriv(Av[1], dq[2], 0)
        By = _deriv(Av[0], dq[2], 0) - _deriv(Av[2], dq[0], 2)
        Bz = _deriv(Av[1], dq[0], 2) - _deriv(Av[0], dq[1], 1)
        return np.stack([Bx, By, Bz])

    if options.flux_correction_order == 1:
        B = curl_np(A)
        bc = np.stack([
            g[0] * X + phi[0] * Lq[0] / V + 0.0 * (Y + Z),
            g[1] * Y + phi[2] * Lq[1] / V + 0.0 * (X + Z),
            g[2] * Z + phi[4] * Lq[2] / V + 0.0 * (X + Y),
        ])
        B = B + bc
        A = A + a_corr()
    else:
        A = A + a_corr()
        B = curl_np(A)

    ierr = max([s.ierr for s in chi_info] + [s.ierr for s in comp_info])
    info = VectorPotentialInfo(
        ierr=ierr, chi=tuple(chi_info), components=tuple(comp_info)
    )
    return ierr, A, B, info
