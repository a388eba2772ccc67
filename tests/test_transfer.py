"""Grid-transfer operator tests: N-linear exactness (port of
unit_test_interp.f90), the Galerkin adjointness property (port of
unit_test_galerkin.f90), and differential tests of the separable-matrix
path against the per-point coordinate-based oracle."""

import numpy as np
import pytest

from ndsm_tpu.grids import GridHierarchy
from ndsm_tpu.ops.transfer import (
    interp_matrix_1d,
    restrict_matrix_1d,
    prolong,
    restrict,
    ninterp,
    inner_product,
)
import oracle


def _random_meshes(rng, ndim, nmin=2, nmax=32, lfactor=16.0):
    meshes = []
    for _ in range(ndim):
        n = int(rng.integers(nmin, nmax + 1))
        lo, hi = np.sort(rng.random(2) * lfactor)
        if hi - lo < 1e-3:
            hi = lo + 1.0
        meshes.append(np.linspace(lo, hi, n))
    return meshes


def _nlinear(meshes, M, B):
    """f(q) = prod_i (M_i q_i + B_i) evaluated on the tensor grid
    (reference nlinear_function, ndsm_interp.f90:479-499)."""
    ndim = len(meshes)
    f = 1.0
    for i in range(ndim):
        shape = [1] * ndim
        shape[i] = -1
        f = f * (M[i] * meshes[i] + B[i]).reshape(shape)
    return np.asarray(f)


def test_interp_exactness_5d():
    """An N-linear function must be reproduced to rounding error by
    N-linear interpolation (port of unit_test_interp.f90: 5-D random
    meshes, 16 random query points)."""
    rng = np.random.default_rng(2112)
    meshes = _random_meshes(rng, 5)
    M = rng.standard_normal(5)
    B = rng.standard_normal(5)
    f = _nlinear(meshes, M, B)
    scale = np.abs(f).max()
    for _ in range(16):
        q0 = [rng.uniform(m[0], m[-1]) for m in meshes]
        got = ninterp(f, meshes, q0)
        want = float(np.prod([M[i] * q0[i] + B[i] for i in range(5)]))
        assert abs(got - want) <= 1e-11 * max(scale, abs(want), 1.0)


def test_prolong_exactness_on_nlinear():
    """Separable-matrix prolongation of an N-linear function onto a finer
    mesh is exact."""
    rng = np.random.default_rng(5)
    ndim = 3
    coarse = _random_meshes(rng, ndim, nmin=5, nmax=9)
    fine = [np.linspace(m[0], m[-1], 2 * len(m) + 1) for m in coarse]
    M = rng.standard_normal(ndim)
    B = rng.standard_normal(ndim)
    fc = _nlinear(coarse, M, B)
    ff = _nlinear(fine, M, B)
    mats = [interp_matrix_1d(f, c) for f, c in zip(fine, coarse)]
    got = np.asarray(prolong(fc, mats))
    np.testing.assert_allclose(got, ff, rtol=1e-12, atol=1e-12 * np.abs(ff).max())


@pytest.mark.parametrize("ndim", [2, 4])
def test_galerkin_property(ndim):
    """<u_c, R[u_f]>_c == <P[u_c], u_f>_f to rounding (port of
    unit_test_galerkin.f90, which uses 4-D meshes)."""
    rng = np.random.default_rng(31 + ndim)
    nf = [32, 17, 25, 32][:ndim]
    nc = [15, 8, 12, 15][:ndim]
    ext = [np.sort(rng.random(2) * 16.0) for _ in range(ndim)]
    mesh_f = [np.linspace(lo, hi, n) for (lo, hi), n in zip(ext, nf)]
    mesh_c = [np.linspace(lo, hi, n) for (lo, hi), n in zip(ext, nc)]
    u_f = rng.standard_normal(nf)
    u_c = rng.standard_normal(nc)
    Pm = [interp_matrix_1d(f, c) for f, c in zip(mesh_f, mesh_c)]
    Rm = [restrict_matrix_1d(c, f) for f, c in zip(mesh_f, mesh_c)]
    dq_f = [m[1] - m[0] for m in mesh_f]
    dq_c = [m[1] - m[0] for m in mesh_c]
    lhs = float(inner_product(u_c, np.asarray(restrict(u_f, Rm)), dq_c))
    rhs = float(inner_product(np.asarray(prolong(u_c, Pm)), u_f, dq_f))
    assert abs(lhs - rhs) <= 1e-10 * max(abs(lhs), abs(rhs), 1.0)


def test_restrict_matches_pointwise_oracle():
    """Separable-matrix restriction equals the per-point coordinate-based
    rule of nrestrict (ndsm_interp.f90:186-292)."""
    rng = np.random.default_rng(77)
    h = GridHierarchy.from_mesh(
        (np.linspace(0.0, 1.0, 21), np.linspace(-0.5, 2.0, 27))
    )
    mesh_f = h.meshes[0]
    mesh_c = h.meshes[1]
    f = rng.standard_normal(h.shapes[0])
    Rm = [restrict_matrix_1d(c, fm) for fm, c in zip(mesh_f, mesh_c)]
    got = np.asarray(restrict(f, Rm))
    for i0 in range(h.shapes[1][0]):
        for i1 in range(h.shapes[1][1]):
            q0 = (mesh_c[0][i0], mesh_c[1][i1])
            want = oracle.nrestrict_point(f, mesh_c, mesh_f, q0)
            assert abs(got[i0, i1] - want) < 1e-12


def test_prolong_matches_pointwise_ninterp():
    rng = np.random.default_rng(78)
    h = GridHierarchy.from_mesh(
        (np.linspace(0.0, 3.0, 19), np.linspace(0.0, 1.0, 23))
    )
    u_c = rng.standard_normal(h.shapes[1])
    Pm = [interp_matrix_1d(f, c) for f, c in zip(h.meshes[0], h.meshes[1])]
    got = np.asarray(prolong(u_c, Pm))
    for i0 in range(h.shapes[0][0]):
        for i1 in range(h.shapes[0][1]):
            q0 = (h.meshes[0][0][i0], h.meshes[0][1][i1])
            want = ninterp(u_c, h.meshes[1], q0)
            assert abs(got[i0, i1] - want) < 1e-12


def test_hierarchy_shapes_rule():
    h = GridHierarchy.from_mesh([np.linspace(0, 1, 22)] * 3)
    # ngrids = floor(log2(22/2)) = 3; shapes 22 -> 11 -> 5
    assert h.ngrids == 3
    assert h.shapes == ((22, 22, 22), (11, 11, 11), (5, 5, 5))
    # coarse meshes are fresh uniform linspaces over [min, max] (quirk Q10)
    for lvl in range(h.ngrids):
        for m in h.meshes[lvl]:
            assert m[0] == 0.0 and abs(m[-1] - 1.0) < 1e-15
