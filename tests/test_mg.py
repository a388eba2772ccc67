"""Multigrid engine and Poisson driver tests: truncation-error scaling
(port of unit_test_2D_solve.f90), metric/tolerance semantics, reduced
cycles, and fp64/mixed equivalence."""

import numpy as np
import pytest

from ndsm_tpu import GridHierarchy, Options, solve_poisson_bvp
from ndsm_tpu.mg.poisson import PoissonBVP
from ndsm_tpu.utils.testing import power_law_fit


def _poly_neumann_2d(nx, ny, Lx, Ly, a1=0.75, b1=-0.35):
    """Pure-Neumann polynomial case of unit_test_2D_solve.f90:
    rhs = a1 (2x - Lx) + b1 (2y - Ly);
    u   = a1 (x^3/3 - Lx x^2/2) + b1 (y^3/3 - Ly y^2/2) + const."""
    x = np.linspace(0, Lx, nx)
    y = np.linspace(0, Ly, ny)
    X, Y = np.meshgrid(x, y, indexing="xy")  # (ny, nx): axes (y, x)
    rhs = a1 * (2 * X - Lx) + b1 * (2 * Y - Ly)
    u = a1 * (X**3 / 3 - Lx * X**2 / 2) + b1 * (Y**3 / 3 - Ly * Y**2 / 2)
    return (y, x), rhs, u - u.mean()


@pytest.mark.parametrize("precision", ["fp64", "mixed"])
def test_2d_neumann_scaling(precision):
    """Truncation error must scale ~h^2 (reference expects index ~2,
    unit_test_2D_solve.py:66-75)."""
    scales = [1, 2, 4]
    base = (27, 36)
    errs, dxs = [], []
    for s in scales:
        nx, ny = base[0] * s, base[1] * s
        meshes, rhs, u_exact = _poly_neumann_2d(nx, ny, 1.0, 1.3)
        u, info = solve_poisson_bvp(
            np.zeros_like(rhs),
            rhs,
            meshes,
            (("N", "N"), ("N", "N")),
            options=Options(precision=precision),
        )
        assert info.ierr == 0
        u = np.array(u)
        u -= u.mean()
        errs.append(np.abs(u - u_exact).max())
        dxs.append(1.0 / (nx - 1))
    gamma, _, _ = power_law_fit(np.array(dxs), np.array(errs))
    assert 1.7 < gamma < 2.3, (gamma, errs)


def test_3d_dirichlet_manufactured():
    n = 33
    x = np.linspace(0, 1, n)
    Z, Y, X = np.meshgrid(x, x, x, indexing="ij")
    U = np.sin(np.pi * X) * np.sin(np.pi * Y) * np.sin(np.pi * Z)
    rhs = -3 * np.pi**2 * U
    u, info = solve_poisson_bvp(
        np.zeros_like(U), rhs, (x, x, x), (("D", "D"),) * 3,
        options=Options(precision="fp64"),
    )
    assert info.ierr == 0
    assert np.abs(np.asarray(u) - U).max() < 2e-3


def test_inhomogeneous_dirichlet_data_held():
    """Dirichlet faces take their values from u0 and are held fixed."""
    n = 17
    x = np.linspace(0, 1, n)
    X, Y = np.meshgrid(x, x, indexing="xy")
    U = X * Y + 2.0 * X - Y  # harmonic: laplace(U) = 0
    u0 = np.zeros_like(U)
    for idx in (np.s_[0, :], np.s_[-1, :], np.s_[:, 0], np.s_[:, -1]):
        u0[idx] = U[idx]
    u, info = solve_poisson_bvp(
        u0, np.zeros_like(U), (x, x), (("D", "D"), ("D", "D")),
        options=Options(precision="fp64"),
    )
    assert info.ierr == 0
    u = np.array(u)
    np.testing.assert_array_equal(u[0, :], U[0, :])
    np.testing.assert_array_equal(u[:, -1], U[:, -1])
    assert np.abs(u - U).max() < 1e-7  # harmonic bilinear is ~exactly captured


def test_mixed_matches_fp64():
    meshes, rhs, _ = _poly_neumann_2d(54, 72, 1.0, 1.3)
    sols = {}
    for prec in ("fp64", "mixed"):
        u, info = solve_poisson_bvp(
            np.zeros_like(rhs), rhs, meshes, (("N", "N"), ("N", "N")),
            options=Options(precision=prec),
        )
        assert info.ierr == 0
        sols[prec] = np.asarray(u)
    diff = np.abs(sols["fp64"] - sols["mixed"]).max()
    assert diff < 5e-9, diff  # both converged to vc_tol=1e-10 of same limit


def test_mean_metric_converges():
    meshes, rhs, u_exact = _poly_neumann_2d(27, 36, 1.0, 1.3)
    u, info = solve_poisson_bvp(
        np.zeros_like(rhs), rhs, meshes, (("N", "N"), ("N", "N")),
        options=Options(precision="fp64", mean=True),
    )
    assert info.ierr == 0
    u = np.array(u)
    u -= u.mean()
    assert np.abs(u - u_exact).max() < 5e-3


def test_covfail_flag():
    """ncycles_max=1 on a hard problem must return IERR_COVFAIL=1
    (reference: ndsm_poisson.f90:147-150)."""
    meshes, rhs, _ = _poly_neumann_2d(27, 36, 1.0, 1.3)
    u, info = solve_poisson_bvp(
        np.zeros_like(rhs), rhs, meshes, (("N", "N"), ("N", "N")),
        options=Options(precision="fp64", ncycles_max=1, vc_tol=1e-14),
    )
    assert info.ierr == 1
    assert info.cycles == 1
    assert info.du_last > 1e-14


def test_du_history():
    """solve(history=True) records the per-cycle du trace (the reference's
    debug-mode "Solution delta" lines, ndsm_poisson.f90:129-135) without
    changing the iterate sequence."""
    from ndsm_tpu.grids import GridHierarchy
    from ndsm_tpu.mg.poisson import PoissonBVP

    meshes, rhs, _ = _poly_neumann_2d(27, 36, 1.0, 1.3)
    bvp = PoissonBVP(
        GridHierarchy.from_mesh(meshes),
        (("N", "N"), ("N", "N")),
        Options(precision="fp64"),
    )
    u_h, info_h = bvp.solve(np.zeros_like(rhs), rhs, history=True)
    u_p, info_p = bvp.solve(np.zeros_like(rhs), rhs)
    assert info_h.ierr == 0
    assert info_h.du_history is not None
    assert len(info_h.du_history) == info_h.cycles == info_p.cycles
    # identical iterates; last history entry == du_last; trace decreases
    np.testing.assert_array_equal(np.asarray(u_h), np.asarray(u_p))
    assert info_h.du_history[-1] == info_h.du_last == info_p.du_last
    assert info_h.du_history[0] > info_h.du_history[-1]
    assert info_p.du_history is None


def test_one_grid_two_grid():
    """Reduced-cycle drivers (reference one_grid/two_grid,
    ndsm_multigrid_core.f90:385-441) solve a small problem directly."""
    n = 17
    x = np.linspace(0, 1, n)
    X, Y = np.meshgrid(x, x, indexing="xy")
    U = np.sin(np.pi * X) * np.sin(np.pi * Y)
    rhs = -2 * np.pi**2 * U
    h = GridHierarchy.from_mesh((x, x))
    bvp = PoissonBVP(h, (("D", "D"), ("D", "D")), Options(precision="fp64"))
    u1 = np.asarray(bvp.one_grid(np.zeros_like(U), rhs, ex_tol=1e-12))
    assert np.abs(u1 - U).max() < 5e-2
    u2 = np.asarray(bvp.two_grid(np.zeros_like(U), rhs, ex_tol=1e-12))
    assert np.abs(u2 - U).max() < 5e-2


def test_4d_solve():
    """N-dimensional capability beyond the reference's exercised paths:
    4D all-Neumann solve with manufactured cosine solution."""
    n = 12
    x = np.linspace(0, 1, n)
    grids = np.meshgrid(*([x] * 4), indexing="ij")
    U = np.ones_like(grids[0])
    for g in grids:
        U = U * np.cos(np.pi * g)
    rhs = -4 * np.pi**2 * U
    u, info = solve_poisson_bvp(
        np.zeros_like(U), rhs, (x,) * 4, (("N", "N"),) * 4,
        options=Options(precision="fp64"),
    )
    assert info.ierr == 0
    u = np.array(u)
    u -= u.mean()
    assert np.abs(u - (U - U.mean())).max() < 0.1


def test_checkpointed_solve(tmp_path):
    """solve_checkpointed produces the same result as solve and resumes
    from its checkpoint file."""
    meshes, rhs, _ = _poly_neumann_2d(27, 36, 1.0, 1.3)
    from ndsm_tpu.mg.poisson import get_poisson_bvp
    h = GridHierarchy.from_mesh(meshes)
    bvp = get_poisson_bvp(h, (("N", "N"), ("N", "N")), Options(precision="fp64"))
    u_ref, info_ref = bvp.solve(np.zeros_like(rhs), rhs)
    ck = str(tmp_path / "state.npz")
    u_ck, info_ck = bvp.solve_checkpointed(
        np.zeros_like(rhs), rhs, checkpoint_path=ck, checkpoint_every=4
    )
    assert info_ck.ierr == 0
    np.testing.assert_allclose(np.asarray(u_ck), np.asarray(u_ref), atol=5e-11)
    # resume: running again starts converged and does no more cycles
    u_again, info2 = bvp.solve_checkpointed(
        np.zeros_like(rhs), rhs, checkpoint_path=ck, checkpoint_every=4
    )
    assert info2.cycles == info_ck.cycles
    np.testing.assert_allclose(np.asarray(u_again), np.asarray(u_ck), atol=0)


def test_solve_batch_matches_individual():
    """Lane-masked batched solves equal standalone solves per problem."""
    from ndsm_tpu.mg.poisson import get_poisson_bvp

    meshes, rhs1, _ = _poly_neumann_2d(27, 36, 1.0, 1.3)
    _, rhs2, _ = _poly_neumann_2d(27, 36, 1.0, 1.3, a1=-0.4, b1=0.9)
    h = GridHierarchy.from_mesh(meshes)
    opts = Options(precision="mixed")  # auto -> direct coarse -> batched path
    bvp = get_poisson_bvp(h, (("N", "N"), ("N", "N")), opts)
    u1, i1 = bvp.solve(np.zeros_like(rhs1), rhs1)
    u2, i2 = bvp.solve(np.zeros_like(rhs2), rhs2)
    us, infos = bvp.solve_batch(
        [np.zeros_like(rhs1), np.zeros_like(rhs2)], [rhs1, rhs2]
    )
    assert [s.cycles for s in infos] == [i1.cycles, i2.cycles]
    np.testing.assert_allclose(np.asarray(us[0]), np.asarray(u1), atol=1e-13)
    np.testing.assert_allclose(np.asarray(us[1]), np.asarray(u2), atol=1e-13)
    assert all(s.ierr == 0 for s in infos)


def test_two_grid_sequencing_differential():
    """Differential test of the reduced-cycle drivers against an
    independent numpy/native implementation of the REFERENCE sequencing
    (two_grid: ms pre-smooth, residual, restrict, solve_exact on coarse,
    ms coarse smooth, interpolate+add, ms post-smooth —
    ndsm_multigrid_core.f90:385-410).  A reordered driver (e.g. a dropped
    coarse post-smooth) differs at ~1e-3 and fails the 1e-10 bound."""
    from ndsm_tpu.native.solver import _apply_axis_mats, _residual, _sweep
    from ndsm_tpu.ops.transfer import interp_matrix_1d, restrict_matrix_1d

    meshes, rhs, _ = _poly_neumann_2d(27, 36, 1.0, 1.3)
    bcs = (("N", "N"), ("N", "N"))
    h = GridHierarchy.from_mesh(meshes, ngrids=2)
    # niterex_max bounds the coarse solve at 4 sweeps so it stays INEXACT:
    # with a fully converged coarse solve the coarse post-smooth is a
    # ~1e-12 no-op and a dropped-smooth mis-sequencing would be invisible.
    opts = Options(precision="fp64", ms=5, ex_tol=1e-12, niterex_max=4)
    bvp = PoissonBVP(h, bcs, opts)
    rng = np.random.default_rng(7)
    u0 = rng.standard_normal(rhs.shape)

    # Independent reference implementation on the native sweeps
    dq = [np.asarray(d, dtype=np.float64) for d in h.dq]
    R = [restrict_matrix_1d(c, f) for f, c in zip(h.meshes[0], h.meshes[1])]
    P = [interp_matrix_1d(f, c) for f, c in zip(h.meshes[0], h.meshes[1])]

    def solve_exact_np(u, rhs_l, level, nmax=None):
        u_sav = np.zeros_like(u)
        du = np.inf
        it = 0
        nmax = opts.niterex_max if nmax is None else nmax
        while du > opts.ex_tol and it < nmax:
            u = _sweep(u, rhs_l, dq[level], bcs)
            du = np.abs(u - u_sav).max()
            u_sav = u.copy()
            it += 1
        return u

    def two_grid_np(u, rhs_f, skip_coarse_smooth=False):
        for _ in range(opts.ms):
            u = _sweep(u, rhs_f, dq[0], bcs)
        r = _residual(u, rhs_f, dq[0], bcs)
        rhs_c = _apply_axis_mats(r, R)
        u_c = solve_exact_np(np.zeros_like(rhs_c), rhs_c, 1)
        if not skip_coarse_smooth:
            for _ in range(opts.ms):
                u_c = _sweep(u_c, rhs_c, dq[1], bcs)
        u = u + _apply_axis_mats(u_c, P)
        for _ in range(opts.ms):
            u = _sweep(u, rhs_f, dq[0], bcs)
        return u

    want = two_grid_np(u0.copy(), rhs)
    got = np.asarray(bvp.two_grid(u0, rhs, ex_tol=opts.ex_tol, niterex_max=opts.niterex_max))
    assert np.abs(got - want).max() < 1e-10

    # the test has teeth: a mis-sequenced variant is far outside the bound
    wrong = two_grid_np(u0.copy(), rhs, skip_coarse_smooth=True)
    assert np.abs(wrong - want).max() > 1e-6

    # one_grid == relax-to-ex_tol from the caller's u0 (zeroed saved state)
    want1 = solve_exact_np(u0.copy(), rhs, 0, nmax=10000)
    got1 = np.asarray(bvp.one_grid(u0, rhs, ex_tol=opts.ex_tol, niterex_max=10000))
    assert np.abs(got1 - want1).max() < 1e-10
