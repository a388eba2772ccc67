"""Native C++/OpenMP core: differential tests against both the Python
loop oracle and the JAX kernels."""

import numpy as np
import pytest

from ndsm_tpu.ops import stencils

native = pytest.importorskip("ndsm_tpu.native")
if not native.available():
    pytest.skip("native core failed to build", allow_module_level=True)

import oracle


@pytest.mark.parametrize(
    "bcs",
    [
        (("N", "N"), ("N", "N"), ("N", "N")),
        (("D", "D"), ("D", "N"), ("N", "D")),
        (("N", "N"), ("D", "D"), ("D", "D")),
    ],
)
def test_native_sweep_3d(bcs):
    rng = np.random.default_rng(1)
    u = rng.standard_normal((7, 6, 9))
    rhs = rng.standard_normal((7, 6, 9))
    dq = 0.5 + rng.random(3)
    got = native.rb_sweep_3d(u, rhs, dq, bcs)
    want = oracle.rb_gauss_3d(u, rhs, dq, bcs)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-13)
    jx = np.asarray(stencils.rb_sweep(u, rhs, dq, bcs))
    np.testing.assert_allclose(got, jx, rtol=0, atol=2e-13)


def test_native_residual_3d():
    rng = np.random.default_rng(2)
    bcs = (("D", "D"), ("N", "N"), ("N", "D"))
    u = rng.standard_normal((8, 8, 8))
    rhs = rng.standard_normal((8, 8, 8))
    dq = np.array([1.0, 0.7, 1.3])
    got = native.residual_3d(u, rhs, dq, bcs)
    want = np.asarray(stencils.poisson_residual(u, rhs, dq, bcs))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-13)


def test_native_sweep_nd():
    rng = np.random.default_rng(3)
    u = rng.standard_normal((5, 4, 3, 6))
    rhs = rng.standard_normal((5, 4, 3, 6))
    dq = 0.5 + rng.random(4)
    bcs = (("N", "N"),) * 4
    got = native.rb_sweep_nd(u, rhs, dq, bcs)
    want = np.asarray(stencils.rb_sweep(u, rhs, dq, bcs))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-13)


def test_native_full_solve_matches_jax():
    """The native CPU solver (C++/OpenMP kernels, numpy driver) and the
    fp64 JAX engine produce the same solution and cycle count."""
    from ndsm_tpu import Options, solve_poisson_bvp
    from ndsm_tpu.native.solver import solve_poisson_bvp_native

    n = 33
    x = np.linspace(0, 1, n)
    Z, Y, X = np.meshgrid(x, x, x, indexing="ij")
    U = np.sin(np.pi * X) * np.sin(np.pi * Y) * np.sin(np.pi * Z)
    rhs = -3 * np.pi**2 * U
    bcs = (("D", "D"), ("D", "D"), ("D", "D"))
    opts = Options(precision="fp64", smoother="masked", coarse_solver="relax")
    u_jax, info_jax = solve_poisson_bvp(
        np.zeros_like(U), rhs, (x, x, x), bcs, options=opts
    )
    u_nat, info_nat = solve_poisson_bvp_native(
        np.zeros_like(U), rhs, (x, x, x), bcs, options=opts
    )
    assert info_nat.ierr == 0
    assert info_nat.cycles == info_jax.cycles
    np.testing.assert_allclose(u_nat, np.asarray(u_jax), rtol=0, atol=1e-11)


def test_native_full_solve_2d_neumann():
    from ndsm_tpu import Options
    from ndsm_tpu.native.solver import solve_poisson_bvp_native

    n = 32
    x = np.linspace(0, 1, n)
    X, Y = np.meshgrid(x, x, indexing="xy")
    U = np.cos(np.pi * X) * np.cos(np.pi * Y)
    rhs = -2 * np.pi**2 * U
    u, info = solve_poisson_bvp_native(
        np.zeros_like(U), rhs, (x, x), (("N", "N"), ("N", "N")),
        options=Options(precision="fp64"),
    )
    assert info.ierr == 0
    u = u - u.mean()
    assert np.abs(u - (U - U.mean())).max() < 5e-3


@pytest.mark.slow
def test_native_vector_potential_golden():
    """The no-JAX pipeline reproduces the golden 22^3 errors exactly."""
    from ndsm_tpu.native.potential import vector_potential_native
    from ndsm_tpu.utils.testing import potential_field_case, build_test_mesh

    n = 22
    x, y, z = build_test_mesh(n)
    Z, Y, X = np.meshgrid(z, y, x, indexing="ij")
    A1, b1 = potential_field_case(X, Y, Z)
    ierr, A2, b2, info = vector_potential_native(x, y, z, b1.copy())
    assert ierr == 0
    Ea = np.linalg.norm(A1 - A2, axis=0)
    Eb = np.linalg.norm(b1 - b2, axis=0)
    np.testing.assert_allclose(Ea.max(), 1.86048e-03, rtol=1e-4)
    np.testing.assert_allclose(Eb.max(), 7.65805e-02, rtol=1e-4)
