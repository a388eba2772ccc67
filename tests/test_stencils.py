"""Differential tests of the vectorized stencil kernels against the
loop-level oracles, plus fixed-point properties."""

import numpy as np
import pytest

from ndsm_tpu.ops import stencils
import oracle

RNG = np.random.default_rng(2112)


def _random_problem(shape, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal(shape)
    rhs = rng.standard_normal(shape)
    dq = 0.5 + rng.random(len(shape))
    return u, rhs, dq


BCS_3D = [
    (("N", "N"), ("N", "N"), ("N", "N")),
    (("D", "D"), ("D", "D"), ("N", "N")),  # Ax-style (x Neumann)
    (("D", "D"), ("N", "N"), ("D", "D")),  # Ay-style
    (("N", "N"), ("D", "D"), ("D", "D")),  # Az-style (flipped first color)
    (("N", "D"), ("D", "N"), ("D", "N")),
]


@pytest.mark.parametrize("bcs", BCS_3D)
def test_rb_sweep_3d_matches_oracle(bcs):
    u, rhs, dq = _random_problem((6, 7, 8), seed=hash(bcs) % 2**31)
    got = np.asarray(stencils.rb_sweep(u, rhs, dq, bcs))
    want = oracle.rb_gauss_3d(u, rhs, dq, bcs)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-13)


@pytest.mark.parametrize(
    "shape,bcs",
    [
        ((9, 7), (("N", "N"), ("N", "N"))),
        ((9, 7), (("D", "N"), ("N", "D"))),
        ((5, 4, 3, 6), (("N", "N"),) * 4),
        ((5, 4, 3, 6), (("D", "D"), ("N", "N"), ("D", "N"), ("N", "N"))),
    ],
)
def test_rb_sweep_nd_matches_oracle(shape, bcs):
    u, rhs, dq = _random_problem(shape, seed=len(shape))
    got = np.asarray(stencils.rb_sweep(u, rhs, dq, bcs))
    want = oracle.relax_nd(u, rhs, dq, bcs)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-13)


@pytest.mark.parametrize("bcs", BCS_3D)
def test_residual_3d_matches_oracle(bcs):
    u, rhs, dq = _random_problem((6, 7, 8), seed=1)
    got = np.asarray(stencils.poisson_residual(u, rhs, dq, bcs))
    want = oracle.residual_nd(u, rhs, dq, bcs)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-13)


def test_residual_2d_matches_oracle():
    u, rhs, dq = _random_problem((9, 7), seed=5)
    bcs = (("N", "N"), ("D", "N"))
    got = np.asarray(stencils.poisson_residual(u, rhs, dq, bcs))
    want = oracle.residual_nd(u, rhs, dq, bcs)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-13)


def test_exact_solution_is_fixed_point():
    """A discrete solution (zero residual) must be unchanged by one sweep."""
    bcs = (("D", "D"), ("D", "D"), ("N", "N"))
    shape = (8, 8, 8)
    rng = np.random.default_rng(7)
    u = rng.standard_normal(shape)
    dq = np.array([0.7, 1.1, 0.9])
    # Manufacture rhs = L[u] so u is the exact discrete solution, then
    # verify the sweep's fixed point.
    r0 = np.asarray(stencils.poisson_residual(u, np.zeros(shape), dq, bcs))
    rhs = -r0  # rhs - L[u] = 0  =>  rhs = L[u] (interior); 0 at D faces
    u2 = np.asarray(stencils.rb_sweep(u, rhs, dq, bcs))
    np.testing.assert_allclose(u2, u, rtol=0, atol=1e-12)


def test_dirichlet_faces_frozen():
    bcs = (("D", "D"), ("D", "N"), ("N", "N"))
    u, rhs, dq = _random_problem((6, 6, 6), seed=11)
    u2 = np.asarray(stencils.rb_sweep(u, rhs, dq, bcs))
    np.testing.assert_array_equal(u2[0], u[0])
    np.testing.assert_array_equal(u2[-1], u[-1])
    np.testing.assert_array_equal(u2[:, 0], u[:, 0])
    assert not np.array_equal(u2[:, -1], u[:, -1])  # Neumann face updates


def test_all_neumann_zero_mean():
    u, rhs, dq = _random_problem((8, 8), seed=3)
    bcs = (("N", "N"), ("N", "N"))
    u2 = np.asarray(stencils.rb_sweep(u, rhs, dq, bcs))
    assert abs(u2.mean()) < 1e-13


def test_first_color_parity_rule():
    # 3D: x (last axis) lower face decides (ndsm_optimized.f90:106)
    assert stencils.first_color_parity((("D", "D"), ("D", "D"), ("N", "N"))) == 0
    assert stencils.first_color_parity((("N", "N"), ("N", "N"), ("D", "D"))) == 1
    # 2D/others: parity 0
    assert stencils.first_color_parity((("D", "D"), ("D", "D"))) == 0
