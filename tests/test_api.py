"""API-surface tests: reference-compatible signature, shapes, and options."""

import numpy as np
import pytest

import ndsm_tpu
from ndsm_tpu import vector_potential, Options
from ndsm_tpu.utils.testing import potential_field_case, build_test_mesh


def test_signature_defaults_match_reference():
    """Defaults must match ndsm.py:66."""
    import inspect

    sig = inspect.signature(vector_potential)
    d = {k: v.default for k, v in sig.parameters.items()}
    assert d["niterex_max"] == 10000
    assert d["ncycles_max"] == 1024
    assert d["ex_tol"] == 1e-13
    assert d["vc_tol"] == 1e-10
    assert d["ms"] == 5
    assert d["mean"] is False
    assert d["debug"] is False


def test_shapes_and_types():
    n = 12
    x, y, z = build_test_mesh(n)
    Z, Y, X = np.meshgrid(z, y, x, indexing="ij")
    _, b1 = potential_field_case(X, Y, Z)
    ierr, A, B = vector_potential(x, y, z, b1, precision="fp64")
    assert isinstance(ierr, int)
    assert A.shape == (3, n, n, n) and A.dtype == np.float64
    assert B.shape == (3, n, n, n) and B.dtype == np.float64


def test_full_output_info():
    n = 12
    x, y, z = build_test_mesh(n)
    Z, Y, X = np.meshgrid(z, y, x, indexing="ij")
    _, b1 = potential_field_case(X, Y, Z)
    ierr, A, B, info = vector_potential(
        x, y, z, b1, precision="fp64", full_output=True
    )
    assert len(info.chi) == 6
    assert len(info.components) == 3
    assert all(s.ierr == 0 for s in info.chi + info.components)
    assert info.wall_time > 0


def test_interior_of_b_ignored():
    """Only boundary-face normal components are read (quirk Q12)."""
    n = 12
    x, y, z = build_test_mesh(n)
    Z, Y, X = np.meshgrid(z, y, x, indexing="ij")
    _, b1 = potential_field_case(X, Y, Z)
    b_noise = b1.copy()
    b_noise[:, 1:-1, 1:-1, 1:-1] += np.random.default_rng(0).standard_normal(
        (3, n - 2, n - 2, n - 2)
    )
    # also scramble tangential components on faces (only normals are used)
    _, A1, B1 = vector_potential(x, y, z, b1.copy(), precision="fp64")
    _, A2, B2 = vector_potential(x, y, z, b_noise, precision="fp64")
    np.testing.assert_allclose(A1, A2, atol=1e-12)
    np.testing.assert_allclose(B1, B2, atol=1e-12)


def test_bad_mesh_raises():
    with pytest.raises(ValueError):
        vector_potential(
            np.array([0.0]), np.linspace(0, 1, 8), np.linspace(0, 1, 8),
            np.zeros((3, 8, 8, 1)),
        )


def test_rectangular_box():
    """Non-cubic shapes go through the full pipeline."""
    nx, ny, nz = 14, 12, 10
    x = np.linspace(0, 1, nx)
    dx = x[1] - x[0]
    y = np.arange(ny) * dx
    z = np.arange(nz) * dx
    Z, Y, X = np.meshgrid(z, y, x, indexing="ij")
    A1, b1 = potential_field_case(X, Y, Z)
    ierr, A2, B2 = vector_potential(x, y, z, b1.copy(), precision="fp64")
    assert ierr == 0
    assert np.abs(B2 - b1).max() < 0.5  # coarse mesh, loose truncation bound


def test_module_exports():
    for name in (
        "vector_potential",
        "solve_poisson_bvp",
        "PoissonBVP",
        "GridHierarchy",
        "Options",
    ):
        assert hasattr(ndsm_tpu, name)
