"""2D kernel path through the full driver: the chi-face configuration
(all-Neumann mixed-precision 2D solves, single and batched/vmapped)
must agree with the XLA path to solver tolerance with cycle parity.
(Reference: the six chi solves of ndsm_vector_potential.f90:338-365
running on red_black_gauss_2D, fortran/ndsm_optimized.f90:199-334.)"""

import numpy as np
import pytest

from ndsm_tpu import GridHierarchy, Options
from ndsm_tpu.mg.poisson import PoissonBVP, _ENGINE_CACHE


@pytest.fixture
def kernel_env(monkeypatch):
    monkeypatch.setenv("NDSM_TPU_PALLAS_2D", "1")
    monkeypatch.setenv("NDSM_TPU_PALLAS2D_MIN_POINTS", "0")
    yield
    _ENGINE_CACHE.clear()


def _solve(h, bcs, u0, rhs, mode, monkeypatch):
    monkeypatch.setenv("NDSM_TPU_PALLAS", mode)
    _ENGINE_CACHE.clear()
    bvp = PoissonBVP(h, bcs, Options(precision="mixed"))
    return bvp.solve(u0, rhs)


def test_chi_style_solve_kernel_vs_xla(kernel_env, monkeypatch):
    n1, n2 = 40, 48
    y = np.linspace(0, 1, n1)
    x = np.linspace(0, 1.2, n2)
    h = GridHierarchy.from_mesh((y, x))
    bcs = (("N", "N"), ("N", "N"))
    rng = np.random.default_rng(0)
    rhs = rng.standard_normal((n1, n2))
    rhs -= rhs.mean()
    u0 = np.zeros((n1, n2))
    uk, ik = _solve(h, bcs, u0, rhs, "interpret", monkeypatch)
    ux, ix = _solve(h, bcs, u0, rhs, "off", monkeypatch)
    assert ik.ierr == ix.ierr == 0
    assert ik.cycles == ix.cycles
    scale = max(np.abs(np.asarray(ux)).max(), 1.0)
    assert np.abs(np.asarray(uk) - np.asarray(ux)).max() < 1e-9 * scale


def test_chi_style_batched_kernel_vs_xla(kernel_env, monkeypatch):
    """The batched chi program vmaps the engine — the kernel must batch
    through pallas_call's vmap rule with per-lane parity."""
    n1, n2 = 40, 48
    y = np.linspace(0, 1, n1)
    x = np.linspace(0, 1.2, n2)
    h = GridHierarchy.from_mesh((y, x))
    bcs = (("N", "N"), ("N", "N"))
    rng = np.random.default_rng(1)
    rhss = []
    for _ in range(4):
        r = rng.standard_normal((n1, n2))
        rhss.append(r - r.mean())
    u0s = [np.zeros((n1, n2))] * 4

    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    _ENGINE_CACHE.clear()
    us_k, infos_k = PoissonBVP(
        h, bcs, Options(precision="mixed")
    ).solve_batch(u0s, rhss)
    monkeypatch.setenv("NDSM_TPU_PALLAS", "off")
    _ENGINE_CACHE.clear()
    us_x, infos_x = PoissonBVP(
        h, bcs, Options(precision="mixed")
    ).solve_batch(u0s, rhss)
    for k in range(4):
        # kernel sweeps differ from XLA at rounding, so a du landing
        # within rounding of vc_tol can shift the stopping cycle by one
        assert abs(infos_k[k].cycles - infos_x[k].cycles) <= 1
        assert infos_k[k].ierr == infos_x[k].ierr == 0
        d = np.abs(np.asarray(us_k[k]) - np.asarray(us_x[k])).max()
        assert d < 1e-8


def test_mixed_bc_2d_solve(kernel_env, monkeypatch):
    """Non-all-Neumann 2D (Dirichlet mix) also routes to the kernel."""
    n1, n2 = 32, 40
    y = np.linspace(0, 1, n1)
    x = np.linspace(0, 1, n2)
    h = GridHierarchy.from_mesh((y, x))
    bcs = (("D", "N"), ("N", "D"))
    rng = np.random.default_rng(2)
    rhs = rng.standard_normal((n1, n2))
    u0 = np.zeros((n1, n2))
    uk, ik = _solve(h, bcs, u0, rhs, "interpret", monkeypatch)
    ux, ix = _solve(h, bcs, u0, rhs, "off", monkeypatch)
    assert ik.cycles == ix.cycles
    scale = max(np.abs(np.asarray(ux)).max(), 1.0)
    assert np.abs(np.asarray(uk) - np.asarray(ux)).max() < 1e-9 * scale
