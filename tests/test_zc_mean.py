"""All-Neumann 3D kernel coverage (ops/pallas_zc.zc_smooth_mean_3d +
MGEngine._t_smooth_zc_mean): single-sweep passes with the per-sweep
global mean subtracted in-kernel on the next pass's load (reference:
red_black_gauss_3D's all-Neumann branch, fortran/ndsm_optimized.f90:
173-189 — previously these solves always fell back to the XLA path)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ndsm_tpu.ops import pallas_zc, stencils

BCS_ALL_N = (("N", "N"), ("N", "N"), ("N", "N"))


@pytest.mark.parametrize("shape", [(16, 24, 128), (32, 16, 256)])
@pytest.mark.parametrize("nsweeps", [1, 3, 5])
def test_mean_pass_matches_rb_sweep(shape, nsweeps):
    dq = np.array([0.9, 1.1, 0.8])
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    r = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    f = pallas_zc.zc_smooth_mean_3d(BCS_ALL_N, dq, shape, interpret=True)
    assert f is not None
    N = float(np.prod(shape))
    sub = jnp.zeros((8, 128), jnp.float32)
    v = u
    m = jnp.float32(0.0)
    for _ in range(nsweeps):
        v, sums = f(v, r, sub)
        m = (jnp.sum(sums) / jnp.float32(N)).astype(jnp.float32)
        sub = jnp.zeros((8, 128), jnp.float32) + m
    v = v - m
    w = u
    for _ in range(nsweeps):
        w = stencils.rb_sweep(w, r, jnp.asarray(dq), BCS_ALL_N)
    scale = float(jnp.abs(w).max())
    assert np.abs(np.asarray(v) - np.asarray(w)).max() < 5e-6 * scale
    assert abs(float(jnp.mean(v))) < 1e-6 * scale


def test_mean_supported_gates():
    f32 = jnp.float32
    assert pallas_zc.zc_mean_supported((32, 32, 128), BCS_ALL_N, f32, 1)
    assert not pallas_zc.zc_mean_supported((32, 32, 128), BCS_ALL_N, f32, 2)
    assert not pallas_zc.zc_mean_supported(
        (32, 32, 128), (("D", "D"), ("N", "N"), ("N", "N")), f32, 1
    )
    assert not pallas_zc.zc_mean_supported((31, 32, 128), BCS_ALL_N, f32, 1)
    assert not pallas_zc.zc_mean_supported((32, 32, 120), BCS_ALL_N, f32, 1)


def test_all_neumann_solve_kernel_vs_xla(monkeypatch):
    """Full mixed solve through the engine: kernel path vs XLA path,
    cycle parity and solver-tolerance agreement."""
    import os

    from ndsm_tpu import GridHierarchy, Options
    from ndsm_tpu.mg.poisson import PoissonBVP, _ENGINE_CACHE

    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    nz, ny, nx = 24, 16, 32
    z = np.linspace(0, 1, nz)
    y = np.linspace(0, 1.1, ny)
    x = np.linspace(0, 0.9, nx)
    h = GridHierarchy.from_mesh((z, y, x))
    rng = np.random.default_rng(0)
    rhs = rng.standard_normal((nz, ny, nx))
    rhs -= rhs.mean()
    res = {}
    for up in ("interpret", "off"):
        monkeypatch.setenv("NDSM_TPU_PALLAS", up)
        _ENGINE_CACHE.clear()
        bvp = PoissonBVP(h, BCS_ALL_N, Options(precision="mixed"))
        u, info = bvp.solve(np.zeros((nz, ny, nx)), rhs)
        assert info.ierr == 0
        res[up] = (np.asarray(u), info)
    _ENGINE_CACHE.clear()
    d = np.abs(res["interpret"][0] - res["off"][0]).max()
    assert abs(res["interpret"][1].cycles - res["off"][1].cycles) <= 1
    assert d < 1e-9
