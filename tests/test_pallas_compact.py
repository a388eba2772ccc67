"""Color-compact Pallas smoother (ops/pallas_compact.py):
interpreter-mode differential tests against the XLA compact sweep
(itself pinned rounding-identical to the masked rb_sweep) and the masked
path.  On TPU the compiled kernel is probed at runtime and verified
bitwise by the same comparisons (scripts in PERF_NOTES.md round 2); on
CPU interpret-mode matches the XLA compact path BITWISE because the
expressions are identical."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndsm_tpu.ops import pallas_compact as pc
from ndsm_tpu.ops import stencils, stencils_compact as sc


def _run(shape, bcs, ns, budget=None):
    rng = np.random.default_rng(hash((shape, ns)) % 2**31)
    dq = np.array([0.9, 1.1, 1.3])
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    r = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    old = pc._VMEM_BUDGET
    if budget:
        pc._VMEM_BUDGET = budget
    try:
        call = pc.compact_smooth_3d(bcs, dq, shape, ns, interpret=True)
        assert call is not None
        R, B = sc.split_colors(u)
        rR, rB = sc.split_colors(r)
        Rk, Bk = jax.jit(call)(R, B, rR, rB)
        Rx, Bx = R, B
        for _ in range(ns):
            Rx, Bx = sc.rb_sweep_compact(Rx, Bx, rR, rB, dq, bcs, shape[-1])
        np.testing.assert_array_equal(np.asarray(Rk), np.asarray(Rx))
        np.testing.assert_array_equal(np.asarray(Bk), np.asarray(Bx))
        # and against the masked formulation (rounding-level)
        um = sc.merge_colors(Rk, Bk, shape[-1])
        ref = u
        for _ in range(ns):
            ref = stencils.rb_sweep(ref, r, dq, bcs)
        np.testing.assert_allclose(
            np.asarray(um), np.asarray(ref), rtol=0, atol=ns * 1e-5
        )
    finally:
        pc._VMEM_BUDGET = old


@pytest.mark.parametrize(
    "shape,bcs,ns",
    [
        ((16, 16, 256), (("D", "D"), ("D", "D"), ("D", "D")), 1),
        ((12, 16, 256), (("D", "N"), ("N", "D"), ("D", "D")), 3),
        ((16, 24, 256), (("D", "D"), ("N", "N"), ("N", "D")), 5),
        ((16, 16, 256), (("D", "D"), ("D", "D"), ("D", "N")), 2),  # flips first color
    ],
)
def test_compact_kernel_matches_xla_compact(shape, bcs, ns):
    _run(shape, bcs, ns)


@pytest.mark.parametrize(
    "shape,bcs,ns",
    [
        ((32, 32, 256), (("D", "D"), ("N", "N"), ("D", "D")), 2),
        ((48, 32, 256), (("D", "D"), ("D", "D"), ("N", "N")), 3),
        ((32, 48, 256), (("N", "N"), ("D", "D"), ("D", "D")), 2),
    ],
)
def test_compact_kernel_tiled_windows(shape, bcs, ns):
    """Small VMEM budget -> real tiling: clamped windows, halos, the
    double-buffered pipeline and out-DMA drains are all exercised."""
    _run(shape, bcs, ns, budget=4 * 2 * 20 * 24 * 128 * 4 + 1)


def test_unsupported_cases():
    dq = np.ones(3)
    f32 = jnp.float32
    assert pc.compact_smooth_3d((("N", "N"),) * 3, dq, (32, 32, 256), 1) is None
    assert not pc.compact_kernel_supported((32, 32, 256), (("D", "D"),) * 3, jnp.float64, 1)
    assert not pc.compact_kernel_supported((32, 32, 220), (("D", "D"),) * 3, f32, 1)
    assert not pc.compact_kernel_supported((31, 32, 256), (("D", "D"),) * 3, f32, 1)


def test_pick_tiles_compact_properties():
    t = pc.pick_tiles_compact((256, 256, 256), 2)
    assert t is not None
    tz, ty, wz, wy = t
    assert 256 % tz == 0 and 256 % ty == 0
    assert tz % 2 == 0 and ty % 8 == 0
    assert 4 * 2 * wz * wy * 128 * 4 <= pc._VMEM_BUDGET


def test_engine_wiring_compact_interpret(monkeypatch):
    """With use_pallas active the engine routes through the Pallas
    smoother stack (z-compact preferred; x-compact builds as fallback)
    and the full solve matches the XLA-only solve to solver tolerance
    (zc sweeps equal the masked sweep to 1 ulp)."""
    from ndsm_tpu import GridHierarchy, Options
    from ndsm_tpu.mg.poisson import PoissonBVP

    n = 24
    x = np.linspace(0, 1, n)
    Z, Y, X = np.meshgrid(x, x, x, indexing="ij")
    U = np.sin(np.pi * X) * np.sin(np.pi * Y) * np.cos(np.pi * Z)
    rhs = -3 * np.pi**2 * U
    bcs = (("N", "N"), ("D", "D"), ("D", "D"))
    h = GridHierarchy.from_mesh((x, x, x), ngrids=2)

    def solve(pallas_env):
        if pallas_env:
            monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
            monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
        else:
            monkeypatch.delenv("NDSM_TPU_PALLAS", raising=False)
            monkeypatch.delenv("NDSM_TPU_PALLAS_MIN_POINTS", raising=False)
        bvp = PoissonBVP(
            h, bcs, Options(precision="fp32", vc_tol=1e-5, ncycles_max=12, ms=3)
        )
        u, info = bvp.solve(np.zeros_like(rhs), rhs)
        return bvp, np.asarray(u), info

    bvp_p, u_p, info_p = solve(True)
    assert bvp_p._inner._pallas_zc_fn(0, 2) is not None
    assert bvp_p._inner._pallas_compact_fn(0, 2) is not None
    bvp_x, u_x, info_x = solve(False)
    assert bvp_x._inner._pallas_zc_fn(0, 2) is None
    assert info_p.ierr == 0 and info_x.ierr == 0
    assert info_p.cycles == info_x.cycles
    np.testing.assert_allclose(u_p, u_x, rtol=0, atol=5e-5)


def test_batched_compact_matches_sequential(monkeypatch):
    """MultiBCSolver with the per-lane compact kernels (interpret mode)
    reproduces standalone pallas solves' iterates (lane freezing keeps
    per-lane sequences identical to sequential solves)."""
    from ndsm_tpu import GridHierarchy, Options
    from ndsm_tpu.mg.batched import MultiBCSolver
    from ndsm_tpu.mg.poisson import PoissonBVP

    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    COMPONENT_BCS = [
        tuple(("N", "N") if (2 - ax) == c else ("D", "D") for ax in range(3))
        for c in range(3)
    ]
    n = 16
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x))
    rng = np.random.default_rng(3)
    u0s = []
    for c in range(3):
        u0 = np.zeros((n, n, n))
        if c != 2:
            u0[0], u0[-1] = rng.standard_normal((n, n)), rng.standard_normal((n, n))
        if c != 1:
            u0[:, 0] = rng.standard_normal((n, n))
        if c != 0:
            u0[:, :, 0] = rng.standard_normal((n, n))
        u0s.append(u0)
    opts = Options(precision="mixed", ms=3)
    mbs = MultiBCSolver(h, COMPONENT_BCS, opts)
    assert mbs._compact_fns(0, 2) is not None
    u_b, infos_b = mbs.solve(np.stack(u0s), names=["Ax", "Ay", "Az"])
    for c in range(3):
        bvp = PoissonBVP(h, COMPONENT_BCS[c], opts)
        u_s, info_s = bvp.solve(u0s[c], None, zero_rhs=True)
        assert infos_b[c].cycles == info_s.cycles
        d = np.abs(np.asarray(u_b[c]) - np.asarray(u_s)).max()
        assert d <= 5e-9, (c, d)
