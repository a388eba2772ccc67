"""Fused Pallas smoother (ops/pallas_fused.py): interpreter-mode
differential tests against the XLA sweep, plus the engine wiring
(Options.use_pallas routes MGEngine.t_smooth through the kernel).  The
compiled path is probed at runtime on TPU (utils/compat.pallas_fused_usable)
and falls back to XLA when the toolchain rejects it."""

import jax.numpy as jnp
import numpy as np
import pytest

from ndsm_tpu import GridHierarchy, Options
from ndsm_tpu.mg.poisson import PoissonBVP
from ndsm_tpu.ops import stencils
from ndsm_tpu.ops.pallas_fused import fused_smooth_3d, mask_code, pick_tiles, supported


@pytest.mark.parametrize(
    "shape,bcs,nsweeps",
    [
        ((32, 32, 32), (("D", "D"), ("D", "D"), ("N", "N")), 1),
        ((24, 32, 20), (("N", "N"), ("D", "D"), ("D", "D")), 2),
        ((24, 24, 24), (("D", "D"), ("N", "N"), ("D", "D")), 3),
        ((40, 40, 17), (("D", "N"), ("N", "D"), ("D", "D")), 5),
    ],
)
def test_fused_smooth_matches_xla(shape, bcs, nsweeps):
    """nsweeps fused sweeps == nsweeps applications of stencils.rb_sweep
    (f32 rounding)."""
    rng = np.random.default_rng(hash(shape) % 2**31)
    dq = np.array([0.9, 1.1, 1.0])
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    f = fused_smooth_3d(bcs, dq, shape, nsweeps, interpret=True)
    assert f is not None
    got = np.asarray(f(u, rhs))
    want = u
    for _ in range(nsweeps):
        want = stencils.rb_sweep(want, rhs, dq, bcs)
    np.testing.assert_allclose(got, np.asarray(want), rtol=0, atol=2e-5)


def test_unsupported_cases_return_none():
    dq = np.array([1.0, 1.0, 1.0])
    # all-Neumann needs a per-sweep global mean -> XLA path
    assert fused_smooth_3d((("N", "N"),) * 3, dq, (32, 32, 32), 1) is None
    # f64 -> XLA path
    assert (
        fused_smooth_3d((("D", "D"),) * 3, dq, (32, 32, 32), 1, dtype=jnp.float64)
        is None
    )
    # too small to tile with the requested halo
    assert not supported((8, 8, 8), (("D", "D"),) * 3, jnp.float32, 5)


def test_pick_tiles_budget():
    """Tiles divide the extents, ty is sublane-aligned, and the window
    respects the VMEM budget."""
    t = pick_tiles((256, 256, 256), 2)  # H_z=4, H_y=8
    assert t is not None
    tz, ty = t
    assert 256 % tz == 0 and 256 % ty == 0 and ty % 8 == 0
    assert 3 * 2 * (tz + 8) * (ty + 16) * 256 * 4 < 12 * 1024 * 1024


def test_mask_code():
    """C encodes parity (0/1) with first_color_parity and Dirichlet faces
    (2) exactly like the XLA masks."""
    bcs = (("D", "D"), ("N", "N"), ("D", "N"))
    C = mask_code((6, 5, 7), bcs)
    assert C[0].max() == 2.0 and C[-1].min() == 2.0  # z faces frozen
    assert C[3, 2, 0] == 2.0  # x-lower Dirichlet
    red = stencils.first_color_parity(bcs)
    assert C[1, 1, 1] == (1.0 if (3 % 2) == red else 0.0)
    assert set(np.unique(C)) <= {0.0, 1.0, 2.0}


def test_engine_wiring_interpret(monkeypatch):
    """Options.use_pallas routes MGEngine.t_smooth through the fused
    kernel (NDSM_TPU_PALLAS=interpret exercises the wiring on CPU) and the
    full solve matches the XLA-only solve."""
    n = 24  # ny must have a multiple-of-8 tile divisor (sublane alignment)
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
        # ms=2 so the fused halo (2*ms) fits the 20^3 test grid
        bvp = PoissonBVP(
            h, bcs, Options(precision="fp32", vc_tol=1e-5, ncycles_max=12, ms=2)
        )
        u, info = bvp.solve(np.zeros_like(rhs), rhs)
        return bvp, np.asarray(u), info

    bvp_p, u_p, info_p = solve(True)
    assert bvp_p._inner.use_pallas == "interpret"
    assert bvp_p._inner._pallas_smooth_fn(0, bvp_p.options.ms) is not None
    bvp_x, u_x, info_x = solve(False)
    assert bvp_x._inner._pallas_smooth_fn(0, bvp_x.options.ms) is None
    assert info_p.ierr == 0 and info_x.ierr == 0
    # same algorithm up to f32 rounding: same limit to solver tolerance
    assert np.abs(u_p - u_x).max() < 5e-5
