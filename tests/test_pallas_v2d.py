"""VMEM-resident 2D smoother kernel (ops/pallas_v2d.py) vs the masked
XLA sweep oracle (ops/stencils.rb_sweep), interpret mode on CPU.

The kernel replaces the reference's red_black_gauss_2D
(fortran/ndsm_optimized.f90:199-334) for the chi-face solves; sweeps
must agree to rounding (FMA contraction and the all-Neumann mean
reduction order differ between backends)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ndsm_tpu.ops import pallas_v2d as v2d
from ndsm_tpu.ops import stencils


def _case(shape, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    r = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    dq = np.array([0.7, 1.3])
    return u, r, dq


def _sweep_ref(u, r, dq, bcs, n):
    for _ in range(n):
        u = stencils.rb_sweep(u, r, jnp.asarray(dq), bcs)
    return u


@pytest.mark.parametrize(
    "bcs",
    [
        (("N", "N"), ("N", "N")),  # the chi-face configuration
        (("D", "D"), ("N", "N")),
        (("N", "D"), ("D", "N")),
        (("D", "D"), ("D", "D")),
    ],
)
@pytest.mark.parametrize("nsweeps", [1, 3, 5])
def test_smooth_matches_rb_sweep(bcs, nsweeps):
    shape = (24, 40)
    u, r, dq = _case(shape)
    f = v2d.v2d_smooth(bcs, dq, shape, nsweeps, interpret=True)
    assert f is not None
    got = np.asarray(f(u, r))
    want = np.asarray(_sweep_ref(u, r, dq, bcs, nsweeps))
    scale = max(np.abs(want).max(), 1.0)
    assert np.abs(got - want).max() < 5e-6 * scale * nsweeps


def test_all_neumann_zero_mean_invariant():
    """All-Neumann smoothing pins the additive null space: the kernel's
    output mean is zero to rounding after every call (reference quirk
    Q7 — the mean is subtracted after every sweep; for this linear
    iteration per-sweep and end-only subtraction agree to rounding,
    so the observable contract is the pinned mean itself)."""
    shape = (16, 24)
    bcs = (("N", "N"), ("N", "N"))
    u, r, dq = _case(shape, seed=3)
    f = v2d.v2d_smooth(bcs, dq, shape, 3, interpret=True)
    got = np.asarray(f(u, r))
    want = np.asarray(_sweep_ref(u, r, dq, bcs, 3))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 2e-5 * scale
    assert abs(got.mean()) < 1e-6 * scale


def test_residual_variant():
    shape = (16, 32)
    bcs = (("N", "N"), ("N", "N"))
    u, r, dq = _case(shape, seed=5)
    f = v2d.v2d_smooth_residual(bcs, dq, shape, 2, interpret=True)
    assert f is not None
    u1, res = f(u, r)
    want_u = _sweep_ref(u, r, dq, bcs, 2)
    want_res = stencils.poisson_residual(want_u, r, jnp.asarray(dq), bcs)
    scale = max(float(jnp.abs(want_res).max()), 1.0)
    assert np.abs(np.asarray(u1) - np.asarray(want_u)).max() < 1e-5
    assert np.abs(np.asarray(res) - np.asarray(want_res)).max() < 1e-5 * scale


def test_cor_variant():
    shape = (16, 32)
    bcs = (("D", "D"), ("N", "N"))
    u, r, dq = _case(shape, seed=7)
    cor = jnp.asarray(
        np.random.default_rng(8).standard_normal(shape), jnp.float32
    )
    f = v2d.v2d_smooth_cor(bcs, dq, shape, 2, interpret=True)
    assert f is not None
    got = np.asarray(f(u, cor, r))
    want = np.asarray(_sweep_ref(u + cor, r, dq, bcs, 2))
    assert np.abs(got - want).max() < 1e-5 * max(np.abs(want).max(), 1.0)


def test_vmap_batching():
    """The chi driver vmaps the engine over face lanes; the kernel must
    batch through pallas_call's vmap rule with per-lane results equal
    to the unbatched call."""
    import jax

    shape = (16, 24)
    bcs = (("N", "N"), ("N", "N"))
    dq = np.array([0.9, 1.1])
    rng = np.random.default_rng(11)
    U = jnp.asarray(rng.standard_normal((4,) + shape), jnp.float32)
    R = jnp.asarray(rng.standard_normal((4,) + shape), jnp.float32)
    f = v2d.v2d_smooth(bcs, dq, shape, 3, interpret=True)
    got = np.asarray(jax.vmap(f)(U, R))
    for b in range(4):
        want = np.asarray(f(U[b], R[b]))
        np.testing.assert_allclose(got[b], want, rtol=0, atol=1e-6)


def test_supported_gates():
    bcs = (("N", "N"), ("N", "N"))
    assert v2d.v2d_kernel_supported((512, 512), bcs, jnp.float32, 5)
    assert not v2d.v2d_kernel_supported((512, 500), bcs, jnp.float32, 5)
    assert not v2d.v2d_kernel_supported((513, 512), bcs, jnp.float32, 5)
    # too big for VMEM residency
    assert not v2d.v2d_kernel_supported((1024, 1024), bcs, jnp.float32, 5)
    assert not v2d.v2d_kernel_supported((512, 512), bcs, jnp.float64, 5)
