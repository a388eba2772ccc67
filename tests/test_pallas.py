"""Pallas fused-sweep kernel: interpreter-mode differential tests against
the XLA masked-update sweep (the compiled path is exercised on real TPU by
bench/integration runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ndsm_tpu.ops import stencils
from ndsm_tpu.ops.pallas3d import fused_rb_sweep_3d, pick_tile, supported


@pytest.mark.parametrize(
    "shape,bcs",
    [
        ((32, 32, 32), (("D", "D"), ("D", "D"), ("N", "N"))),
        ((24, 36, 20), (("N", "N"), ("D", "D"), ("D", "D"))),
        ((24, 24, 24), (("D", "D"), ("N", "N"), ("D", "D"))),
        ((16, 16, 16), (("D", "N"), ("N", "D"), ("D", "D"))),
    ],
)
def test_fused_sweep_matches_xla(shape, bcs):
    rng = np.random.default_rng(hash(shape) % 2**31)
    dq = np.array([0.9, 1.1, 1.0])
    u = rng.standard_normal(shape).astype(np.float32)
    rhs = rng.standard_normal(shape).astype(np.float32)
    f = fused_rb_sweep_3d(bcs, dq, shape, interpret=True)
    assert f is not None
    got = np.asarray(f(jnp.asarray(u), jnp.asarray(rhs)))
    want = np.asarray(stencils.rb_sweep(jnp.asarray(u), jnp.asarray(rhs), dq, bcs))
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)


def test_unsupported_cases_return_none():
    dq = np.array([1.0, 1.0, 1.0])
    # all-Neumann needs a global mean -> XLA path
    assert fused_rb_sweep_3d((("N", "N"),) * 3, dq, (32, 32, 32)) is None
    # f64 -> XLA path
    assert (
        fused_rb_sweep_3d(
            (("D", "D"),) * 3, dq, (32, 32, 32), dtype=jnp.float64
        )
        is None
    )
    # too small to tile
    assert not supported((7, 7, 7), (("D", "D"),) * 3, jnp.float32)


def test_pick_tile():
    assert pick_tile(32) == 16
    assert pick_tile(220) == 22
    assert pick_tile(13) is None  # prime, cannot satisfy n >= t + 4
