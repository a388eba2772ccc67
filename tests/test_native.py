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
