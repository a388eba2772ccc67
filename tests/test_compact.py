"""Color-compact smoother: differential tests against the masked sweep
(rounding-identical across BC variants, odd/even extents, 2D/3D/4D)."""

import numpy as np
import jax.numpy as jnp
import pytest
from ndsm_tpu.ops import stencils
from ndsm_tpu.ops.stencils_compact import split_colors, merge_colors, rb_sweep_compact
rng = np.random.default_rng(0)
cases = [
    ((8, 8, 8), (("N","N"),)*3),
    ((7, 6, 9), (("N","N"),)*3),
    ((6, 7, 8), (("D","D"),("D","D"),("N","N"))),
    ((6, 7, 9), (("N","N"),("D","D"),("D","D"))),  # odd nx, flipped color
    ((9, 7), (("N","N"),("N","N"))),
    ((10, 12), (("D","N"),("N","D"))),
    ((5, 4, 3, 7), (("N","N"),)*4),
]
@pytest.mark.parametrize("shape,bcs", cases)
def test_compact_sweep_matches_masked(shape, bcs):
    rng = np.random.default_rng(hash((shape, bcs)) % 2**31)
    u = rng.standard_normal(shape)
    rhs = rng.standard_normal(shape)
    dq = 0.5 + rng.random(len(shape))
    want = np.asarray(stencils.rb_sweep(u, rhs, dq, bcs))
    R, B = split_colors(jnp.asarray(u))
    rR, rB = split_colors(jnp.asarray(rhs))
    rt = np.asarray(merge_colors(R, B, shape[-1]))
    np.testing.assert_array_equal(rt, u)
    R2, B2 = rb_sweep_compact(R, B, rR, rB, dq, bcs, shape[-1])
    got = np.asarray(merge_colors(R2, B2, shape[-1]))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_iterated_compact_sweeps():
    """Several sweeps carried entirely in compact form."""
    shape = (12, 14, 11)
    bcs = (("D", "D"), ("N", "N"), ("D", "N"))
    rng = np.random.default_rng(9)
    u = rng.standard_normal(shape)
    rhs = rng.standard_normal(shape)
    dq = np.array([1.0, 0.8, 1.2])
    want = u
    for _ in range(4):
        want = stencils.rb_sweep(want, rhs, dq, bcs)
    R, B = split_colors(jnp.asarray(u))
    rR, rB = split_colors(jnp.asarray(rhs))
    for _ in range(4):
        R, B = rb_sweep_compact(R, B, rR, rB, dq, bcs, shape[-1])
    got = np.asarray(merge_colors(R, B, shape[-1]))
    np.testing.assert_allclose(got, np.asarray(want), rtol=0, atol=1e-11)
