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
