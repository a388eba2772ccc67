"""z-wavefront Pallas smoother (ops/pallas_wave.py): interpreter-mode
differential tests against the XLA masked sweep.  The wavefront kernel
is a measured-slower alternative to the color-compact kernel on the
current toolchain (per-plane DMA/op overhead dominates; PERF_NOTES.md
round 2), so it is NOT wired into the engine dispatch — it is kept as
a standalone, correctness-pinned formulation for toolchains where
per-plane overhead shrinks (its HBM traffic bound, (3R+1W)/nsweeps
arrays per sweep, beats the windowed kernels at nsweeps >= 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndsm_tpu.ops import pallas_wave as pw
from ndsm_tpu.ops import stencils
from ndsm_tpu.ops.pallas_fused import mask_code


@pytest.mark.parametrize(
    "shape,bcs,ns",
    [
        ((16, 16, 128), (("N", "N"), ("D", "D"), ("D", "D")), 2),
        ((12, 16, 128), (("D", "N"), ("N", "D"), ("D", "D")), 3),
        ((9, 16, 128), (("N", "D"), ("D", "N"), ("D", "N")), 4),
        ((3, 16, 128), (("D", "D"), ("N", "N"), ("D", "D")), 2),  # nz < depth
    ],
)
def test_wave_matches_xla(shape, bcs, ns):
    rng = np.random.default_rng(hash((shape, ns)) % 2**31)
    dq = np.array([0.9, 1.1, 1.3])
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    f = pw.wave_smooth_3d(bcs, dq, shape, ns, interpret=True)
    assert f is not None
    got = np.asarray(f(u, rhs))
    want = u
    for _ in range(ns):
        want = stencils.rb_sweep(want, rhs, dq, bcs)
    np.testing.assert_allclose(got, np.asarray(want), rtol=0, atol=ns * 1e-5)


def test_wave_tiled_rows():
    """Forced y-tiling: halo windows, gy > 1."""
    old = pw._VMEM_BUDGET
    pw._VMEM_BUDGET = 3 * pw._ring_depth(2) * (16 + 16) * 128 * 4
    try:
        shape = (16, 64, 128)
        bcs = (("D", "N"), ("N", "D"), ("D", "D"))
        ty, W_y = pw.pick_row_window(shape, 2)
        assert ty < 64
        rng = np.random.default_rng(3)
        u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        rhs = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        dq = np.ones(3)
        f = pw.wave_smooth_3d(bcs, dq, shape, 2, interpret=True)
        got = np.asarray(f(u, rhs))
        want = u
        for _ in range(2):
            want = stencils.rb_sweep(want, rhs, dq, bcs)
        np.testing.assert_allclose(got, np.asarray(want), rtol=0, atol=1e-5)
    finally:
        pw._VMEM_BUDGET = old


def test_wave_batched_lanes():
    """Per-lane BCs (the component-solve configuration)."""
    shape = (16, 16, 128)
    bcs_list = [
        tuple(("N", "N") if (2 - ax) == c else ("D", "D") for ax in range(3))
        for c in range(3)
    ]
    dq = np.ones(3)
    call = pw.wave_smooth_3d_batched(bcs_list, dq, shape, 3, interpret=True)
    assert call is not None
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.standard_normal((3,) + shape), jnp.float32)
    r = jnp.asarray(rng.standard_normal((3,) + shape), jnp.float32)
    C = jnp.stack([jnp.asarray(mask_code(shape, b)) for b in bcs_list])
    got = np.asarray(jax.jit(call)(u, r, C))
    for lane, bcs in enumerate(bcs_list):
        want = u[lane]
        for _ in range(3):
            want = stencils.rb_sweep(want, r[lane], dq, bcs)
        np.testing.assert_allclose(
            got[lane], np.asarray(want), rtol=0, atol=3e-5
        )


def test_wave_unsupported():
    dq = np.ones(3)
    assert pw.wave_smooth_3d((("N", "N"),) * 3, dq, (32, 32, 128), 1) is None
    assert not pw.wave_supported((32, 32, 220), (("D", "D"),) * 3, jnp.float32, 1)
