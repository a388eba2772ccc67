"""z-compact Pallas smoother (ops/pallas_zc.py): interpreter-mode
differential tests against the masked XLA sweep.  Equality is to 1 ulp
(FMA-contraction differences between XLA programs), which the engine's
solver tolerances absorb; the TPU compiled path is verified by the same
comparison in the round-2 measurement scripts (PERF_NOTES.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndsm_tpu.ops import pallas_zc as zc
from ndsm_tpu.ops import stencils


def _run(shape, bcs, ns, budget=None):
    rng = np.random.default_rng(hash((shape, ns)) % 2**31)
    dq = np.array([0.9, 1.1, 1.3])
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    r = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    old = zc._VMEM_BUDGET
    if budget:
        zc._VMEM_BUDGET = budget
    try:
        f = zc.zc_smooth_3d(bcs, dq, shape, ns, interpret=True)
        assert f is not None
        got = np.asarray(jax.jit(f)(u, r))
        want = u
        for _ in range(ns):
            want = stencils.rb_sweep(want, r, dq, bcs)
        np.testing.assert_allclose(
            got, np.asarray(want), rtol=0, atol=ns * 1e-6
        )
    finally:
        zc._VMEM_BUDGET = old


@pytest.mark.parametrize(
    "shape,bcs,ns",
    [
        ((16, 16, 32), (("D", "D"), ("D", "D"), ("D", "D")), 1),
        ((12, 16, 32), (("D", "N"), ("N", "D"), ("D", "D")), 3),
        ((16, 24, 32), (("N", "N"), ("D", "D"), ("N", "D")), 2),
        ((16, 16, 32), (("D", "D"), ("D", "D"), ("D", "N")), 2),  # flips first color
        ((14, 16, 48), (("N", "D"), ("D", "N"), ("N", "N")), 5),
        ((16, 16, 33), (("D", "D"), ("D", "D"), ("D", "D")), 1),  # odd nx (interpret)
    ],
)
def test_zc_kernel_matches_masked(shape, bcs, ns):
    _run(shape, bcs, ns)


@pytest.mark.parametrize(
    "shape,bcs,ns",
    [
        ((32, 32, 128), (("D", "D"), ("N", "N"), ("D", "D")), 2),
        ((48, 32, 128), (("D", "D"), ("D", "D"), ("N", "N")), 3),
        ((32, 48, 128), (("N", "N"), ("D", "D"), ("D", "D")), 2),
    ],
)
def test_zc_kernel_tiled_windows(shape, bcs, ns):
    """Small VMEM budget -> real tiling: clamped windows, halos, the
    double-buffered pipeline and out-DMA drains are all exercised."""
    _run(shape, bcs, ns, budget=6 * 20 * 24 * 128 * 4 + 1)


def test_unsupported_cases():
    dq = np.ones(3)
    f32 = jnp.float32
    assert zc.zc_smooth_3d((("N", "N"),) * 3, dq, (32, 32, 128), 1) is None
    assert not zc.zc_kernel_supported((32, 32, 128), (("D", "D"),) * 3, jnp.float64, 1)
    assert not zc.zc_kernel_supported((32, 32, 120), (("D", "D"),) * 3, f32, 1)
    assert not zc.zc_kernel_supported((31, 32, 128), (("D", "D"),) * 3, f32, 1)
    # odd nz: clamp != reflection at the upper z face
    assert not zc.zc_kernel_supported((33, 32, 128), (("D", "D"),) * 3, f32, 1)


def test_pick_tiles_zc_properties():
    t = zc.pick_tiles_zc((256, 256, 256), 2)
    assert t is not None
    tz, ty, wz, wy = t
    assert 256 % tz == 0 and 256 % ty == 0
    assert tz % 2 == 0 and ty % 8 == 0 and wz % 2 == 0
    # 4 dense units: 2x2 double-buffered windows (both u and rhs color
    # halves live in place in their consumed window slots)
    assert 4 * wz * wy * 256 * 4 <= zc._VMEM_BUDGET


def test_pick_tiles_zc_scoped_stack_model():
    """Every pick must satisfy the fitted Mosaic scoped-stack model
    ((units+2) window units + 1.5 tile temporaries <= 16.2M headroom
    under the 16 MiB hardware limit) — several picks regressed past
    the hardware limit in round 8 when the in-place-halves change let
    the picker choose bigger windows (observed compile ERRORS on chip:
    256^3 ns=1 at 18.58 MiB, 512^3 ns=3 at 16.59 MiB, 512^3 ns=4 at
    18.91 MiB, all against Mosaic's hard 16.00 MiB scoped limit)."""
    shapes = [
        (256, 256, 256), (512, 512, 512), (220, 224, 256),
        (128, 128, 128), (110, 112, 128), (64, 64, 128),
    ]
    for shape in shapes:
        nx = shape[2]
        for ns in range(1, 9):
            for res, cor, units in (
                (False, False, 4), (True, False, 7), (False, True, 6),
            ):
                p = zc.pick_tiles_zc(shape, ns, residual=res, with_cor=cor)
                if p is None:
                    continue
                tz, ty, wz, wy = p
                scoped = ((units + 2) * wz * wy + 1.5 * tz * ty) * nx * 4
                assert scoped <= zc._SCOPED_LIMIT, (shape, ns, res, cor, p)
    # The observed-OOM picks specifically must be rejected by the gate.
    for units, tz, ty, wz, wy, nx in (
        (4, 32, 64, 36, 72, 256),  # 256^3 ns=1, 18.58 MiB
        (4, 16, 32, 28, 48, 512),  # 512^3 ns=3, 16.59 MiB
        (4, 16, 32, 32, 48, 512),  # 512^3 ns=4, 18.91 MiB
    ):
        assert not zc._scoped_ok(units, tz, ty, wz, wy, nx)
    # ... while the chip-validated picks pass (50/46 G pt-sw/s runs).
    assert zc._scoped_ok(4, 32, 32, 48, 48, 256)  # 256^3 ns=4
    assert zc._scoped_ok(4, 16, 32, 24, 48, 512)  # 512^3 ns=2
    # Calibrated auto widths.  Round-5 same-session A/B (PERF_NOTES r5,
    # logs/widths_256_r5.log + bench_220_{w2,auto}.log): width 2 wins
    # the end-to-end mixed solve at 256^3 (136.3 vs 151.8 ms) and the
    # smoother basis (54.4 vs 38.2 G DOF/s) — fine production levels
    # pin to 2; only near-halo-free windows (frac >= 0.6, the capped
    # coarse levels) go deeper.
    assert zc.auto_pass_width((256, 256, 256), 8) == 2
    assert zc.auto_pass_width((512, 512, 512), 8) == 2
    assert zc.auto_pass_width((220, 224, 256), 8) == 2


def test_auto_pass_width():
    """Per-level width rule: 2 on fine levels, deeper only at tile
    fraction >= 0.6 (round-5 recalibration; PERF_NOTES r5)."""
    for m, ms in ((512, 8), (256, 8), (64, 8)):
        w = zc.auto_pass_width((m, m, m), ms)
        assert 1 <= w <= ms
        p = zc.pick_tiles_zc((m, m, m), w)
        assert p is not None
        if w > 2:
            assert p[0] * p[1] / (p[2] * p[3]) >= 0.6
    # monotone capability: big windows on capped small levels go deep
    assert zc.auto_pass_width((64, 64, 64), 8) >= zc.auto_pass_width(
        (512, 512, 512), 8
    )
    # ms caps the scan
    assert zc.auto_pass_width((64, 64, 64), 2) <= 2


@pytest.mark.parametrize(
    "shape,bcs,ns",
    [
        ((16, 16, 32), (("D", "D"), ("D", "D"), ("D", "D")), 1),
        ((16, 24, 32), (("N", "N"), ("D", "D"), ("N", "D")), 2),
        ((32, 32, 128), (("D", "D"), ("N", "N"), ("D", "D")), 2),
    ],
)
def test_zc_residual_fused(shape, bcs, ns):
    """call(u, rhs) -> (u', r) equals ns rb_sweeps + poisson_residual."""
    rng = np.random.default_rng(hash((shape, ns)) % 2**31)
    dq = np.array([0.9, 1.1, 1.3])
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    r = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    old = zc._VMEM_BUDGET
    if shape[0] >= 32:
        zc._VMEM_BUDGET = 6 * 28 * 32 * 128 * 4 + 1  # force tiling
    try:
        f = zc.zc_smooth_residual_3d(bcs, dq, shape, ns, interpret=True)
        assert f is not None
        gu, gr = jax.jit(f)(u, r)
    finally:
        zc._VMEM_BUDGET = old
    want = u
    for _ in range(ns):
        want = stencils.rb_sweep(want, r, dq, bcs)
    wr = stencils.poisson_residual(want, r, dq, bcs)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(want), rtol=0, atol=ns * 1e-6)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(wr), rtol=0, atol=1e-5)


@pytest.mark.parametrize(
    "shape,bcs,ns",
    [
        ((16, 16, 32), (("D", "D"), ("D", "D"), ("D", "D")), 1),
        ((16, 24, 32), (("N", "N"), ("D", "D"), ("N", "D")), 2),
        ((32, 32, 128), (("D", "D"), ("N", "N"), ("D", "D")), 2),
    ],
)
def test_zc_cor_fused(shape, bcs, ns):
    """call(u, cor, rhs) -> ns sweeps on (u + cor), BITWISE equal to the
    plain kernel on the XLA-added input (same f32 add, same sweeps)."""
    rng = np.random.default_rng(hash((shape, ns)) % 2**31)
    dq = np.array([0.9, 1.1, 1.3])
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    c = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    r = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    old = zc._VMEM_BUDGET
    if shape[0] >= 32:
        zc._VMEM_BUDGET = 8 * 20 * 24 * 128 * 4 + 1  # force tiling
    try:
        fc = zc.zc_smooth_cor_3d(bcs, dq, shape, ns, interpret=True)
        fp = zc.zc_smooth_3d(bcs, dq, shape, ns, interpret=True)
        assert fc is not None and fp is not None
        got = np.asarray(jax.jit(fc)(u, c, r))
        want = np.asarray(jax.jit(fp)(u + c, r))
    finally:
        zc._VMEM_BUDGET = old
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "real,padded,bcs,ns",
    [
        ((16, 13, 22), (16, 16, 128), (("D", "D"), ("N", "D"), ("D", "N")), 2),
        ((12, 20, 30), (12, 24, 128), (("N", "N"), ("D", "D"), ("D", "D")), 3),
        ((16, 16, 33), (16, 16, 128), (("D", "N"), ("N", "N"), ("D", "D")), 1),
    ],
)
def test_zc_kernel_padded_real_faces(real, padded, bcs, ns):
    """real_shape < padded storage: sweeps on the real region are
    BITWISE those of the masked XLA sweep on the real arrays (the real
    top-face reflection/freezing replaces the array-edge one), and the
    pad region is frozen."""
    rng = np.random.default_rng(hash((real, ns)) % 2**31)
    dq = np.array([0.9, 1.1, 1.3])
    u_r = jnp.asarray(rng.standard_normal(real), jnp.float32)
    r_r = jnp.asarray(rng.standard_normal(real), jnp.float32)
    pad = [(0, p - q) for p, q in zip(padded, real)]
    u_p = jnp.pad(u_r, pad, constant_values=7.5)  # nonzero pad: must be inert
    r_p = jnp.pad(r_r, pad, constant_values=-3.25)
    f = zc.zc_smooth_3d(bcs, dq, padded, ns, interpret=True, real_shape=real)
    assert f is not None
    got = np.asarray(jax.jit(f)(u_p, r_p))
    want = u_r
    for _ in range(ns):
        want = stencils.rb_sweep(want, r_r, dq, bcs)
    sl = tuple(slice(0, s) for s in real)
    np.testing.assert_array_equal(got[sl], np.asarray(want))
    # pad region frozen at its input values
    assert (got[:, real[1]:, :] == 7.5).all()
    assert (got[:, :, real[2]:] == 7.5).all()

    # residual-fused variant: real region matches, pad region zero
    fr = zc.zc_smooth_residual_3d(bcs, dq, padded, ns, interpret=True, real_shape=real)
    assert fr is not None
    gu, gr = jax.jit(fr)(u_p, r_p)
    gu, gr = np.asarray(gu), np.asarray(gr)
    wr = stencils.poisson_residual(want, r_r, dq, bcs)
    np.testing.assert_array_equal(gu[sl], np.asarray(want))
    np.testing.assert_allclose(gr[sl], np.asarray(wr), rtol=0, atol=1e-5)
    assert (gr[:, real[1]:, :] == 0).all()
    assert (gr[:, :, real[2]:] == 0).all()


def test_engine_padded_solve_interpret(monkeypatch):
    """A kernel-eligible but UNALIGNED size runs the mixed solve on
    padded work storage (engine._padded[0]) and matches the XLA engine:
    same cycle count, solutions to solver tolerance."""
    from ndsm_tpu import GridHierarchy, Options, PoissonBVP

    n = 22  # golden-table size: ny % 8 != 0, nx % 128 != 0
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x))
    bcs = (("D", "D"), ("N", "N"), ("D", "D"))
    rng = np.random.default_rng(12)
    rhs = rng.standard_normal((n, n, n))
    u0 = np.zeros_like(rhs)
    opts = Options(precision="mixed", vc_tol=1e-10, ncycles_max=60)

    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    bvp_p = PoissonBVP(h, bcs, opts)
    eng = bvp_p._inner
    assert eng._padded[0] and eng._work_shapes[0] == (22, 24, 128)
    u_p, info_p = bvp_p.solve(u0, rhs)

    monkeypatch.delenv("NDSM_TPU_PALLAS")
    monkeypatch.delenv("NDSM_TPU_PALLAS_MIN_POINTS")
    bvp_x = PoissonBVP(h, bcs, opts)
    assert not bvp_x._inner._padded[0]
    u_x, info_x = bvp_x.solve(u0, rhs)
    assert info_p.ierr == 0 and info_x.ierr == 0
    assert info_p.cycles == info_x.cycles
    np.testing.assert_allclose(
        np.asarray(u_p), np.asarray(u_x), rtol=0, atol=1e-9
    )


def test_engine_cor_fusion_interpret(monkeypatch):
    """MGEngine.t_smooth_cor with the fused kernel equals
    t_smooth(u + cor) exactly, and the V-cycle using it matches the XLA
    engine's cycle count on a full solve."""
    import os
    from ndsm_tpu import GridHierarchy, Options, PoissonBVP
    from ndsm_tpu.mg.poisson import _cached_engine

    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    n = 16
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x), ngrids=2)
    bcs = (("D", "D"), ("N", "N"), ("D", "D"))
    eng = _cached_engine(h, bcs, 3, True, jnp.float32, use_pallas="interpret")
    assert eng._pallas_zc_cor_fn(0, 2) is not None
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    got = np.asarray(eng.t_smooth_cor(u, c, r, 0))
    want = np.asarray(eng.t_smooth(u + c, r, 0))
    np.testing.assert_array_equal(got, want)


def test_engine_residual_fusion_interpret(monkeypatch):
    """The fused descent (smooth+residual kernel) gives the same solve
    as the unfused XLA path to solver tolerance."""
    from ndsm_tpu import GridHierarchy, Options
    from ndsm_tpu.mg.poisson import PoissonBVP

    n = 24
    x = np.linspace(0, 1, n)
    Z, Y, X = np.meshgrid(x, x, x, indexing="ij")
    U = np.sin(np.pi * X) * np.sin(np.pi * Y) * np.cos(np.pi * Z)
    rhs = -3 * np.pi**2 * U
    bcs = (("N", "N"), ("D", "D"), ("D", "D"))
    h = GridHierarchy.from_mesh((x, x, x), ngrids=2)

    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    bvp = PoissonBVP(h, bcs, Options(precision="fp32", vc_tol=1e-5, ms=3))
    assert bvp._inner._pallas_zc_res_fn(0, 1) is not None
    u_p, info_p = bvp.solve(np.zeros_like(rhs), rhs)

    monkeypatch.delenv("NDSM_TPU_PALLAS")
    monkeypatch.delenv("NDSM_TPU_PALLAS_MIN_POINTS")
    bvp_x = PoissonBVP(h, bcs, Options(precision="fp32", vc_tol=1e-5, ms=3))
    u_x, info_x = bvp_x.solve(np.zeros_like(rhs), rhs)
    assert info_p.ierr == 0 and info_p.cycles == info_x.cycles
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x), rtol=0, atol=5e-5)


def test_pass_width_decomposition_bitwise(monkeypatch):
    """The pass decomposition (pinned widths 1/2/4 and the per-level
    auto default) is bitwise-invisible: every composition of the same
    ms sweeps produces the identical smoothed array."""
    from ndsm_tpu import GridHierarchy
    from ndsm_tpu.mg.poisson import _cached_engine

    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    n = 16
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x), ngrids=2)
    bcs = (("D", "D"), ("N", "N"), ("D", "D"))
    rng = np.random.default_rng(9)
    u = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)

    outs = {}
    for width in ("auto", "1", "2", "4"):
        if width == "auto":
            monkeypatch.delenv("NDSM_TPU_PALLAS_NSWEEPS", raising=False)
        else:
            monkeypatch.setenv("NDSM_TPU_PALLAS_NSWEEPS", width)
        eng = _cached_engine(
            h, bcs, 5, True, jnp.float32, use_pallas="interpret"
        )
        eng._pallas_fns.clear()  # cached engines memoize kernel fns
        assert eng._pallas_zc_fn(0, eng._pass_width(5, 0)) is not None
        outs[width] = np.asarray(eng.t_smooth(u, r, 0))
        ur, rr = eng.t_smooth_residual(u, r, 0)
        outs[width + "_res"] = (np.asarray(ur), np.asarray(rr))
    monkeypatch.delenv("NDSM_TPU_PALLAS_NSWEEPS", raising=False)
    for width in ("1", "2", "4"):
        np.testing.assert_array_equal(outs[width], outs["auto"])
        np.testing.assert_array_equal(outs[width + "_res"][0], outs["auto_res"][0])
        np.testing.assert_array_equal(outs[width + "_res"][1], outs["auto_res"][1])


@pytest.mark.parametrize("axes", [1, 2])
def test_sharded_zc_smoother_interpret(monkeypatch, axes):
    """ShardedPoissonBVP with the per-shard zc kernel (interpret mode on
    the virtual CPU mesh) matches the XLA sharded path: halo-extended
    blocks + mirror faces + streamed freeze-code reproduce the sharded
    sweep semantics."""
    from ndsm_tpu import GridHierarchy, Options
    from ndsm_tpu.parallel.shard import make_mesh, make_mesh_nd
    from ndsm_tpu.parallel.sm_engine import ShardedPoissonBVP

    n = 32
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x), ngrids=2)
    bcs = (("D", "D"), ("N", "N"), ("D", "D"))
    rng = np.random.default_rng(5)
    rhs = rng.standard_normal((n, n, n))
    u0 = np.zeros_like(rhs)
    if axes == 1:
        mesh, names = make_mesh(4), ("z",)
    else:
        mesh, names = make_mesh_nd((2, 2), ("z", "y")), ("z", "y")
    opts = Options(precision="fp32", vc_tol=1e-5, ncycles_max=12, ms=3)

    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    sp = ShardedPoissonBVP(
        h, bcs, opts, mesh=mesh, axis_names=names, min_rows_per_shard=2
    )
    assert sp._zc_sharded_fn(0, 2) is not None
    u_p, info_p = sp.solve(u0, rhs)

    monkeypatch.delenv("NDSM_TPU_PALLAS")
    monkeypatch.delenv("NDSM_TPU_PALLAS_MIN_POINTS")
    sx = ShardedPoissonBVP(
        h, bcs, opts, mesh=mesh, axis_names=names, min_rows_per_shard=2
    )
    assert sx._zc_sharded_fn(0, 2) is None
    u_x, info_x = sx.solve(u0, rhs)
    assert info_p.ierr == 0 and info_x.ierr == 0
    assert info_p.cycles == info_x.cycles
    np.testing.assert_allclose(
        np.asarray(u_p), np.asarray(u_x), rtol=0, atol=5e-5
    )


@pytest.mark.parametrize("ext_y", [False, True])
@pytest.mark.parametrize("residual", [False, True])
def test_zc_sharded_ext_out_bitwise(ext_y, residual):
    """ext_out variant: the u output's REAL region is BITWISE equal to
    the local-layout kernel on identical extended inputs (same windows,
    same sweeps — only the out-DMA destination offsets change); the
    residual output stays local-layout and identical."""
    local = (16, 16, 32)
    ns = 2
    H_z, H_y = zc._halos(ns, residual)
    ez = local[0] + 2 * H_z
    ey = local[1] + (2 * H_y if ext_y else 0)
    rng = np.random.default_rng(13)
    dq = np.array([0.9, 1.1, 1.3])
    eu = jnp.asarray(rng.standard_normal((ez, ey, local[2])), jnp.float32)
    er = jnp.asarray(rng.standard_normal((ez, ey, local[2])), jnp.float32)
    ec = jnp.asarray(
        2.0 * rng.integers(0, 2, (ez, ey, local[2])), jnp.float32
    )
    kw = dict(ext_y=ext_y, interpret=True, residual=residual)
    f0 = zc.zc_smooth_sharded_3d(dq, local, ns, 0, **kw)
    f1 = zc.zc_smooth_sharded_3d(dq, local, ns, 0, ext_out=True, **kw)
    assert f0 is not None and f1 is not None
    o0 = f0(eu, er, ec)
    o1 = f1(eu, er, ec)
    if residual:
        (u0, r0), (u1, r1) = o0, o1
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r0))
    else:
        u0, u1 = o0, o1
    assert u1.shape == (ez, ey, local[2])
    sly = slice(H_y, H_y + local[1]) if ext_y else slice(None)
    np.testing.assert_array_equal(
        np.asarray(u1)[H_z : H_z + local[0], sly], np.asarray(u0)
    )


def test_engine_kernel_compile_failure_falls_back_to_xla(monkeypatch, capfd):
    """VERDICT r4 weak #5: a PRODUCTION-shape kernel that fails to
    compile at solve time (e.g. Mosaic lowering / VMEM exhaustion — the
    small-shape probe cannot rule these out) must fall back to the XLA
    smoother with a warning and still converge.  Emulated by wrapping
    the zc builder so its returned kernel raises a Mosaic-style error
    the first time it is traced."""
    from ndsm_tpu import GridHierarchy, Options, PoissonBVP
    from ndsm_tpu.ops import pallas_zc

    n = 22
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x))
    # distinct BCs => distinct engine-cache key (no collision with the
    # padded-solve test's healthy engine above)
    bcs = (("N", "N"), ("D", "D"), ("D", "D"))
    rng = np.random.default_rng(13)
    rhs = rng.standard_normal((n, n, n))
    u0 = np.zeros_like(rhs)
    opts = Options(precision="mixed", vc_tol=1e-10, ncycles_max=60)

    names = (
        "zc_smooth_3d",
        "zc_smooth_mean_3d",
        "zc_smooth_cor_3d",
        "zc_smooth_residual_3d",
    )
    origs = {nm: getattr(pallas_zc, nm) for nm in names}

    def make_broken(orig):
        def broken_builder(*a, **k):
            fn = orig(*a, **k)
            if fn is None:
                return None

            def raising(*aa, **kk):
                raise RuntimeError(
                    "INTERNAL: Mosaic failed to lower module (test fault)"
                )

            return raising

        return broken_builder

    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    for nm in names:
        monkeypatch.setattr(pallas_zc, nm, make_broken(origs[nm]))
    bvp = PoissonBVP(h, bcs, opts)
    assert bvp._pallas_active()
    u_p, info_p = bvp.solve(u0, rhs)
    err = capfd.readouterr().err
    assert err.count("retrying with the XLA smoother") == 1, err
    # exactly one retry even under the env override: explicit
    # use_pallas="off" beats NDSM_TPU_PALLAS (else the broken kernel
    # would recurse through its own fallback forever)
    assert info_p.ierr == 0

    # reference answer: the plain XLA engine
    monkeypatch.delenv("NDSM_TPU_PALLAS")
    monkeypatch.delenv("NDSM_TPU_PALLAS_MIN_POINTS")
    for nm in names:
        monkeypatch.setattr(pallas_zc, nm, origs[nm])
    u_x, info_x = PoissonBVP(h, bcs, opts).solve(u0, rhs)
    assert info_p.cycles == info_x.cycles
    np.testing.assert_allclose(
        np.asarray(u_p), np.asarray(u_x), rtol=0, atol=1e-9
    )
