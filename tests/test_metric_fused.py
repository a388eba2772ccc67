"""Metric-fused final post-smooth (ops/pallas_zc.zc_smooth_metric_3d /
zc_smooth_cor_metric_3d + MGEngine.t_vcycle_du): the V-cycle's du
stopping metric computed inside the last kernel pass.

The fusion must be BITWISE-invisible: max is exactly order-independent
over the same f32 differences, so t_vcycle_du's du equals
t_metric(u_new, u_ref) bit for bit and every solve driver's iterate /
cycle-count sequence is unchanged (the golden tables depend on it).
Reference metric: du_metrics, ndsm_multigrid_core.f90:808-853."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndsm_tpu.ops import pallas_zc as zc
from ndsm_tpu.ops import stencils


@pytest.mark.parametrize(
    "shape,bcs,ns",
    [
        ((16, 16, 32), (("D", "D"), ("D", "D"), ("D", "D")), 1),
        ((16, 24, 32), (("N", "N"), ("D", "D"), ("N", "D")), 2),
        ((12, 16, 32), (("D", "N"), ("N", "D"), ("D", "D")), 3),
        ((16, 16, 32), (("D", "D"), ("D", "D"), ("D", "N")), 2),  # flips first color
    ],
)
def test_metric_kernel_bitwise(shape, bcs, ns):
    """Swept state identical to the plain kernel; jnp.max of the tile
    output bitwise-equals max|u' - u_ref|."""
    rng = np.random.default_rng(7)
    dq = np.array([0.9, 1.1, 1.3])
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    r = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    c = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    uref = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    f = zc.zc_smooth_metric_3d(bcs, dq, shape, ns, interpret=True)
    g = zc.zc_smooth_3d(bcs, dq, shape, ns, interpret=True)
    assert f is not None and g is not None
    u1, mt = jax.jit(f)(u, r, uref)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(g(u, r)))
    assert float(jnp.max(mt)) == float(jnp.max(jnp.abs(u1 - uref)))

    fc = zc.zc_smooth_cor_metric_3d(bcs, dq, shape, ns, interpret=True)
    gc = zc.zc_smooth_cor_3d(bcs, dq, shape, ns, interpret=True)
    assert fc is not None and gc is not None
    u2, mt2 = jax.jit(fc)(u, c, r, uref)
    np.testing.assert_array_equal(np.asarray(u2), np.asarray(gc(u, c, r)))
    assert float(jnp.max(mt2)) == float(jnp.max(jnp.abs(u2 - uref)))


def test_metric_kernel_tiled_windows():
    """Small VMEM budget -> real tiling: per-window maxima over clamped
    windows must still compose to the global max (tiles partition the
    array; halo regions are excluded by the in-kernel real mask)."""
    shape = (32, 32, 128)
    bcs = (("D", "D"), ("N", "N"), ("D", "D"))
    dq = np.array([1.0, 1.0, 1.0])
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    r = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    uref = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    old = zc._VMEM_BUDGET
    zc._VMEM_BUDGET = 10 * 20 * 24 * 128 * 4 + 1
    try:
        f = zc.zc_smooth_metric_3d(bcs, dq, shape, 2, interpret=True)
        assert f is not None
        u1, mt = f(u, r, uref)
        assert mt.shape[0] * mt.shape[1] > 1  # really tiled
    finally:
        zc._VMEM_BUDGET = old
    g = zc.zc_smooth_3d(bcs, dq, shape, 2, interpret=True)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(g(u, r)))
    assert float(jnp.max(mt)) == float(jnp.max(jnp.abs(u1 - uref)))


@pytest.mark.parametrize("ms", [1, 2, 3, 5])
def test_engine_vcycle_du_bitwise(monkeypatch, ms):
    """t_vcycle_du == (t_vcycle, t_metric) bit for bit at every pass
    composition the engine builds from ms sweeps."""
    from ndsm_tpu.mg.poisson import _cached_engine
    from ndsm_tpu import GridHierarchy

    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    n = 16
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x), ngrids=2)
    bcs = (("D", "D"), ("N", "N"), ("D", "D"))
    eng = _cached_engine(h, bcs, ms, True, jnp.float32, use_pallas="interpret")
    # the fused kernel really is in play for the final pass
    from ndsm_tpu.mg.engine import _pallas_nsweeps

    last = ms % min(ms, _pallas_nsweeps()) or min(ms, _pallas_nsweeps())
    assert eng._pallas_zc_metric_fn(0, last, with_cor=(ms <= _pallas_nsweeps())) is not None
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    u1, nc1 = eng.t_vcycle(u, r, 1e-6, 50)
    u2, nc2, du = eng.t_vcycle_du(u, r, 1e-6, 50, u)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    assert float(du) == float(eng.t_metric(u1, u))
    assert bool(nc1) == bool(nc2)


def test_engine_vcycle_du_mean_metric_fallback(monkeypatch):
    """du_max=False: the fused path must NOT engage (mean is summation-
    order-sensitive); du falls back to t_metric bitwise."""
    from ndsm_tpu.mg.poisson import _cached_engine
    from ndsm_tpu import GridHierarchy

    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    n = 16
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x), ngrids=2)
    bcs = (("D", "D"), ("N", "N"), ("D", "D"))
    eng = _cached_engine(h, bcs, 2, False, jnp.float32, use_pallas="interpret")
    rng = np.random.default_rng(6)
    u = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    u1, _ = eng.t_vcycle(u, r, 1e-6, 50)
    u2, _, du = eng.t_vcycle_du(u, r, 1e-6, 50, u)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    assert float(du) == float(eng.t_metric(u1, u))


def test_engine_vcycle_du_padded(monkeypatch):
    """Padded work storage (unaligned size): fused du still bitwise
    equals t_metric on the work-shaped iterate (pads are identically
    zero in both iterates, so they cannot carry the max)."""
    from ndsm_tpu import GridHierarchy, Options, PoissonBVP

    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    n = 22
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x))
    bcs = (("D", "D"), ("N", "N"), ("D", "D"))
    bvp = PoissonBVP(h, bcs, Options(precision="mixed"))
    eng = bvp._inner
    assert eng._padded[0]
    rng = np.random.default_rng(8)
    w0 = eng._work_shapes[0]
    r0 = tuple(h.shapes[0])

    def work(a):
        out = np.zeros(w0, np.float32)
        out[: r0[0], : r0[1], : r0[2]] = a
        return jnp.asarray(out)

    u = work(rng.standard_normal(r0))
    r = work(rng.standard_normal(r0))
    u1, _ = eng.t_vcycle(u, r, 1e-6, 50)
    u2, _, du = eng.t_vcycle_du(u, r, 1e-6, 50, u)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    assert float(du) == float(eng.t_metric(u1, u))


def test_solve_iterates_unchanged(monkeypatch):
    """Full mixed solves with the metric fusion in play match the
    XLA-smoother solves: same cycle counts, solutions to tolerance
    (the same guarantee the other kernel fusions carry)."""
    from ndsm_tpu import GridHierarchy, Options, PoissonBVP

    n = 16
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x))
    bcs = (("D", "D"), ("D", "D"), ("N", "N"))
    rng = np.random.default_rng(9)
    rhs = rng.standard_normal((n, n, n))
    u0 = np.zeros_like(rhs)
    opts = Options(precision="mixed", vc_tol=1e-10, ncycles_max=60)

    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    u_k, info_k = PoissonBVP(h, bcs, opts).solve(u0, rhs)
    monkeypatch.delenv("NDSM_TPU_PALLAS")
    monkeypatch.delenv("NDSM_TPU_PALLAS_MIN_POINTS")
    u_x, info_x = PoissonBVP(h, bcs, opts).solve(u0, rhs)
    assert info_k.cycles == info_x.cycles
    assert info_k.ierr == info_x.ierr == 0
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_x), rtol=0, atol=1e-9)


def test_batched_vcycle_du_bitwise(monkeypatch):
    """MultiBCSolver._vcycle_du: per-lane fused du bitwise equals the
    per-lane XLA _metric, swept state identical to _vcycle."""
    from ndsm_tpu import GridHierarchy, Options
    from ndsm_tpu.mg.batched import MultiBCSolver

    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    n = 16
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x))
    bcs_list = [
        tuple(("N", "N") if (2 - ax) == c else ("D", "D") for ax in range(3))
        for c in range(3)
    ]
    mbs = MultiBCSolver(h, bcs_list, Options(precision="mixed"))
    rng = np.random.default_rng(10)
    e = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    u1, _ = mbs._vcycle(e, r, 1e-6, 50)
    u2, _, du = mbs._vcycle_du(e, r, 1e-6, 50, e)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    np.testing.assert_array_equal(np.asarray(du), np.asarray(mbs._metric(u1, e)))


def test_staged_kernel_fallback_chain(monkeypatch):
    """Compile-failure recovery order: metric fusion off FIRST (kernel
    stack survives), full XLA smoother only on a second failure; the
    metric-off solve is bitwise the fused solve."""
    from ndsm_tpu import GridHierarchy, Options, PoissonBVP

    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    n = 16
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x))
    bcs = (("D", "D"), ("N", "N"), ("D", "D"))
    bvp = PoissonBVP(h, bcs, Options(precision="mixed"))
    assert bvp._inner.metric_fused
    fb = bvp._kernel_fallback()
    assert not fb._inner.metric_fused
    assert fb._inner.use_pallas == bvp._inner.use_pallas  # stack survives
    # stage 2 is the options-level use_pallas="off" BVP (NDSM_TPU_PALLAS
    # overrides options, so lift it before constructing the fallback —
    # in production the env is unset)
    monkeypatch.delenv("NDSM_TPU_PALLAS")
    fb2 = fb._kernel_fallback()
    assert fb2._inner.use_pallas == "off"
    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    rng = np.random.default_rng(13)
    rhs = rng.standard_normal((n, n, n))
    u0 = np.zeros_like(rhs)
    u_a, info_a = bvp.solve(u0, rhs)
    u_b, info_b = fb.solve(u0, rhs)
    np.testing.assert_array_equal(np.asarray(u_a), np.asarray(u_b))
    assert info_a.cycles == info_b.cycles


@pytest.mark.parametrize("axes", [1, 2])
def test_sharded_metric_fused_bitwise(monkeypatch, axes):
    """Sharded engine: the metric-fused final pass is bitwise-invisible
    (identical solves/cycles vs NDSM_TPU_METRIC_FUSED=0, whose du comes
    from the XLA local-max + pmax path)."""
    from ndsm_tpu import GridHierarchy, Options
    from ndsm_tpu.parallel.shard import make_mesh, make_mesh_nd
    from ndsm_tpu.parallel.sm_engine import ShardedPoissonBVP

    n = 32
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x), ngrids=2)
    bcs = (("D", "D"), ("N", "N"), ("D", "D"))
    rng = np.random.default_rng(14)
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
    assert sp._zc_sharded_metric_fn(0, 1) is not None  # rem width of ms=3
    u_f, info_f = sp.solve(u0, rhs)

    monkeypatch.setenv("NDSM_TPU_METRIC_FUSED", "0")
    so = ShardedPoissonBVP(
        h, bcs, opts, mesh=mesh, axis_names=names, min_rows_per_shard=2
    )
    assert so._zc_sharded_metric_fn(0, 1) is None
    assert so._zc_sharded_fn(0, 2) is not None  # kernel stack still on
    u_o, info_o = so.solve(u0, rhs)
    monkeypatch.delenv("NDSM_TPU_METRIC_FUSED")
    assert info_f.cycles == info_o.cycles
    assert info_f.du_last == info_o.du_last
    np.testing.assert_array_equal(np.asarray(u_f), np.asarray(u_o))


def test_toggle_bitwise_padded_golden_class(monkeypatch):
    """End-to-end mixed solve at a padded golden-class size (22^3):
    NDSM_TPU_METRIC_FUSED on/off must be bitwise-identical — this is the
    exact invariance the on-chip golden tables rely on."""
    from ndsm_tpu import GridHierarchy, Options
    from ndsm_tpu.mg.poisson import PoissonBVP, _ENGINE_CACHE

    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    n = 22
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x))
    bcs = (("D", "D"), ("N", "N"), ("D", "D"))
    rng = np.random.default_rng(15)
    rhs = rng.standard_normal((n, n, n))
    u0 = np.zeros_like(rhs)
    opts = Options(precision="mixed", vc_tol=1e-10, ncycles_max=40)

    u_f, info_f = PoissonBVP(h, bcs, opts).solve(u0, rhs)
    monkeypatch.setenv("NDSM_TPU_METRIC_FUSED", "0")
    _ENGINE_CACHE.clear()  # the toggle is engine-construction-time
    u_o, info_o = PoissonBVP(h, bcs, opts).solve(u0, rhs)
    monkeypatch.delenv("NDSM_TPU_METRIC_FUSED")
    _ENGINE_CACHE.clear()
    assert info_f.cycles == info_o.cycles
    assert info_f.du_last == info_o.du_last
    np.testing.assert_array_equal(np.asarray(u_f), np.asarray(u_o))


def test_batched_metric_padded_bitwise(monkeypatch):
    """MultiBCSolver at a padded (unaligned) size: per-lane fused du
    bitwise equals the XLA per-lane metric, swept state unchanged."""
    from ndsm_tpu import GridHierarchy, Options
    from ndsm_tpu.mg.batched import MultiBCSolver

    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    n = 20
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x))
    bcs_list = [
        tuple(("N", "N") if (2 - ax) == c else ("D", "D") for ax in range(3))
        for c in range(3)
    ]
    mbs = MultiBCSolver(h, bcs_list, Options(precision="mixed"))
    assert mbs._padded[0]
    w0 = mbs._work_shapes[0]
    rng = np.random.default_rng(16)

    def work(a):
        out = np.zeros((3,) + w0, np.float32)
        out[:, :n, :n, :n] = a
        return jnp.asarray(out)

    e = work(rng.standard_normal((3, n, n, n)))
    r = work(rng.standard_normal((3, n, n, n)))
    u1, _ = mbs._vcycle(e, r, 1e-6, 50)
    u2, _, du = mbs._vcycle_du(e, r, 1e-6, 50, e)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    np.testing.assert_array_equal(np.asarray(du), np.asarray(mbs._metric(u1, e)))


@pytest.mark.parametrize("axes", [1, 2])
def test_sharded_residual_fused_descent(monkeypatch, axes):
    """The residual-fused sharded descent (one deep exchange + in-VMEM
    residual) must build, and the solve must match the XLA sharded
    engine exactly like the other kernel fusions (cycle parity + 5e-5)."""
    from ndsm_tpu import GridHierarchy, Options
    from ndsm_tpu.parallel.shard import make_mesh, make_mesh_nd
    from ndsm_tpu.parallel.sm_engine import ShardedPoissonBVP

    n = 32
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x), ngrids=2)
    bcs = (("D", "D"), ("N", "N"), ("D", "D"))
    rng = np.random.default_rng(17)
    rhs = rng.standard_normal((n, n, n))
    u0 = np.zeros_like(rhs)
    if axes == 1:
        mesh, names = make_mesh(4), ("z",)
    else:
        mesh, names = make_mesh_nd((2, 2), ("z", "y")), ("z", "y")
    opts = Options(precision="fp32", vc_tol=1e-5, ncycles_max=12, ms=2)

    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    sp = ShardedPoissonBVP(
        h, bcs, opts, mesh=mesh, axis_names=names, min_rows_per_shard=2
    )
    assert sp._zc_sharded_res_fn(0, 2) is not None  # ms=2: fused last=2
    u_p, info_p = sp.solve(u0, rhs)

    monkeypatch.delenv("NDSM_TPU_PALLAS")
    monkeypatch.delenv("NDSM_TPU_PALLAS_MIN_POINTS")
    sx = ShardedPoissonBVP(
        h, bcs, opts, mesh=mesh, axis_names=names, min_rows_per_shard=2
    )
    u_x, info_x = sx.solve(u0, rhs)
    assert info_p.ierr == 0 and info_x.ierr == 0
    assert info_p.cycles == info_x.cycles
    np.testing.assert_allclose(
        np.asarray(u_p), np.asarray(u_x), rtol=0, atol=5e-5
    )
