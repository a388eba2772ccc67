"""Double-float (f32-pair) defect kernel: accuracy of the compensated
residual against the float64 oracle, and the mixed-precision engine's
df32 mode (Options.mixed_defect) — interpret mode on CPU.

The compiled path is exercised on real TPU by the perf scripts (see
PERF_NOTES.md round 3); these tests pin the numerics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ndsm_tpu import GridHierarchy, Options, PoissonBVP
from ndsm_tpu.ops import stencils
from ndsm_tpu.ops import pallas_df as dfm


def _case(n, seed=0):
    """Near-converged iterate: rhs := L(u) with u then slightly
    perturbed, so the true residual is ~1e-9 of the stencil-term scale
    — the regime the defect pass exists for (catastrophic cancellation
    of the w-weighted terms), where a naive f32 evaluation is pure
    noise.  The 1e-8 noise on u exercises the lo words."""
    rng = np.random.default_rng(seed)
    x = np.linspace(0.0, 1.0, n)
    dq = np.array([x[1] - x[0]] * 3)
    z, y, xx = np.meshgrid(x, x, x, indexing="ij")
    u = np.sin(2.1 * z + 0.3) * np.cos(1.7 * y) * np.sin(2.9 * xx + 1.1)
    u = u + 1e-8 * rng.standard_normal((n, n, n))
    return u, dq


@pytest.mark.parametrize(
    "bcs",
    [
        (("N", "N"), ("N", "N"), ("D", "D")),
        (("D", "N"), ("N", "D"), ("N", "N")),
    ],
)
def test_df_residual_matches_f64_oracle(bcs):
    """In the cancellation regime the pair kernel tracks the f64
    residual to the pair representation floor (~1e-12 of the term
    scale) — ~6 decades tighter than a naive f32 stencil."""
    n = 24
    u, dq = _case(n)
    rhs = -np.asarray(
        stencils.poisson_residual(
            jnp.asarray(u), jnp.zeros((n, n, n)), jnp.asarray(dq), bcs
        )
    )
    u = u * (1 + 1e-9) + 1e-9

    uh, ul = dfm.df_decompose(jnp.asarray(u))
    rh, rl = dfm.df_decompose(jnp.asarray(rhs))
    call = dfm.df_residual_3d(bcs, dq, (n, n, n), interpret=True)
    assert call is not None
    r_df32, mx = call(uh, ul, rh, rl)
    r_df = np.asarray(r_df32, dtype=np.float64)
    # the in-window max output reduces to the true max|r|
    assert float(jnp.max(mx)) == float(np.abs(r_df32).max())

    r64 = np.asarray(
        stencils.poisson_residual(
            jnp.asarray(u, jnp.float64), jnp.asarray(rhs, jnp.float64),
            jnp.asarray(dq), bcs,
        )
    )
    r32_naive = np.asarray(
        stencils.poisson_residual(
            jnp.asarray(u, jnp.float32), jnp.asarray(rhs, jnp.float32),
            jnp.asarray(dq), bcs,
        ),
        dtype=np.float64,
    )
    scale = float(np.abs(rhs).max())
    assert np.abs(r64).max() < 1e-6 * scale  # we are in the regime
    err_df = np.abs(r_df - r64).max() / scale
    err_naive = np.abs(r32_naive - r64).max() / scale
    assert err_df < 1e-12
    assert err_df < 1e-5 * err_naive  # the compensation is doing the work


def test_df_residual_zero_rhs_variant():
    n = 16
    u, dq = _case(n, seed=3)
    bcs = (("N", "N"), ("D", "D"), ("N", "N"))
    uh, ul = dfm.df_decompose(jnp.asarray(u))
    z = jnp.zeros((n, n, n), jnp.float32)
    full = dfm.df_residual_3d(bcs, dq, (n, n, n), interpret=True)
    zero = dfm.df_residual_3d(bcs, dq, (n, n, n), zero_rhs=True, interpret=True)
    r_full, m_full = full(uh, ul, z, z)
    r_zero, m_zero = zero(uh, ul)
    np.testing.assert_array_equal(np.asarray(r_full), np.asarray(r_zero))
    assert float(jnp.max(m_full)) == float(jnp.max(m_zero))


def test_df_residual_padded_matches_direct():
    """Padded work storage (real_shape): the kernel applies the face
    reflection/zeroing at the REAL y/x faces, keeps the pad-region
    residual identically zero, and reproduces the direct (unpadded)
    kernel bitwise at every real point — the property that lets the
    mixed outer pair live on padded storage at 220^3-class sizes."""
    # ---- x-pad only (direct kernel exists at ny % 8 == 0): bitwise
    n = 24
    u, dq = _case(n, seed=5)
    bcs = (("N", "N"), ("D", "D"), ("N", "D"))
    uh, ul = dfm.df_decompose(jnp.asarray(u))
    rhs = 1e-6 * np.asarray(np.random.default_rng(6).standard_normal((n, n, n)))
    rh, rl = dfm.df_decompose(jnp.asarray(rhs))
    pshape = (n, n, 128)

    def pad(a, pshape):
        return jnp.pad(a, [(0, p - s) for p, s in zip(pshape, a.shape)])

    for zero in (True, False):
        direct = dfm.df_residual_3d(bcs, dq, (n, n, n), zero_rhs=zero, interpret=True)
        padded = dfm.df_residual_3d(
            bcs, dq, pshape, zero_rhs=zero, interpret=True, real_shape=(n, n, n)
        )
        assert direct is not None and padded is not None
        if zero:
            r_d, m_d = direct(uh, ul)
            r_p, m_p = padded(pad(uh, pshape), pad(ul, pshape))
        else:
            r_d, m_d = direct(uh, ul, rh, rl)
            r_p, m_p = padded(
                pad(uh, pshape), pad(ul, pshape), pad(rh, pshape), pad(rl, pshape)
            )
        r_p = np.asarray(r_p)
        np.testing.assert_array_equal(r_p[:, :, :n], np.asarray(r_d))
        assert np.abs(r_p[:, :, n:]).max() == 0.0
        assert float(jnp.max(m_p)) == float(jnp.max(m_d))

    # ---- y+x padding (no direct kernel at ny % 8 != 0): f64 oracle
    m = 20
    u2, dq2 = _case(m, seed=7)
    rhs2 = -np.asarray(
        stencils.poisson_residual(
            jnp.asarray(u2), jnp.zeros((m, m, m)), jnp.asarray(dq2), bcs
        )
    )
    u2 = u2 * (1 + 1e-9) + 1e-9
    p2 = (m, 24, 128)
    uh2, ul2 = dfm.df_decompose(jnp.asarray(u2))
    rh2, rl2 = dfm.df_decompose(jnp.asarray(rhs2))
    padded2 = dfm.df_residual_3d(
        bcs, dq2, p2, zero_rhs=False, interpret=True, real_shape=(m, m, m)
    )
    assert padded2 is not None
    r_p2, m_p2 = padded2(
        pad(uh2, p2), pad(ul2, p2), pad(rh2, p2), pad(rl2, p2)
    )
    r_p2 = np.asarray(r_p2, dtype=np.float64)
    assert np.abs(r_p2[:, m:, :]).max() == 0.0
    assert np.abs(r_p2[:, :, m:]).max() == 0.0
    r64 = np.asarray(
        stencils.poisson_residual(
            jnp.asarray(u2, jnp.float64), jnp.asarray(rhs2, jnp.float64),
            jnp.asarray(dq2), bcs,
        )
    )
    scale = float(np.abs(rhs2).max())
    assert np.abs(r_p2[:m, :m, :m] - r64).max() < 1e-12 * scale
    assert float(jnp.max(m_p2)) == float(np.abs(r_p2).max())

    # unsupported paddings reject: z padding, real bigger than work
    assert not dfm.df_residual_supported(
        (m + 2, 24, 128), jnp.float32, interpret=True, real_shape=(m, m, m)
    )
    assert not dfm.df_residual_supported(
        (m, 24, 128), jnp.float32, interpret=True, real_shape=(m, 240, m)
    )


def test_df32_padded_pair_solve(monkeypatch):
    """End-to-end df32 at an unaligned size: the engine pads level 0,
    the pair lives on work storage, and the solve matches the f64-defect
    solve (pair precision) with the same cycle count contract."""
    n = 20
    bvp_df, u_df, info_df = _solve_pair(n, "df32", monkeypatch)
    assert bvp_df.df_defect and bvp_df._inner._padded[0]
    bvp_64, u_64, info_64 = _solve_pair(n, "f64", monkeypatch)
    assert not bvp_64.df_defect
    assert info_df.ierr == 0 and info_64.ierr == 0
    assert abs(info_df.cycles - info_64.cycles) <= 2
    np.testing.assert_allclose(u_df, u_64, rtol=0, atol=5e-10)


def test_df_residual_update_fused():
    """The pair-update-fused kernel (update=True) is bitwise the
    composition (XLA df_add, then the plain residual kernel) in all
    four outputs — the property that lets the driver fold the previous
    defect group's correction into the next group's residual pass."""
    n = 24
    u, dq = _case(n, seed=9)
    bcs = (("D", "D"), ("N", "N"), ("N", "D"))
    uh, ul = dfm.df_decompose(jnp.asarray(u))
    rng = np.random.default_rng(8)
    e = jnp.asarray(1e-7 * rng.standard_normal((n, n, n)), jnp.float32)
    rhs = 1e-6 * rng.standard_normal((n, n, n))
    rh, rl = dfm.df_decompose(jnp.asarray(rhs))
    uh2, ul2 = dfm.df_add(uh, ul, e)
    for zero in (True, False):
        plain = dfm.df_residual_3d(bcs, dq, (n, n, n), zero_rhs=zero, interpret=True)
        upd = dfm.df_residual_3d(
            bcs, dq, (n, n, n), zero_rhs=zero, interpret=True, update=True
        )
        assert upd is not None
        if zero:
            r_ref, m_ref = plain(uh2, ul2)
            r_u, m_u, uh_u, ul_u = upd(uh, ul, e)
        else:
            r_ref, m_ref = plain(uh2, ul2, rh, rl)
            r_u, m_u, uh_u, ul_u = upd(uh, ul, rh, rl, e)
        np.testing.assert_array_equal(np.asarray(r_u), np.asarray(r_ref))
        np.testing.assert_array_equal(np.asarray(uh_u), np.asarray(uh2))
        np.testing.assert_array_equal(np.asarray(ul_u), np.asarray(ul2))
        assert float(jnp.max(m_u)) == float(jnp.max(m_ref))

    # padded update: bitwise the padded plain kernel after an XLA
    # df_add, with the pad region of every output identically zero
    pshape = (n, n, 128)

    def pad(a):
        return jnp.pad(a, [(0, p - s) for p, s in zip(pshape, a.shape)])

    plain_p = dfm.df_residual_3d(
        bcs, dq, pshape, zero_rhs=True, interpret=True, real_shape=(n, n, n)
    )
    upd_p = dfm.df_residual_3d(
        bcs, dq, pshape, zero_rhs=True, interpret=True, real_shape=(n, n, n),
        update=True,
    )
    assert upd_p is not None
    r_ref, m_ref = plain_p(pad(uh2), pad(ul2))
    r_u, m_u, uh_u, ul_u = upd_p(pad(uh), pad(ul), pad(e))
    np.testing.assert_array_equal(np.asarray(r_u), np.asarray(r_ref))
    np.testing.assert_array_equal(np.asarray(uh_u), np.asarray(pad(uh2)))
    np.testing.assert_array_equal(np.asarray(ul_u), np.asarray(pad(ul2)))
    assert np.abs(np.asarray(uh_u)[:, :, n:]).max() == 0.0
    assert float(jnp.max(m_u)) == float(jnp.max(m_ref))


def test_df_add_scaled_pair_update():
    rng = np.random.default_rng(7)
    u = rng.standard_normal(512)
    e = rng.standard_normal(512).astype(np.float32)
    s = np.float32(3.7e-4)
    uh, ul = dfm.df_decompose(jnp.asarray(u))
    uh2, ul2 = dfm.df_add_scaled(uh, ul, jnp.asarray(e), s)
    got = np.asarray(dfm.df_reconstruct(uh2, ul2))
    want = u + np.float64(s) * e.astype(np.float64)
    # one f32 product rounding + pair representation
    assert np.abs(got - want).max() < 1e-10 * np.abs(want).max()
    # pair stays normalized
    assert np.abs(np.asarray(ul2)).max() <= 1e-7 * np.abs(np.asarray(uh2)).max() * 2


def _solve_pair(n, mixed_defect, monkeypatch, vc_tol=1e-10):
    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x), ngrids=3)
    bcs = (("D", "D"), ("N", "N"), ("N", "D"))
    rng = np.random.default_rng(11)
    rhs = rng.standard_normal((n, n, n))
    opts = Options(
        precision="mixed", vc_tol=vc_tol, ncycles_max=64, ms=3,
        mixed_defect=mixed_defect,
    )
    bvp = PoissonBVP(h, bcs, opts)
    u, info = bvp.solve(np.zeros_like(rhs), rhs)
    return bvp, np.asarray(u), info


def test_df32_solve_matches_f64_defect(monkeypatch):
    """mixed_defect='df32' converges to the SAME solution as the f64
    defect (within pair precision) and honors the vc_tol=1e-10 contract
    — the key claim of the double-float mode."""
    n = 24
    bvp_df, u_df, info_df = _solve_pair(n, "df32", monkeypatch)
    assert bvp_df.df_defect
    assert bvp_df._df_upd is not None  # fused update path active
    bvp_64, u_64, info_64 = _solve_pair(n, "f64", monkeypatch)
    assert not bvp_64.df_defect
    assert info_df.ierr == 0 and info_64.ierr == 0
    assert abs(info_df.cycles - info_64.cycles) <= 2
    np.testing.assert_allclose(u_df, u_64, rtol=0, atol=5e-10)


def test_df32_history_semantics(monkeypatch):
    """history=True in df mode keeps the one-entry-per-V-cycle contract
    and a monotone-converging tail under vc_tol."""
    n = 16
    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x), ngrids=2)
    bcs = (("D", "D"), ("N", "N"), ("N", "N"))
    rng = np.random.default_rng(2)
    rhs = rng.standard_normal((n, n, n))
    opts = Options(
        precision="mixed", vc_tol=1e-8, ncycles_max=40, mixed_defect="df32"
    )
    bvp = PoissonBVP(h, bcs, opts)
    assert bvp.df_defect
    u, info = bvp.solve(np.zeros_like(rhs), rhs, history=True)
    assert info.ierr == 0
    hist = info.du_history
    assert np.isfinite(hist[: info.cycles]).all()
    assert np.isnan(hist[info.cycles :]).all()
    assert hist[info.cycles - 1] < 1e-8


def test_df32_ncycles_max_zero_returns_u0(monkeypatch):
    """ncycles_max=0 in df mode: no cycles run, u0 comes back untouched
    with ierr=COVFAIL (the reference's DO-loop contract) — the
    pending-correction driver's unconditional first group is discarded."""
    n = 16
    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x), ngrids=2)
    bcs = (("D", "D"), ("N", "N"), ("N", "N"))
    rng = np.random.default_rng(4)
    rhs = rng.standard_normal((n, n, n))
    u0 = rng.standard_normal((n, n, n))
    opts = Options(precision="mixed", ncycles_max=0, mixed_defect="df32")
    bvp = PoissonBVP(h, bcs, opts)
    assert bvp.df_defect
    u, info = bvp.solve(u0, rhs)
    assert info.ierr != 0 and info.cycles == 0
    np.testing.assert_array_equal(np.asarray(u), u0)


def test_df32_checkpointed_matches_uninterrupted(monkeypatch, tmp_path):
    """solve_checkpointed in df32 mode (strict inner_max=1 groups
    through the pending-correction driver): every chunk boundary sees a
    complete iterate (the final df_add runs before each chunk returns),
    so chunked and uninterrupted solves agree and resume is exact."""
    n = 16
    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x), ngrids=2)
    bcs = (("D", "D"), ("N", "N"), ("N", "N"))
    rng = np.random.default_rng(6)
    rhs = rng.standard_normal((n, n, n))
    opts = Options(
        precision="mixed", vc_tol=1e-9, ncycles_max=40, mixed_defect="df32"
    )
    bvp = PoissonBVP(h, bcs, opts)
    assert bvp.df_defect
    ck = str(tmp_path / "df_state.npz")
    u_ck, info_ck = bvp.solve_checkpointed(
        np.zeros_like(rhs), rhs, checkpoint_path=ck, checkpoint_every=3
    )
    assert info_ck.ierr == 0
    # uninterrupted solve with the same strict (inner_max=1) schedule
    import dataclasses as _dc

    bvp1 = PoissonBVP(h, bcs, _dc.replace(opts, mixed_inner_max=1))
    u_ref, info_ref = bvp1.solve(np.zeros_like(rhs), rhs)
    assert info_ref.ierr == 0
    # chunking re-decomposes the pair at each boundary; agreement is at
    # pair precision of the iterate scale, far below vc_tol
    d = np.abs(np.asarray(u_ck) - np.asarray(u_ref)).max()
    assert d < 1e-10, d
    # resume: already converged, no extra cycles
    u2, info2 = bvp.solve_checkpointed(
        np.zeros_like(rhs), rhs, checkpoint_path=ck, checkpoint_every=3
    )
    assert info2.cycles == info_ck.cycles
    np.testing.assert_array_equal(np.asarray(u2), np.asarray(u_ck))


def test_df_gates_off_all_neumann_and_2d(monkeypatch):
    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    n = 16
    x = np.linspace(0, 1, n)
    h3 = GridHierarchy.from_mesh((x, x, x), ngrids=2)
    opts = Options(precision="mixed", mixed_defect="auto")
    assert not PoissonBVP(h3, (("N", "N"),) * 3, opts).df_defect
    h2 = GridHierarchy.from_mesh((x, x), ngrids=2)
    assert not PoissonBVP(h2, (("D", "D"), ("N", "N")), opts).df_defect


@pytest.mark.parametrize(
    "axes,bcs",
    [
        (1, (("D", "D"), ("N", "N"), ("D", "D"))),  # partitioned-z Dirichlet -> C stream
        (1, (("N", "N"), ("D", "D"), ("N", "D"))),  # z all-Neumann -> static masks
        (2, (("D", "N"), ("N", "D"), ("D", "D"))),  # 2-axis mesh, y halo-extended
    ],
)
def test_sharded_df_defect_interpret(monkeypatch, axes, bcs):
    """ShardedPoissonBVP with the per-shard double-float defect kernel
    (interpret mode on the virtual CPU mesh) matches the sharded
    f64-defect path: pair halo exchange + mirror faces + (when a
    partitioned axis has Dirichlet faces) the streamed mask code
    reproduce the f64 outer iteration at pair precision."""
    from ndsm_tpu.parallel.shard import make_mesh, make_mesh_nd
    from ndsm_tpu.parallel.sm_engine import ShardedPoissonBVP

    n = 32
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x), ngrids=3)
    rng = np.random.default_rng(9)
    rhs = rng.standard_normal((n, n, n))
    u0 = np.zeros_like(rhs)
    if axes == 1:
        mesh, names = make_mesh(4), ("z",)
    else:
        mesh, names = make_mesh_nd((2, 2), ("z", "y")), ("z", "y")
    opts = Options(
        precision="mixed", vc_tol=1e-10, ncycles_max=64, ms=3,
        mixed_defect="df32",
    )

    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    sp = ShardedPoissonBVP(
        h, bcs, opts, mesh=mesh, axis_names=names, min_rows_per_shard=2
    )
    assert sp.df_defect
    assert sp._df_upd is not None  # update-fused (1-exchange) group path
    u_df, info_df = sp.solve(u0, rhs)

    monkeypatch.delenv("NDSM_TPU_PALLAS")
    monkeypatch.delenv("NDSM_TPU_PALLAS_MIN_POINTS")
    opts64 = Options(
        precision="mixed", vc_tol=1e-10, ncycles_max=64, ms=3,
        mixed_defect="f64",
    )
    sx = ShardedPoissonBVP(
        h, bcs, opts64, mesh=mesh, axis_names=names, min_rows_per_shard=2
    )
    assert not sx.df_defect
    u_64, info_64 = sx.solve(u0, rhs)
    assert info_df.ierr == 0 and info_64.ierr == 0
    assert abs(info_df.cycles - info_64.cycles) <= 2
    np.testing.assert_allclose(
        np.asarray(u_df), np.asarray(u_64), rtol=0, atol=5e-10
    )


def test_sharded_df_zero_rhs_variant(monkeypatch):
    """The sharded zero-rhs df program (in-kernel rhs == 0) gives the
    same solve as uploading an explicit zero rhs, with nonzero Dirichlet
    data carried in u0 (the component-solve usage)."""
    from ndsm_tpu.parallel.shard import make_mesh
    from ndsm_tpu.parallel.sm_engine import ShardedPoissonBVP

    n = 24
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x), ngrids=3)
    bcs = (("D", "D"), ("N", "N"), ("D", "D"))
    rng = np.random.default_rng(4)
    u0 = np.zeros((n, n, n))
    u0[0] = rng.standard_normal((n, n))
    u0[-1] = rng.standard_normal((n, n))
    u0[:, :, 0] = rng.standard_normal((n, n))
    u0[:, :, -1] = rng.standard_normal((n, n))
    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    opts = Options(precision="mixed", vc_tol=1e-10, mixed_defect="df32")
    sp = ShardedPoissonBVP(
        h, bcs, opts, mesh=make_mesh(4), min_rows_per_shard=2
    )
    assert sp.df_defect
    u_z, info_z = sp.solve(u0, None, zero_rhs=True)
    u_e, info_e = sp.solve(u0, np.zeros_like(u0))
    assert info_z.ierr == 0
    assert info_z.cycles == info_e.cycles
    np.testing.assert_array_equal(np.asarray(u_z), np.asarray(u_e))


def test_batched_df32_matches_sequential(monkeypatch):
    """MultiBCSolver in df32 mode: per-lane cycles/solutions equal the
    standalone df32 PoissonBVP solves (lane freezing preserved), and
    both agree with the f64-defect solves at pair precision."""
    from ndsm_tpu.mg.batched import MultiBCSolver

    monkeypatch.setenv("NDSM_TPU_PALLAS", "interpret")
    monkeypatch.setenv("NDSM_TPU_PALLAS_MIN_POINTS", "0")
    n = 16
    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x))
    comp_bcs = [
        tuple(("N", "N") if (2 - ax) == c else ("D", "D") for ax in range(3))
        for c in range(3)
    ]
    rng = np.random.default_rng(0)
    u0s = []
    for c in range(3):
        u0 = np.zeros((n, n, n))
        if c != 2:
            u0[0] = rng.standard_normal((n, n))
            u0[-1] = rng.standard_normal((n, n))
        if c != 1:
            u0[:, 0] = rng.standard_normal((n, n))
        if c != 0:
            u0[:, :, 0] = rng.standard_normal((n, n))
        u0s.append(u0)
    opts = Options(precision="mixed", mixed_defect="df32")
    mbs = MultiBCSolver(h, comp_bcs, opts)
    assert mbs.df_defect
    u_b, infos_b = mbs.solve(np.stack(u0s))
    for c in range(3):
        bvp = PoissonBVP(h, comp_bcs[c], opts)
        assert bvp.df_defect
        u_s, info_s = bvp.solve(u0s[c], None, zero_rhs=True)
        assert infos_b[c].ierr == 0
        assert infos_b[c].cycles == info_s.cycles
        d = np.abs(np.asarray(u_b[c]) - np.asarray(u_s)).max()
        assert d <= 5e-12, (c, d)
        bvp64 = PoissonBVP(h, comp_bcs[c], Options(precision="mixed", mixed_defect="f64"))
        u_64, _ = bvp64.solve(u0s[c], None, zero_rhs=True)
        d64 = np.abs(np.asarray(u_s) - np.asarray(u_64)).max()
        assert d64 <= 1e-9, (c, d64)
