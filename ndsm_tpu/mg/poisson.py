"""Poisson boundary-value-problem driver: V-cycle iteration with the
inter-cycle convergence metric, tolerance logic and error flags of the
reference (``solve_poisson_bvp``, fortran/ndsm_poisson.f90:63-155), plus a
TPU-native mixed-precision mode.

Precision modes
---------------
  * ``fp64``: the whole algorithm runs in float64 — step-for-step the
    reference algorithm (float64 is software-emulated on TPU).
  * ``mixed`` (TPU default): each outer iteration computes the defect
    ``r = rhs - L[u]`` in float64, solves ``L e = r`` with one float32
    V-cycle (scaled to unit magnitude so float32 resolution is always
    sufficient), and applies ``u += e`` in float64.  For a linear problem a
    V-cycle is a linear fixed-point iteration, so the correction-equation
    cycle from a zero initial guess is algebraically identical to cycling
    on ``u`` directly; the convergence metric du = |Δu| between cycles and
    the vc_tol contract are evaluated in float64 exactly as in fp64 mode.
    The only deviation: the coarse-grid ex_tol is floored at ~32·eps_f32
    of the (unit-scaled) correction, which can slightly change the
    V-cycle count but not the converged solution (guarded by the float64
    outer loop).
  * ``fp32``: everything float32 (use with loose tolerances).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..grids import GridHierarchy
from ..options import IERR_COVFAIL, IERR_SUCCESS, Options, SolveInfo
from ..ops import stencils
from ..utils.caching import BoundedCache
from ..utils.msgs import warn
from .engine import MGEngine

__all__ = ["PoissonBVP", "solve_poisson_bvp"]

# Engines hold transfer matrices and (for direct coarse solves) a dense
# pseudo-inverse; BVPs additionally pin compiled executables.  Bounded
# LRU caches keep a many-shape long-lived process from accumulating them
# without limit while still giving the common reuse patterns (repeated
# solves at one size; the nine sub-solves of a vector-potential call)
# full hit rates.
_ENGINE_CACHE: BoundedCache = BoundedCache(maxsize=64)

_COARSE_NOCONV_WARNING = (
    "Warning: IOPT_NMAXEX exceeded. Coarse-mesh solution may not have converged"
)
_COVFAIL_WARNING = (
    "Warning: IOPT_NCYCLES exceeded. V-cycle iteration may not have converged"
)


def _cached_engine(
    hierarchy, bcs, ms, du_max, dtype, shard_spec=None, coarse_direct=False,
    compact_smoother=True, use_pallas="off", operator=None,
):
    key = (
        hierarchy, bcs, ms, du_max, jnp.dtype(dtype).name, shard_spec,
        coarse_direct, compact_smoother, use_pallas, operator,
    )
    eng = _ENGINE_CACHE.get(key)
    if eng is None:
        eng = MGEngine(
            hierarchy,
            bcs,
            ms=ms,
            du_max=du_max,
            dtype=dtype,
            shard_spec=shard_spec,
            coarse_direct=coarse_direct,
            compact_smoother=compact_smoother,
            use_pallas=use_pallas,
            operator=operator,
        )
        _ENGINE_CACHE.put(key, eng)
    return eng


class PoissonBVP:
    """A reusable handle for one Poisson BVP configuration — the analogue of
    ``MG_HANDLE`` + ``solve_poisson_bvp`` (reference usage pattern:
    tests/unit_tests/unit_test_2D_solve.f90:202-211).

    Parameters:
      hierarchy: static level metadata (shapes, meshes, spacings).
      bcs: per-axis ("N"/"D", "N"/"D") homogeneous boundary conditions,
        ordered like the array axes (C order).
      options: solver options; ``options.precision`` picks the mode.
    """

    def __init__(
        self,
        hierarchy: GridHierarchy,
        bcs: Sequence[Sequence[str]],
        options: Options = Options(),
        shard_spec=None,
        operator=None,
    ):
        self.h = hierarchy
        self.bcs = stencils.validate_bcs(bcs, hierarchy.ndim)
        self.options = options
        self.shard_spec = shard_spec
        # Injected operator (mg/operator.py): every path below —
        # fp64/fp32 cycles, the mixed defect residual, the coarse solve
        # — routes through MGEngine and therefore through the operator.
        # The Pallas/df fast paths encode the Poisson stencil, so they
        # are forced off here and in the engine.
        self.operator = operator
        self.mode = options.resolve_precision()
        if self.mode not in ("fp64", "mixed", "fp32"):
            raise ValueError(f"unknown precision mode {self.mode!r}")
        self.outer_dtype = jnp.float32 if self.mode == "fp32" else jnp.float64
        self.inner_dtype = jnp.float64 if self.mode == "fp64" else jnp.float32
        du_max = options.du_max
        cs = getattr(options, "coarse_solver", "auto")
        coarse_direct = cs == "direct" or (cs == "auto" and self.mode != "fp64")
        compact = getattr(options, "smoother", "auto") != "masked"
        from ..utils.compat import resolve_use_pallas

        use_pallas = resolve_use_pallas(getattr(options, "use_pallas", "auto"))
        if operator is not None:
            use_pallas = "off"
        self._inner = _cached_engine(
            hierarchy,
            self.bcs,
            options.ms,
            du_max,
            self.inner_dtype,
            shard_spec,
            coarse_direct,
            compact,
            use_pallas,
            operator,
        )
        self._outer = (
            self._inner
            if self.inner_dtype == self.outer_dtype
            else _cached_engine(
                hierarchy, self.bcs, options.ms, du_max, self.outer_dtype,
                shard_spec, operator=operator,
            )
        )
        self._all_neumann = (
            operator.is_singular(self.bcs)
            if operator is not None
            else stencils.is_all_neumann(self.bcs)
        )
        # Mixed mode runs V-cycles in defect groups of up to this many
        # inner f32 cycles per f64 defect (Options.mixed_inner_max);
        # direct modes always 1.  Checkpointed solves pass 1 explicitly.
        self._inner_max = (
            max(1, int(getattr(options, "mixed_inner_max", 6)))
            if self.mode == "mixed"
            else 1
        )
        # Double-float defect mode: the outer iterate/rhs live as f32
        # pairs and the defect residual runs in the compensated Pallas
        # kernel (ops/pallas_df.py) instead of emulated-f64 XLA.
        self._df = False
        self._df_res = self._df_res_zero = None
        self._df_upd = self._df_upd_zero = None
        md = getattr(options, "mixed_defect", "auto")
        if md not in ("auto", "f64", "df32"):
            raise ValueError(f"unknown mixed_defect {md!r}")
        if (
            self.mode == "mixed"
            and md != "f64"
            and hierarchy.ndim == 3
            and not self._all_neumann
            and shard_spec is None
        ):
            from ..ops import pallas_df
            from .engine import _pallas_min_points

            interp = use_pallas == "interpret"
            want = (
                use_pallas in ("on", "interpret")
                if md == "auto"
                else use_pallas != "off"
            )
            # On a padded inner engine the pair lives on WORK storage:
            # the kernel handles real-face boundaries (real_shape) and
            # the per-group pad/unpad passes disappear — this is what
            # brings the df32 defect to unaligned sizes like 220^3.
            w0 = tuple(self._inner._work_shapes[0])
            rs = (
                tuple(hierarchy.fine_shape)
                if w0 != tuple(hierarchy.fine_shape)
                else None
            )
            if (
                want
                and int(np.prod(hierarchy.fine_shape)) >= _pallas_min_points()
                and pallas_df.df_residual_supported(
                    w0, jnp.float32, interpret=interp, real_shape=rs
                )
            ):
                self._df_res = pallas_df.df_residual_3d(
                    self.bcs, hierarchy.dq[0], w0,
                    zero_rhs=False, interpret=interp, real_shape=rs,
                )
                self._df_res_zero = pallas_df.df_residual_3d(
                    self.bcs, hierarchy.dq[0], w0,
                    zero_rhs=True, interpret=interp, real_shape=rs,
                )
                # Update-fused variants (may be None under the larger
                # VMEM footprint): the previous group's correction is
                # applied in-kernel, killing the standalone df_add pass.
                self._df_upd = pallas_df.df_residual_3d(
                    self.bcs, hierarchy.dq[0], w0,
                    zero_rhs=False, interpret=interp, real_shape=rs,
                    update=True,
                )
                self._df_upd_zero = pallas_df.df_residual_3d(
                    self.bcs, hierarchy.dq[0], w0,
                    zero_rhs=True, interpret=interp, real_shape=rs,
                    update=True,
                )
                self._df = self._df_res is not None
        self.df_defect = self._df
        self._solve_jit = jax.jit(self._solve_impl, static_argnums=(6,))
        # Donating variant for internally-owned buffers (the caller's u0
        # is invalidated) and a zero-rhs variant that materializes the
        # right-hand side inside the program (saves a full-grid buffer +
        # upload for the common rhs == 0 solves).
        self._solve_jit_donate = jax.jit(
            self._solve_impl, donate_argnums=(0,), static_argnums=(6,)
        )
        self._solve_zero_rhs_jit = jax.jit(
            self._solve_impl_zero_rhs, static_argnums=(5,)
        )
        self._solve_zero_rhs_jit_donate = jax.jit(
            self._solve_impl_zero_rhs, donate_argnums=(0,), static_argnums=(5,)
        )
        self._solve_hist_jit = jax.jit(self._solve_hist_impl, static_argnums=(6,))
        self._solve_batch_jit = None
        self._vcycle_jit = jax.jit(self._inner.t_vcycle)
        self._two_grid_jit = jax.jit(self._inner.t_two_grid)
        self._one_grid_jit = jax.jit(self._inner.t_one_grid)

    # ------------------------------------------------------------------

    def _mixed_group(
        self, u, rhs, ex_tol, nmax_exact, vc_tol, it, nmax, inner_max, hist
    ):
        """One f64 defect correction supported by UP TO ``inner_max``
        f32 V-cycles (TPU mixed-precision core; the f64 defect pass is
        software-emulated and ~6x an f32 V-cycle, so it is amortized
        over every inner cycle it can support).

        The inner loop keeps cycling on the SAME scaled defect while the
        f32 iteration still converges well (du_e < 0.5 * previous — the
        f32 resolution stall test), the per-cycle du (= s * du_e, the
        same inter-iterate metric the reference stops on) is >= vc_tol,
        and the global V-cycle budget ``nmax`` has room.  Each inner
        V-cycle is an implied outer iterate u + s*e_k, so the per-cycle
        du sequence, cycle counting, and du-history entries all keep
        their reference semantics (ndsm_poisson.f90:116-141); only the
        frequency of f64 re-measurement changes, which perturbs iterates
        at f64 rounding level.  With inner_max=1 this IS the strict
        defect-correction iteration.

        Returns (u_new, noconv, du_last, ncycles, hist).
        """
        eng64, eng32 = self._outer, self._inner
        r0 = eng64.t_residual(u, rhs, 0)
        s = jnp.max(jnp.abs(r0))
        s_safe = jnp.where(s > 0, s, jnp.ones_like(s))
        r32 = (r0 / s_safe).astype(self.inner_dtype)
        # Padded inner engine (unaligned sizes): the correction iterate
        # and scaled defect live on the kernel's work shape across the
        # WHOLE group loop — one pad here, one slice at the end.
        r32 = eng32.t_pad0(r32)
        eps32 = 32.0 * float(np.finfo(np.float32).eps)
        ex_tol_eff = jnp.maximum(ex_tol, eps32)
        e0 = jnp.zeros(eng32._work_shapes[0], dtype=self.inner_dtype)
        big32 = jnp.asarray(jnp.finfo(np.float32).max, dtype=jnp.float32)

        def du_of(du_e):
            d = s_safe * du_e.astype(self.outer_dtype)
            return jnp.where(s > 0, d, jnp.zeros_like(d))

        def cond(c):
            _, du_e, du_prev, k, _, _ = c
            first = k == 0
            # No rate-based stall test: a du-ratio threshold is a
            # rounding knife-edge that lets batched/standalone schedules
            # diverge.  inner_max bounds the group deterministically
            # (sized to f32's ~7-decade headroom per defect), so per-lane
            # sequences stay identical across drivers.
            more = jnp.logical_and(
                du_of(du_e) >= vc_tol,
                jnp.logical_and(it + k < nmax, k < inner_max),
            )
            return jnp.logical_or(first, more)

        def body(c):
            e, du_e, _, k, nc, h = c
            # du fused into the final post-smooth kernel where supported
            # (max metric; bitwise the t_metric value — see t_vcycle_du).
            e_new, noconv, du_new = eng32.t_vcycle_du(
                e, r32, ex_tol_eff, nmax_exact, e
            )
            if h is not None:
                h = h.at[it + k].set(du_of(du_new))
            return (e_new, du_new, du_e, k + 1, nc | noconv, h)

        if inner_max == 1:
            e32, du_e, _, k, noconv, hist = body(
                (e0, big32, big32, jnp.int32(0), jnp.asarray(False), hist)
            )
        else:
            init = (e0, big32, big32, jnp.int32(0), jnp.asarray(False), hist)
            e32, du_e, _, k, noconv, hist = lax.while_loop(cond, body, init)
        e32 = eng32.t_unpad0(e32)
        e = e32.astype(self.outer_dtype) * s_safe
        e = jnp.where(s > 0, e, jnp.zeros_like(e))
        u_new = u + e
        if self._all_neumann:
            u_new = u_new - jnp.mean(u_new)
        return u_new, noconv, du_of(du_e), k, hist

    def _mixed_group_df(
        self, uh, ul, e_prev, rhsp, ex_tol, nmax_exact, vc_tol, it, nmax,
        inner_max, hist,
    ):
        """``_mixed_group`` with the outer state as an (hi, lo) f32 pair
        and the defect computed by the double-float Pallas kernel — same
        group semantics, ~2^-48 instead of 2^-52 outer precision (du
        floor ~1e-13; see ops/pallas_df.py).  ``rhsp`` is the rhs pair,
        or None for the in-kernel zero-rhs variant.

        Pending-correction flow: ``e_prev`` (the PREVIOUS group's
        correction, or None for the first group) is applied to the pair
        inside the residual kernel when the update-fused variant exists
        (bitwise the XLA df_add), and the group returns its own
        correction UNAPPLIED — the driver applies the final one.  The
        iterate sequence is bitwise-identical to the unfused pipeline.

        Unlike ``_mixed_group``, the inner V-cycles run on the UNSCALED
        defect: f32 resolution is relative, so unit-scaling only ever
        mattered for the absolute eps32 coarse-tolerance floor — which
        is scaled by max|r| instead (from the kernel's in-window max
        output; no full-array XLA |r| or scale pass)."""
        from ..ops.pallas_df import df_add

        eng32 = self._inner
        if e_prev is not None:
            upd = self._df_upd_zero if rhsp is None else self._df_upd
            if upd is None:
                uh, ul = df_add(uh, ul, e_prev)
                e_prev = None
            elif rhsp is None:
                r32, mx, uh, ul = upd(uh, ul, e_prev)
            else:
                r32, mx, uh, ul = upd(uh, ul, rhsp[0], rhsp[1], e_prev)
        if e_prev is None:
            if rhsp is None:
                r32, mx = self._df_res_zero(uh, ul)
            else:
                r32, mx = self._df_res(uh, ul, rhsp[0], rhsp[1])
        s = jnp.max(mx).astype(self.outer_dtype)
        # The pair lives on the inner engine's work storage (padded or
        # not), so r32 is already work-shaped — no pad/unpad passes.
        eps32 = 32.0 * float(np.finfo(np.float32).eps)
        ex_tol_eff = jnp.maximum(ex_tol, eps32 * s)
        e0 = jnp.zeros(eng32._work_shapes[0], dtype=self.inner_dtype)
        big32 = jnp.asarray(jnp.finfo(np.float32).max, dtype=jnp.float32)

        def du_of(du_e):
            return du_e.astype(self.outer_dtype)

        def cond(c):
            _, du_e, du_prev, k, _, _ = c
            first = k == 0
            more = jnp.logical_and(
                du_of(du_e) >= vc_tol,
                jnp.logical_and(it + k < nmax, k < inner_max),
            )
            return jnp.logical_or(first, more)

        def body(c):
            e, du_e, _, k, nc, h = c
            e_new, noconv, du_new = eng32.t_vcycle_du(
                e, r32, ex_tol_eff, nmax_exact, e
            )
            if h is not None:
                h = h.at[it + k].set(du_of(du_new))
            return (e_new, du_new, du_e, k + 1, nc | noconv, h)

        if inner_max == 1:
            e32, du_e, _, k, noconv, hist = body(
                (e0, big32, big32, jnp.int32(0), jnp.asarray(False), hist)
            )
        else:
            init = (e0, big32, big32, jnp.int32(0), jnp.asarray(False), hist)
            e32, du_e, _, k, noconv, hist = lax.while_loop(cond, body, init)
        if self.options.debug:
            from ..utils.compat import callbacks_supported

            if callbacks_supported():
                jax.debug.print(
                    "DEBUG(solve_poisson_bvp): Solution delta: {du}",
                    du=du_of(du_e),
                )
        return uh, ul, e32, noconv, du_of(du_e), k, hist

    def _solve_df_core(
        self, u0, rhs, vc_tol, ex_tol, nmax, nmax_exact, inner_max, hist_len
    ):
        """Outer loop of ``_solve_impl``/``_solve_hist_impl`` in
        double-float defect mode: the iterate is carried as an f32 pair;
        ``rhs`` may be None (zero-rhs kernel variant).  Semantics match
        ``_solve_impl`` with outer precision ~2^-48 instead of 2^-52."""
        from ..ops.pallas_df import df_add, df_decompose, df_reconstruct

        inner_max = max(1, int(inner_max))
        pad0 = self._inner.t_pad0
        vc_tol = jnp.asarray(vc_tol).astype(self.outer_dtype)
        uh0, ul0 = (pad0(c) for c in df_decompose(u0.astype(self.outer_dtype)))
        rhsp = (
            None
            if rhs is None
            else tuple(pad0(c) for c in df_decompose(rhs.astype(self.outer_dtype)))
        )
        with_hist = hist_len is not None
        if with_hist:
            nmax = jnp.minimum(nmax, jnp.int32(hist_len))
            hist0 = jnp.full((hist_len,), jnp.nan, dtype=self.outer_dtype)
        else:
            hist0 = None

        def cond(c):
            _, _, _, du, it, _, _ = c
            return jnp.logical_and(it < nmax, du >= vc_tol)

        def body(c):
            uh, ul, e, du, it, hist, flag = c
            uh, ul, e, noconv, du, ncyc, hist = self._mixed_group_df(
                uh, ul, e, rhsp, ex_tol, nmax_exact, vc_tol, it, nmax,
                inner_max, hist,
            )
            return (uh, ul, e, du, it + ncyc, hist, flag | noconv)

        # First group (no pending correction), then the fused loop; the
        # final group's correction is applied once after exit.
        uh, ul, e, noconv0, du0, k0, hist = self._mixed_group_df(
            uh0, ul0, None, rhsp, ex_tol, nmax_exact, vc_tol,
            jnp.int32(0), nmax, inner_max, hist0,
        )
        init = (uh, ul, e, du0, jnp.asarray(k0, jnp.int32), hist, noconv0)
        uh, ul, e, du, it, hist, flag = lax.while_loop(cond, body, init)
        uh, ul = df_add(uh, ul, e)
        u = self._inner.t_unpad0(df_reconstruct(uh, ul, self.outer_dtype))
        # nmax < 1 contract (reference DO-loop semantics): no cycles run,
        # u0 returned untouched — the unconditional first group above is
        # discarded here.
        ran = nmax >= 1
        u = jnp.where(ran, u, u0.astype(self.outer_dtype))
        big = jnp.asarray(jnp.finfo(self.outer_dtype).max, self.outer_dtype)
        du = jnp.where(ran, du, big)
        it = jnp.where(ran, it, jnp.int32(0))
        flag = jnp.logical_and(flag, ran)
        ierr = jnp.where(du < vc_tol, IERR_SUCCESS, IERR_COVFAIL).astype(jnp.int32)
        if with_hist:
            return u, du, it, ierr, hist, flag
        return u, du, it, ierr, flag

    def _solve_impl_zero_rhs(self, u0, vc_tol, ex_tol, nmax, nmax_exact, inner_max):
        if self._df:
            return self._solve_df_core(
                u0, None, vc_tol, ex_tol, nmax, nmax_exact, inner_max, None
            )
        rhs = jnp.zeros(self.h.fine_shape, dtype=self.outer_dtype)
        return self._solve_impl(u0, rhs, vc_tol, ex_tol, nmax, nmax_exact, inner_max)

    def _solve_impl(self, u0, rhs, vc_tol, ex_tol, nmax, nmax_exact, inner_max):
        """Outer V-cycle loop (reference: VCYCLE_LOOP,
        ndsm_poisson.f90:116-141): iterate until the selected inter-cycle
        metric du is < vc_tol, or nmax cycles have run (-> IERR_COVFAIL).
        Also accumulates the coarse-solve non-convergence flag across
        cycles (reference warning: ndsm_multigrid_core.f90:796-798).

        In mixed mode, cycles run in defect GROUPS (``_mixed_group``):
        ``it`` still counts individual V-cycles and ``du`` is still the
        latest per-V-cycle inter-iterate metric."""
        if self._df:
            return self._solve_df_core(
                u0, rhs, vc_tol, ex_tol, nmax, nmax_exact, inner_max, None
            )
        mixed = self.mode == "mixed"
        inner_max = max(1, int(inner_max))
        big = jnp.asarray(jnp.finfo(self.outer_dtype).max, dtype=self.outer_dtype)
        vc_tol = jnp.asarray(vc_tol).astype(self.outer_dtype)

        def cond(c):
            _, du, it, _ = c
            return jnp.logical_and(it < nmax, du >= vc_tol)

        def body(c):
            u, _, it, flag = c
            if mixed:
                u_new, noconv, du, ncyc, _ = self._mixed_group(
                    u, rhs, ex_tol, nmax_exact, vc_tol, it, nmax, inner_max, None
                )
            else:
                u_new, noconv, du = self._inner.t_vcycle_du(
                    u, rhs, ex_tol, nmax_exact, u
                )
                ncyc = jnp.int32(1)
            if self.options.debug:
                from ..utils.compat import callbacks_supported

                if callbacks_supported():
                    jax.debug.print(
                        "DEBUG(solve_poisson_bvp): Solution delta: {du}", du=du
                    )
            return (u_new, du, it + ncyc, flag | noconv)

        init = (u0, big, jnp.asarray(0, dtype=jnp.int32), jnp.asarray(False))
        u, du, it, flag = lax.while_loop(cond, body, init)
        ierr = jnp.where(du < vc_tol, IERR_SUCCESS, IERR_COVFAIL).astype(jnp.int32)
        return u, du, it, ierr, flag

    def _solve_hist_impl(self, u0, rhs, vc_tol, ex_tol, nmax, nmax_exact, hist_len):
        """``_solve_impl`` plus a per-cycle du trace in a fixed-size buffer
        (the reference's debug-mode per-cycle "Solution delta" output,
        ndsm_poisson.f90:129-135, as a first-class return — usable even on
        platforms without host callbacks).  ``hist_len`` is static; cycles
        are capped at min(nmax, hist_len).  The iterate sequence is
        identical to ``_solve_impl`` (mixed defect groups write one
        history entry per inner V-cycle)."""
        if self._df:
            return self._solve_df_core(
                u0, rhs, vc_tol, ex_tol, nmax, nmax_exact, self._inner_max, hist_len
            )
        mixed = self.mode == "mixed"
        inner_max = self._inner_max
        big = jnp.asarray(jnp.finfo(self.outer_dtype).max, dtype=self.outer_dtype)
        vc_tol = jnp.asarray(vc_tol).astype(self.outer_dtype)
        nmax = jnp.minimum(nmax, jnp.int32(hist_len))

        def cond(c):
            _, du, it, _, _ = c
            return jnp.logical_and(it < nmax, du >= vc_tol)

        def body(c):
            u, _, it, hist, flag = c
            if mixed:
                u_new, noconv, du, ncyc, hist = self._mixed_group(
                    u, rhs, ex_tol, nmax_exact, vc_tol, it, nmax, inner_max, hist
                )
            else:
                u_new, noconv, du = self._inner.t_vcycle_du(
                    u, rhs, ex_tol, nmax_exact, u
                )
                hist = hist.at[it].set(du)
                ncyc = jnp.int32(1)
            return (u_new, du, it + ncyc, hist, flag | noconv)

        hist0 = jnp.full((hist_len,), jnp.nan, dtype=self.outer_dtype)
        init = (u0, big, jnp.asarray(0, dtype=jnp.int32), hist0, jnp.asarray(False))
        u, du, it, hist, flag = lax.while_loop(cond, body, init)
        converged = du < vc_tol
        ierr = jnp.where(converged, IERR_SUCCESS, IERR_COVFAIL).astype(jnp.int32)
        return u, du, it, ierr, hist, flag

    def _solve_batch_impl(self, u0, rhs, vc_tol, ex_tol, nmax, nmax_exact):
        """Lane-masked batched variant of ``_solve_impl``: solves B
        independent problems of identical configuration (u0, rhs shaped
        (B, *grid)) in ONE program.  A converged lane is frozen, so each
        lane's iterate/metric sequence is identical to a standalone solve;
        the loop runs until every lane converges or hits nmax.  Requires a
        while_loop-free coarse solve (coarse_direct) so the cycle can be
        vmapped without cross-lane iteration coupling.  Mixed defect
        groups vmap too (the lane-wise inner while_loops run lock-step
        under the batching rule with per-lane freezing)."""
        mixed = self.mode == "mixed"
        inner_max = self._inner_max
        big = jnp.asarray(jnp.finfo(self.outer_dtype).max, dtype=self.outer_dtype)
        vc_tol = jnp.asarray(vc_tol).astype(self.outer_dtype)
        B = u0.shape[0]

        if mixed:
            groupB = jax.vmap(
                lambda u, r, it: self._mixed_group(
                    u, r, ex_tol, nmax_exact, vc_tol, it, nmax, inner_max, None
                )
            )
        else:
            cycleB = jax.vmap(
                lambda u, r: self._inner.t_vcycle_du(u, r, ex_tol, nmax_exact, u)
            )

        def active_of(du, it):
            return jnp.logical_and(it < nmax, du >= vc_tol)

        def cond(c):
            _, du, it, _ = c
            return jnp.any(active_of(du, it))

        def body(c):
            u, du, it, flag = c
            active = active_of(du, it)
            if mixed:
                u_new, noconv, du_new, ncyc, _ = groupB(u, rhs, it)
            else:
                u_new, noconv, du_new = cycleB(u, rhs)
                ncyc = jnp.ones((B,), jnp.int32)
            sel = active.reshape((B,) + (1,) * (u.ndim - 1))
            u = jnp.where(sel, u_new, u)
            du = jnp.where(active, du_new, du)
            it = it + jnp.where(active, ncyc, 0)
            return (u, du, it, flag | (noconv & active))

        init = (
            u0,
            jnp.full((B,), big),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), bool),
        )
        u, du, it, flag = lax.while_loop(cond, body, init)
        converged = du < vc_tol
        ierr = jnp.where(converged, IERR_SUCCESS, IERR_COVFAIL).astype(jnp.int32)
        return u, du, it, ierr, flag

    def solve_batch(
        self,
        u0s,
        rhss,
        *,
        vc_tol: Optional[float] = None,
        ex_tol: Optional[float] = None,
        ncycles_max: Optional[int] = None,
        niterex_max: Optional[int] = None,
        names: Optional[Sequence[str]] = None,
    ):
        """Solve B same-configuration problems in one compiled program.
        Falls back to sequential ``solve`` when the coarse solver is the
        reference relax loop (its while_loop cannot be lane-masked)."""
        o = self.options
        vc_tol = o.vc_tol if vc_tol is None else vc_tol
        ex_tol = o.ex_tol if ex_tol is None else ex_tol
        nmax = o.ncycles_max if ncycles_max is None else ncycles_max
        nmax_exact = o.niterex_max if niterex_max is None else niterex_max
        names = names or [""] * len(u0s)

        if not self._inner.coarse_direct:
            out = [
                self.solve(
                    u0,
                    rhs,
                    vc_tol=vc_tol,
                    ex_tol=ex_tol,
                    ncycles_max=nmax,
                    niterex_max=nmax_exact,
                    name=nm,
                )
                for u0, rhs, nm in zip(u0s, rhss, names)
            ]
            return [u for u, _ in out], [i for _, i in out]

        import time as _time

        u0 = jnp.stack([jnp.asarray(u, self.outer_dtype) for u in u0s])
        rhs = jnp.stack([jnp.asarray(r, self.outer_dtype) for r in rhss])
        if self._solve_batch_jit is None:
            self._solve_batch_jit = jax.jit(self._solve_batch_impl)
        t0 = _time.perf_counter()
        scalars = (
            jnp.float64(vc_tol),
            jnp.float64(ex_tol),
            jnp.int32(nmax),
            jnp.int32(nmax_exact),
        )
        try:
            u, du, it, ierr, flag = self._solve_batch_jit(u0, rhs, *scalars)
        except Exception as e:
            if not (self._pallas_active() and self._is_kernel_compile_error(e)):
                raise
            return self._kernel_fallback().solve_batch(
                u0s,
                rhss,
                vc_tol=vc_tol,
                ex_tol=ex_tol,
                ncycles_max=nmax,
                niterex_max=nmax_exact,
                names=names,
            )
        du, it, ierr, flag = jax.device_get((du, it, ierr, flag))  # one host sync
        wall = _time.perf_counter() - t0
        # wall_time is the whole batched program's wall (lanes run
        # simultaneously — there is no honest per-lane wall); batch_size
        # flags the sharing for downstream accounting.
        infos = [
            SolveInfo(
                ierr=int(ierr[k]),
                du_last=float(du[k]),
                cycles=int(it[k]),
                name=names[k],
                wall_time=wall,
                coarse_noconv=bool(flag[k]),
                batch_size=len(u0s),
            )
            for k in range(len(u0s))
        ]
        self._post_warnings(infos)
        return list(u), infos

    # ------------------------------------------------------------------

    def _pallas_active(self) -> bool:
        return getattr(self._inner, "use_pallas", "off") != "off"

    #: transient backend/transport failures: retrying on the XLA path
    #: would not help (the fallback itself needs compiles through the
    #: same backend) and would double the outage cost while replacing
    #: the original diagnostic.
    _TRANSIENT_MARKERS = (
        "Unavailable",
        "UNAVAILABLE",
        "DEADLINE",
        "read body",
        "connection",
        "Connection",
    )

    @classmethod
    def _is_kernel_compile_error(cls, e: Exception) -> bool:
        """Kernel-stack failures worth one retry on the XLA smoother.

        Typed check first (VERDICT r4: substring matching is fragile
        across toolchains): Mosaic lowering / VMEM exhaustion surface
        as ``jax.errors.JaxRuntimeError`` from the backend compile.
        But JaxRuntimeError also covers EXECUTION-time failures
        (backend outage, transfer errors) where a fallback rebuild
        would re-fail after minutes of extra compiles — those transient
        markers are excluded and re-raise immediately.  The substring
        match is kept for toolchains that wrap the failure in a plain
        RuntimeError (the axon remote-compile helper does)."""
        s = str(e)
        if any(k in s for k in cls._TRANSIENT_MARKERS):
            return False
        try:
            from jax.errors import JaxRuntimeError

            if isinstance(e, JaxRuntimeError):
                return True
        except ImportError:  # pragma: no cover - very old jax
            pass
        return any(
            k in s
            for k in ("Mosaic", "remote_compile", "vmem", "RESOURCE_EXHAUSTED")
        )

    def _xla_fallback(self) -> "PoissonBVP":
        """Same configuration with the Pallas smoother disabled — used
        when a production-shape kernel fails to compile at runtime (the
        small-shape probe cannot rule out e.g. VMEM exhaustion)."""
        fb = getattr(self, "_fallback_bvp", None)
        if fb is None:
            fb = PoissonBVP(
                self.h,
                self.bcs,
                dataclasses.replace(self.options, use_pallas="off"),
                shard_spec=self.shard_spec,
                operator=self.operator,
            )
            self._fallback_bvp = fb
        return fb

    def _kernel_fallback(self) -> "PoissonBVP":
        """Compile-failure recovery: retry with the Pallas stack
        disabled (the XLA smoother), with a host-side warning."""
        fb = self._xla_fallback()
        warn(
            "ndsm_tpu: Pallas kernel failed to compile for "
            f"{self.h.fine_shape}; retrying with the XLA smoother"
        )
        return fb

    def solve(self, u0, rhs, **kw):
        """See ``_solve_checked`` for the full signature.  Falls back to
        the XLA smoother if the fused Pallas kernel fails to compile for
        this configuration (nothing has executed at that point)."""
        try:
            return self._solve_checked(u0, rhs, **kw)
        except Exception as e:
            if not (self._pallas_active() and self._is_kernel_compile_error(e)):
                raise
            return self._kernel_fallback().solve(u0, rhs, **kw)

    def _solve_checked(
        self,
        u0,
        rhs,
        *,
        vc_tol: Optional[float] = None,
        ex_tol: Optional[float] = None,
        ncycles_max: Optional[int] = None,
        niterex_max: Optional[int] = None,
        name: str = "",
        donate: bool = False,
        zero_rhs: bool = False,
        history: bool = False,
    ) -> Tuple[jax.Array, SolveInfo]:
        """Solve ``laplace(u) = rhs`` starting from ``u0`` (which also
        carries inhomogeneous Dirichlet data on "D" faces — those values
        are held fixed, reference: ndsm_poisson.f90:591-594).

        Returns (u, SolveInfo).  Tolerances default to the handle options.
        ``donate=True`` invalidates the caller's u0 buffer (memory-tight
        large solves); ``zero_rhs=True`` ignores ``rhs`` and materializes
        a zero right-hand side inside the program; ``history=True``
        additionally records the per-cycle du trace in
        ``SolveInfo.du_history`` (the reference's debug-mode per-cycle
        "Solution delta" lines, ndsm_poisson.f90:129-135).
        """
        o = self.options
        vc_tol = o.vc_tol if vc_tol is None else vc_tol
        ex_tol = o.ex_tol if ex_tol is None else ex_tol
        nmax = o.ncycles_max if ncycles_max is None else ncycles_max
        nmax_exact = o.niterex_max if niterex_max is None else niterex_max

        u0 = jnp.asarray(u0, dtype=self.outer_dtype)
        if self.shard_spec is not None:
            u0 = self.shard_spec.put(u0)
        if u0.shape != self.h.fine_shape:
            raise ValueError(
                f"u0 shape {u0.shape} != fine grid {self.h.fine_shape}"
            )
        import time as _time

        t0 = _time.perf_counter()
        scalars = (
            jnp.float64(vc_tol),
            jnp.float64(ex_tol),
            jnp.int32(nmax),
            jnp.int32(nmax_exact),
        )
        hist = None
        if history:
            rhs_arr = (
                jnp.zeros(self.h.fine_shape, dtype=self.outer_dtype)
                if zero_rhs
                else jnp.asarray(rhs, dtype=self.outer_dtype)
            )
            if rhs_arr.shape != self.h.fine_shape:
                raise ValueError(
                    f"rhs shape {rhs_arr.shape} != fine grid {self.h.fine_shape}"
                )
            u, du, it, ierr, hist, flag = self._solve_hist_jit(
                u0, rhs_arr, *scalars, int(nmax)
            )
            du, it, ierr, hist, flag = jax.device_get((du, it, ierr, hist, flag))
        elif zero_rhs:
            fn = (
                self._solve_zero_rhs_jit_donate
                if donate
                else self._solve_zero_rhs_jit
            )
            u, du, it, ierr, flag = fn(u0, *scalars, self._inner_max)
            du, it, ierr, flag = jax.device_get((du, it, ierr, flag))  # one host sync
        else:
            rhs = jnp.asarray(rhs, dtype=self.outer_dtype)
            if self.shard_spec is not None:
                rhs = self.shard_spec.put(rhs)
            if rhs.shape != self.h.fine_shape:
                raise ValueError(
                    f"rhs shape {rhs.shape} != fine grid {self.h.fine_shape}"
                )
            fn = self._solve_jit_donate if donate else self._solve_jit
            u, du, it, ierr, flag = fn(u0, rhs, *scalars, self._inner_max)
            du, it, ierr, flag = jax.device_get((du, it, ierr, flag))  # one host sync
        info = SolveInfo(
            ierr=int(ierr),
            du_last=float(du),
            cycles=int(it),
            name=name,
            wall_time=_time.perf_counter() - t0,
            coarse_noconv=bool(flag),
            du_history=(
                None if hist is None else tuple(float(v) for v in hist[: int(it)])
            ),
        )
        self._post_warnings([info])
        return u, info

    @staticmethod
    def _post_warnings(infos) -> None:
        """Print the reference's convergence warnings from the host once
        results are fetched — identical behavior on every platform
        (reference: ndsm_multigrid_core.f90:796-798; ndsm_poisson.f90:
        147-150, which print per-occurrence; here once per solve)."""
        if any(i.coarse_noconv for i in infos):
            warn(_COARSE_NOCONV_WARNING)
        if any(i.ierr != IERR_SUCCESS for i in infos):
            warn(_COVFAIL_WARNING)

    def solve_checkpointed(
        self,
        u0,
        rhs,
        *,
        checkpoint_path: str,
        checkpoint_every: int = 32,
        vc_tol: Optional[float] = None,
        ex_tol: Optional[float] = None,
        ncycles_max: Optional[int] = None,
        niterex_max: Optional[int] = None,
        name: str = "",
    ) -> Tuple[jax.Array, SolveInfo]:
        """Resumable solve: V-cycles run in chunks of ``checkpoint_every``
        with the current iterate written atomically to ``checkpoint_path``
        (.npz) between chunks; an interrupted solve restarts from the last
        checkpoint.  The iterate sequence is independent of
        ``checkpoint_every`` — mixed mode pins the strict
        one-V-cycle-per-defect iteration (inner_max=1) here so a chunk
        boundary can never split a defect group (for fp64/fp32 the
        sequence is identical to ``solve``; the reference has no
        checkpointing — solves are minutes-scale; for large multi-chip
        problems this closes that gap, SURVEY.md §5)."""
        import os

        o = self.options
        vc_tol = o.vc_tol if vc_tol is None else vc_tol
        ex_tol = o.ex_tol if ex_tol is None else ex_tol
        nmax = o.ncycles_max if ncycles_max is None else ncycles_max
        nmax_exact = o.niterex_max if niterex_max is None else niterex_max

        u = jnp.asarray(u0, dtype=self.outer_dtype)
        cycles_done = 0
        du = float("inf")
        if os.path.exists(checkpoint_path):
            ck = np.load(checkpoint_path)
            if tuple(ck["shape"]) == tuple(self.h.fine_shape):
                u = jnp.asarray(ck["u"], dtype=self.outer_dtype)
                cycles_done = int(ck["cycles"])
                du = float(ck["du"])

        ierr = IERR_COVFAIL
        coarse_noconv = False
        while cycles_done < nmax:
            if du < vc_tol:
                ierr = IERR_SUCCESS
                break
            chunk = min(checkpoint_every, nmax - cycles_done)
            # inner_max=1: strict one-V-cycle-per-defect groups, so a
            # chunk boundary can never split an inner loop and the
            # iterate sequence is independent of checkpoint_every.
            u, du_j, it_j, _, flag = self._solve_jit(
                u,
                jnp.asarray(rhs, dtype=self.outer_dtype),
                jnp.float64(vc_tol),
                jnp.float64(ex_tol),
                jnp.int32(chunk),
                jnp.int32(nmax_exact),
                1,
            )
            du = float(du_j)
            cycles_done += int(it_j)
            coarse_noconv = coarse_noconv or bool(flag)
            # np.savez appends ".npz" when missing — name the temp file
            # with the suffix up front so the atomic os.replace is exact.
            tmp = checkpoint_path + ".tmp.npz"
            np.savez(
                tmp,
                u=np.asarray(u),
                cycles=cycles_done,
                du=du,
                shape=np.asarray(self.h.fine_shape),
            )
            os.replace(tmp, checkpoint_path)
        if du < vc_tol:
            ierr = IERR_SUCCESS
        info = SolveInfo(
            ierr=ierr,
            du_last=du,
            cycles=cycles_done,
            name=name,
            coarse_noconv=coarse_noconv,
        )
        self._post_warnings([info])
        return u, info

    # Reduced-cycle drivers, handy for operator-isolation tests
    # (reference: one_grid/two_grid, ndsm_multigrid_core.f90:385-441).

    def vcycle(self, u, rhs, *, ex_tol=None, niterex_max=None):
        o = self.options
        u, _ = self._vcycle_jit(
            jnp.asarray(u, self.inner_dtype),
            jnp.asarray(rhs, self.inner_dtype),
            jnp.float64(o.ex_tol if ex_tol is None else ex_tol),
            jnp.int32(o.niterex_max if niterex_max is None else niterex_max),
        )
        return u

    def two_grid(self, u, rhs, *, ex_tol=None, niterex_max=None):
        o = self.options
        u, _ = self._two_grid_jit(
            jnp.asarray(u, self.inner_dtype),
            jnp.asarray(rhs, self.inner_dtype),
            jnp.float64(o.ex_tol if ex_tol is None else ex_tol),
            jnp.int32(o.niterex_max if niterex_max is None else niterex_max),
        )
        return u

    def one_grid(self, u, rhs, *, ex_tol=None, niterex_max=None):
        o = self.options
        u, _ = self._one_grid_jit(
            jnp.asarray(u, self.inner_dtype),
            jnp.asarray(rhs, self.inner_dtype),
            jnp.float64(o.ex_tol if ex_tol is None else ex_tol),
            jnp.int32(o.niterex_max if niterex_max is None else niterex_max),
        )
        return u


_BVP_CACHE: BoundedCache = BoundedCache(maxsize=32)


def get_poisson_bvp(
    hierarchy: GridHierarchy,
    bcs: Sequence[Sequence[str]],
    options: Options = Options(),
    shard_spec=None,
    operator=None,
) -> PoissonBVP:
    """Memoized PoissonBVP construction: repeated solves with the same
    configuration reuse the compiled program."""
    bcs_t = tuple(tuple(b) for b in bcs)
    opt_key = dataclasses.astuple(
        dataclasses.replace(options, vc_tol=0.0, ex_tol=0.0, ncycles_max=0, niterex_max=0)
    )
    key = (hierarchy, bcs_t, opt_key, shard_spec, operator)
    bvp = _BVP_CACHE.get(key)
    if bvp is None:
        bvp = PoissonBVP(
            hierarchy, bcs_t, options, shard_spec=shard_spec, operator=operator
        )
        _BVP_CACHE.put(key, bvp)
    return bvp


def solve_poisson_bvp(
    u0,
    rhs,
    meshes: Sequence[np.ndarray],
    bcs: Sequence[Sequence[str]],
    *,
    ngrids: Optional[int] = None,
    options: Options = Options(),
    operator=None,
) -> Tuple[jax.Array, SolveInfo]:
    """Functional one-shot Poisson solve.

    Solves ``laplace(u) = rhs`` on the uniform per-axis mesh given by
    ``meshes`` (one coordinate vector per array axis) with homogeneous
    "N"/"D" conditions per face; Dirichlet faces take their (possibly
    nonzero) values from ``u0``.  The multigrid hierarchy depth defaults to
    the reference rule ``floor(log2(min(shape)/2))``.

    ``operator`` injects a non-Poisson operator (an
    :class:`~ndsm_tpu.mg.operator.MGOperator`): the same V-cycle
    machinery, stopping rules, precision modes, and error contract then
    solve ``operator[u] = rhs`` — the reference's MG_RELAX/MG_RESIDUAL
    extension point (ndsm_multigrid_core.f90:106-136).
    """
    hierarchy = GridHierarchy.from_mesh(meshes, ngrids=ngrids)
    bvp = get_poisson_bvp(hierarchy, bcs, options, operator=operator)
    # Tolerances/limits are passed per-call: the cached handle may have
    # been built with different (traced, non-recompiling) values.
    return bvp.solve(
        u0,
        rhs,
        vc_tol=options.vc_tol,
        ex_tol=options.ex_tol,
        ncycles_max=options.ncycles_max,
        niterex_max=options.niterex_max,
    )
