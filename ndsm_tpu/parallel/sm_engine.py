"""Fully explicit shard_map multigrid solver.

The GSPMD path (ShardSpec + sharding constraints) lets XLA choose the
communication for every op.  This engine instead expresses the ENTIRE
Poisson solve — outer V-cycle loop, smoothing, residual, transfers,
coarse solve, metrics — as one ``shard_map`` program over a 1-D device
mesh with hand-placed collectives, the layout that maps directly onto a
TPU pod slice:

  * every level whose axis-0 extent divides the mesh and exceeds a row
    threshold is block-partitioned along axis 0; smoothing and residual
    exchange one boundary plane per half-sweep with ``lax.ppermute``
    (ICI neighbors), with global-boundary reflection handled by
    global-index masks;
  * sharded->sharded restriction/prolongation contract axis 0 with
    PER-SHARD matrix blocks (precomputed from the coordinate-based
    operators' actual support, including the non-power-of-two drift of
    the reference's floor(n/2) level sizes) over an H-plane halo
    exchange; the remaining axes use the full per-axis matrices locally;
  * at the replication seam (first level that is too small to shard) the
    fine residual is all-gathered once and everything below runs
    replicated — the latency-bound coarse solve never touches the
    network (BASELINE.json north star);
  * convergence metrics are psum/pmax collectives.

Restriction to axis-0-divisible levels keeps the round-1 scope honest;
non-divisible fine levels simply lower the seam.  Results match the
single-device engine to rounding (tests/test_dist.py).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..grids import GridHierarchy
from ..options import IERR_COVFAIL, IERR_SUCCESS, Options, SolveInfo
from ..ops import stencils
from ..ops.transfer import (
    apply_axis_matrices,
    interp_matrix_1d,
    restrict_matrix_1d,
)
from ..mg.coarse import build_coarse_solver_matrix

__all__ = ["ShardedPoissonBVP"]


def _axis0_blocks(M: np.ndarray, ndev: int) -> Tuple[np.ndarray, int, np.ndarray]:
    """Split a (n_out, n_in) axis-0 transfer matrix into per-shard blocks.

    Returns (blocks, H, starts): blocks has shape
    (ndev, n_out/ndev, bf + 2H) where bf = n_in/ndev, H is the halo depth
    covering every shard's actual column support, and blocks[i] acts on
    the shard's local input rows extended by H planes on each side
    (zero-padded beyond the global ends).
    """
    n_out, n_in = M.shape
    bo, bi = n_out // ndev, n_in // ndev
    H = 0
    for i in range(ndev):
        rows = M[i * bo : (i + 1) * bo]
        cols = np.flatnonzero(np.any(rows != 0.0, axis=0))
        if cols.size:
            H = max(H, i * bi - int(cols[0]), int(cols[-1]) + 1 - (i + 1) * bi)
    H = max(H, 0)
    W = bi + 2 * H
    blocks = np.zeros((ndev, bo, W), dtype=np.float64)
    for i in range(ndev):
        lo = i * bi - H
        for w in range(W):
            c = lo + w
            if 0 <= c < n_in:
                blocks[i, :, w] = M[i * bo : (i + 1) * bo, c]
    return blocks, H, np.arange(ndev) * bi


def _exchange_halo(v: jax.Array, H: int, axis_name: str, ndev: int):
    """Return v extended by H planes from each axis-0 neighbor
    (zeros beyond the global ends)."""
    if H == 0:
        return v
    from_prev = lax.ppermute(
        v[-H:], axis_name, [(j, j + 1) for j in range(ndev - 1)]
    )
    from_next = lax.ppermute(
        v[:H], axis_name, [(j + 1, j) for j in range(ndev - 1)]
    )
    return jnp.concatenate([from_prev, v, from_next], axis=0)


class ShardedPoissonBVP:
    """Poisson solve with the whole multigrid algorithm inside one
    ``shard_map`` (see module docstring).  Single-dtype ("fp64"/"fp32")
    V-cycling with the same metric/tolerance semantics as PoissonBVP.
    """

    def __init__(
        self,
        hierarchy: GridHierarchy,
        bcs: Sequence[Sequence[str]],
        options: Options = Options(),
        *,
        mesh: Mesh,
        axis_name: str = "z",
        min_rows_per_shard: int = 4,
    ):
        self.h = hierarchy
        self.bcs = stencils.validate_bcs(bcs, hierarchy.ndim)
        self.options = options
        self.mesh = mesh
        self.axis_name = axis_name
        self.mode = options.resolve_precision()
        self.compact_smoother = getattr(options, "smoother", "auto") != "masked"
        self.dtype = jnp.float32 if self.mode == "fp32" else jnp.float64
        self.inner_dtype = (
            jnp.float32 if self.mode in ("mixed", "fp32") else jnp.float64
        )
        self.ndev = mesh.shape[axis_name]
        ndev = self.ndev

        # Level plan: prefix of shardable levels, then replicated.  The
        # coarsest level is always replicated (its "exact" solve must see
        # the full array).
        self.seam = 0
        for l, shape in enumerate(hierarchy.shapes[: hierarchy.ngrids - 1]):
            n0 = shape[0]
            if n0 % ndev == 0 and n0 >= ndev * min_rows_per_shard:
                self.seam = l + 1
            else:
                break
        if self.seam == 0:
            raise ValueError(
                f"finest level {hierarchy.shapes[0]} cannot be sharded over "
                f"{ndev} devices (axis-0 extent must divide and give >= "
                f"{min_rows_per_shard} rows/shard)"
            )

        # Transfer operators.  For sharded->sharded pairs, axis-0 becomes
        # per-shard blocks; other axes keep full matrices.
        self._restrict_z: List[Optional[Tuple[np.ndarray, int]]] = []
        self._interp_z: List[Optional[Tuple[np.ndarray, int]]] = []
        self._restrict_rest: List[List[np.ndarray]] = []
        self._interp_rest: List[List[np.ndarray]] = []
        self._restrict_full: List[List[np.ndarray]] = []
        self._interp_full: List[List[np.ndarray]] = []
        for l in range(hierarchy.ngrids - 1):
            fine = hierarchy.meshes[l]
            coarse = hierarchy.meshes[l + 1]
            R_axes = [restrict_matrix_1d(c, f) for f, c in zip(fine, coarse)]
            P_axes = [interp_matrix_1d(f, c) for f, c in zip(fine, coarse)]
            self._restrict_full.append(R_axes)
            self._interp_full.append(P_axes)
            if l + 1 < self.seam:  # sharded -> sharded
                Rb, RH, _ = _axis0_blocks(R_axes[0], ndev)
                Pb, PH, _ = _axis0_blocks(P_axes[0], ndev)
                self._restrict_z.append((Rb, RH))
                self._interp_z.append((Pb, PH))
            else:
                self._restrict_z.append(None)
                self._interp_z.append(None)
            self._restrict_rest.append(R_axes[1:])
            self._interp_rest.append(P_axes[1:])

        # Replicated coarse direct solver
        cs = getattr(options, "coarse_solver", "auto")
        self.coarse_direct = cs != "relax" and int(
            np.prod(hierarchy.shapes[-1])
        ) <= 4096
        if self.coarse_direct:
            S, int_mask = build_coarse_solver_matrix(
                hierarchy.shapes[-1], hierarchy.dq[-1], self.bcs
            )
            self._coarse_S = S
            self._coarse_rows = np.flatnonzero(int_mask)

        self._dq = [np.asarray(d, dtype=np.float64) for d in hierarchy.dq]
        spec = P(axis_name, *([None] * (hierarchy.ndim - 1)))
        self.sharding = NamedSharding(mesh, spec)
        self._solve_jit = jax.jit(
            shard_map(
                self._local_solve,
                mesh=mesh,
                in_specs=(spec, spec, P(), P(), P(), P()),
                out_specs=(spec, P(), P(), P()),
            )
        )

    # ------------------------------------------------------------------
    # Local (per-shard) building blocks.  `u` is the shard's axis-0 block
    # for sharded levels, the full array for replicated levels.
    # ------------------------------------------------------------------

    def _vary(self, x):
        """Mark a locally-created array as varying over the mesh axis
        (shard_map's varying-manual-axes type system)."""
        try:
            return lax.pcast(x, (self.axis_name,), to="varying")
        except (AttributeError, TypeError):
            return x

    def _g0(self, shape, level):
        """Global axis-0 index array for a local block at a sharded level."""
        blk = self.h.shapes[level][0] // self.ndev
        i = lax.axis_index(self.axis_name)
        return (i * blk + lax.broadcasted_iota(jnp.int32, shape, 0)).astype(
            jnp.int32
        )

    def _sharded_masks(self, shape, level, g):
        n0 = self.h.shapes[level][0]
        mask = None
        if self.bcs[0][0] == "D":
            m = g > 0
            mask = m
        if self.bcs[0][1] == "D":
            m = g < n0 - 1
            mask = m if mask is None else mask & m
        for ax in range(1, len(shape)):
            idx = lax.broadcasted_iota(jnp.int32, shape, ax)
            if self.bcs[ax][0] == "D":
                m = idx > 0
                mask = m if mask is None else mask & m
            if self.bcs[ax][1] == "D":
                m = idx < shape[ax] - 1
                mask = m if mask is None else mask & m
        return mask

    def _sharded_half(self, u, rhs, level, parity, w, w0, g, interior):
        ndev, ax = self.ndev, self.axis_name
        from_prev = lax.ppermute(
            u[-1:], ax, [(j, j + 1) for j in range(ndev - 1)]
        )
        from_next = lax.ppermute(u[:1], ax, [(j + 1, j) for j in range(ndev - 1)])
        lo0 = jnp.concatenate([from_prev, u[:-1]], axis=0)
        hi0 = jnp.concatenate([u[1:], from_next], axis=0)
        n0 = self.h.shapes[level][0]
        lo = jnp.where(g == 0, hi0, lo0)
        hi = jnp.where(g == n0 - 1, lo0, hi0)
        total = (lo + hi) * w[0]
        for a in range(1, u.ndim):
            la, ha = stencils._neighbors(u, a)
            total = total + (la + ha) * w[a]
        unew = (total - rhs) * w0
        psum_axes = g
        for a in range(1, u.ndim):
            psum_axes = psum_axes + lax.broadcasted_iota(jnp.int32, u.shape, a)
        mask = lax.rem(psum_axes, jnp.int32(2)) == parity
        if interior is not None:
            mask = mask & interior
        return jnp.where(mask, unew, u)

    def _sharded_sweep(self, u, rhs, level):
        w, w0 = stencils.stencil_weights(self._dq[level], u.dtype)
        g = self._g0(u.shape, level)
        interior = self._sharded_masks(u.shape, level, g)
        red = stencils.first_color_parity(self.bcs)
        u = self._sharded_half(u, rhs, level, red, w, w0, g, interior)
        u = self._sharded_half(u, rhs, level, 1 - red, w, w0, g, interior)
        if stencils.is_all_neumann(self.bcs):
            total = float(np.prod(self.h.shapes[level]))
            mean = lax.psum(jnp.sum(u), self.axis_name) / jnp.asarray(
                total, u.dtype
            )
            u = u - mean
        return u

    def _sharded_residual(self, u, rhs, level):
        w, _ = stencils.stencil_weights(self._dq[level], u.dtype)
        g = self._g0(u.shape, level)
        interior = self._sharded_masks(u.shape, level, g)
        ndev, ax = self.ndev, self.axis_name
        from_prev = lax.ppermute(
            u[-1:], ax, [(j, j + 1) for j in range(ndev - 1)]
        )
        from_next = lax.ppermute(u[:1], ax, [(j + 1, j) for j in range(ndev - 1)])
        lo0 = jnp.concatenate([from_prev, u[:-1]], axis=0)
        hi0 = jnp.concatenate([u[1:], from_next], axis=0)
        n0 = self.h.shapes[level][0]
        lo = jnp.where(g == 0, hi0, lo0)
        hi = jnp.where(g == n0 - 1, lo0, hi0)
        lap = (lo - 2.0 * u + hi) * w[0]
        for a in range(1, u.ndim):
            la, ha = stencils._neighbors(u, a)
            lap = lap + (la - 2.0 * u + ha) * w[a]
        r = rhs - lap
        if interior is not None:
            r = jnp.where(interior, r, jnp.zeros((), u.dtype))
        return r

    # -- color-compact sharded smoothing (half the HBM traffic/sweep) ----

    def _rowpar(self, shape_half_lead, level):
        """Global (sum of leading indices) parity for a local block,
        shaped (…lead, 1)."""
        blk = self.h.shapes[level][0] // self.ndev
        i = lax.axis_index(self.axis_name)
        full = tuple(shape_half_lead) + (1,)
        s = i * blk + lax.broadcasted_iota(jnp.int32, full, 0)
        for ax in range(1, len(shape_half_lead)):
            s = s + lax.broadcasted_iota(jnp.int32, full, ax)
        return lax.rem(s, jnp.int32(2))

    def _compact_half_sharded(self, own, opp, rhs_own, own_par, level, w, w0):
        """One color's Gauss-Seidel update on sharded compact state: the
        axis-0 neighbors (same half-index k, opposite color) come from
        the z-neighbor shards via ppermute; everything else is local.

        The axis-0 stencil term is computed in three sections — interior
        rows depend only on local data, the two boundary rows on the
        exchanged planes — so the XLA scheduler can overlap the (async)
        collective-permute with the interior computation.
        """
        from ..ops import stencils_compact as sc

        ndev, axn = self.ndev, self.axis_name
        n0 = self.h.shapes[level][0]
        nx = self.h.shapes[level][-1]
        blk = own.shape[0]
        # issue exchanges first
        from_prev = lax.ppermute(
            opp[-1:], axn, [(j, j + 1) for j in range(ndev - 1)]
        )
        from_next = lax.ppermute(
            opp[:1], axn, [(j + 1, j) for j in range(ndev - 1)]
        )
        g = self._g0(own.shape, level)
        # interior rows 1..blk-2: purely local (their global index can be
        # neither 0 nor n0-1, so no reflection select is needed)
        z_int = (opp[:-2] + opp[2:]) * w[0]
        # boundary rows: reflection at the global ends, remote plane else
        lo_top = jnp.where(g[:1] == 0, opp[1:2], from_prev)
        z_top = (lo_top + opp[1:2]) * w[0]
        hi_bot = jnp.where(g[-1:] == n0 - 1, opp[-2:-1], from_next)
        z_bot = (opp[-2:-1] + hi_bot) * w[0]
        total = jnp.concatenate([z_top, z_int, z_bot], axis=0)
        for a in range(1, own.ndim - 1):
            la, ha = stencils._neighbors(opp, a)
            total = total + (la + ha) * w[a]
        km1 = sc._shift_clamp(opp, own.ndim - 1, -1)
        kp1 = sc._shift_clamp(opp, own.ndim - 1, +1)
        nbx = jnp.where(own_par == 0, km1 + opp, opp + kp1)
        total = total + nbx * w[own.ndim - 1]
        unew = (total - rhs_own) * w0
        # update mask: ghost + Dirichlet faces (global z, local middle, gx)
        kk = lax.broadcasted_iota(jnp.int32, own.shape, own.ndim - 1)
        gx = 2 * kk + own_par
        mask = gx < nx
        if self.bcs[0][0] == "D":
            mask = mask & (g > 0)
        if self.bcs[0][1] == "D":
            mask = mask & (g < n0 - 1)
        for a in range(1, own.ndim - 1):
            idx = lax.broadcasted_iota(jnp.int32, own.shape, a)
            if self.bcs[a][0] == "D":
                mask = mask & (idx > 0)
            if self.bcs[a][1] == "D":
                mask = mask & (idx < own.shape[a] - 1)
        if self.bcs[-1][0] == "D":
            mask = mask & (gx > 0)
        if self.bcs[-1][1] == "D":
            mask = mask & (gx < nx - 1)
        own = jnp.where(mask, unew, own)
        return sc._ghost_fix(own, own_par, nx)

    def _sharded_smooth_compact(self, u, rhs, level, n):
        from ..ops import stencils_compact as sc

        nx = self.h.shapes[level][-1]
        w, w0 = stencils.stencil_weights(self._dq[level], u.dtype)
        rowpar = self._rowpar(u.shape[:-1], level)
        R, B = sc.split_colors_p(u, rowpar)
        rhs_R, rhs_B = sc.split_colors_p(rhs, rowpar)
        par_R, par_B = rowpar, 1 - rowpar
        red = stencils.first_color_parity(self.bcs)
        all_n = stencils.is_all_neumann(self.bcs)
        total_pts = float(np.prod(self.h.shapes[level]))

        def body(_, carry):
            R, B = carry
            if red == 0:
                R = self._compact_half_sharded(R, B, rhs_R, par_R, level, w, w0)
                B = self._compact_half_sharded(B, R, rhs_B, par_B, level, w, w0)
            else:
                B = self._compact_half_sharded(B, R, rhs_B, par_B, level, w, w0)
                R = self._compact_half_sharded(R, B, rhs_R, par_R, level, w, w0)
            if all_n:
                if nx % 2 == 0:
                    s = jnp.sum(R) + jnp.sum(B)
                else:
                    kk = lax.broadcasted_iota(jnp.int32, R.shape, R.ndim - 1)
                    s = jnp.sum(jnp.where(2 * kk + par_R < nx, R, 0)) + jnp.sum(
                        jnp.where(2 * kk + par_B < nx, B, 0)
                    )
                mean = lax.psum(s, self.axis_name) / jnp.asarray(
                    total_pts, R.dtype
                )
                R, B = R - mean, B - mean
            return (R, B)

        R, B = lax.fori_loop(0, n, body, (R, B))
        return sc.merge_colors_p(R, B, nx, rowpar)

    def _smooth(self, u, rhs, level, n):
        if level < self.seam:
            if self.compact_smoother and u.shape[-1] >= 4:
                return self._sharded_smooth_compact(u, rhs, level, n)
            body = lambda _, v: self._sharded_sweep(v, rhs, level)  # noqa: E731
        else:
            body = lambda _, v: stencils.rb_sweep(  # noqa: E731
                v, rhs, self._dq[level], self.bcs
            )
        return lax.fori_loop(0, n, body, u)

    def _restrict(self, r, level):
        """Level -> level+1.  Sharded->sharded uses per-shard axis-0
        blocks; the seam all-gathers the fine residual first."""
        if level + 1 < self.seam:
            Rb, H = self._restrict_z[level]
            i = lax.axis_index(self.axis_name)
            blk = jnp.asarray(Rb, dtype=r.dtype)[i]
            ext = _exchange_halo(r, H, self.axis_name, self.ndev)
            out = jnp.tensordot(
                blk, ext, axes=([1], [0]), precision=lax.Precision.HIGHEST
            )
            return apply_axis_matrices_rest(out, self._restrict_rest[level])
        # seam or replicated source
        if level < self.seam:  # sharded fine -> replicated coarse
            r_full = _allgather0(r, self.axis_name)
        else:
            r_full = r
        return apply_axis_matrices(r_full, self._restrict_full[level])

    def _prolong(self, u_c, level):
        """Level+1 -> level."""
        if level + 1 < self.seam:
            Pb, H = self._interp_z[level]
            i = lax.axis_index(self.axis_name)
            blk = jnp.asarray(Pb, dtype=u_c.dtype)[i]
            ext = _exchange_halo(u_c, H, self.axis_name, self.ndev)
            out = jnp.tensordot(
                blk, ext, axes=([1], [0]), precision=lax.Precision.HIGHEST
            )
            return apply_axis_matrices_rest(out, self._interp_rest[level])
        if level < self.seam:  # replicated coarse -> sharded fine
            full = apply_axis_matrices(u_c, self._interp_full[level])
            blk = self.h.shapes[level][0] // self.ndev
            i = lax.axis_index(self.axis_name)
            return lax.dynamic_slice_in_dim(full, i * blk, blk, axis=0)
        return apply_axis_matrices(u_c, self._interp_full[level])

    def _metric(self, a, b, level):
        du = jnp.abs(a - b)
        if level < self.seam:
            dmax = lax.pmax(jnp.max(du), self.axis_name)
            dsum = lax.psum(jnp.sum(du), self.axis_name)
            n = float(np.prod(self.h.shapes[level]))
        else:
            dmax = jnp.max(du)
            dsum = jnp.sum(du)
            n = float(np.prod(self.h.shapes[level]))
        return dmax if self.options.du_max else dsum / jnp.asarray(n, a.dtype)

    def _coarse_solve(self, rhs, ex_tol, nmax_exact):
        L = self.h.ngrids - 1
        if self.coarse_direct:
            rows = jnp.asarray(self._coarse_rows)
            S = jnp.asarray(self._coarse_S, dtype=rhs.dtype)
            rhs_int = jnp.take(rhs.ravel(), rows)
            e_int = jnp.matmul(S, rhs_int, precision=lax.Precision.HIGHEST)
            e = jnp.zeros(rhs.size, dtype=rhs.dtype).at[rows].set(e_int)
            return e.reshape(rhs.shape)

        def cond(c):
            _, _, du, it = c
            return jnp.logical_and(du > ex_tol, it < nmax_exact)

        def body(c):
            u, usav, _, it = c
            u = stencils.rb_sweep(u, rhs, self._dq[L], self.bcs)
            du = self._metric(u, usav, L)
            return (u, u, du, it + 1)

        big = jnp.asarray(jnp.finfo(rhs.dtype).max, rhs.dtype)
        u0 = jnp.zeros_like(rhs)
        u, _, _, _ = lax.while_loop(
            cond, body, (u0, u0, big, jnp.int32(0))
        )
        return u

    # ------------------------------------------------------------------

    def _vcycle(self, u, rhs, ex_tol, nmax_exact):
        L = self.h.ngrids
        ms = self.options.ms
        dtype = u.dtype
        us = [None] * L
        rhss = [None] * L
        us[0], rhss[0] = u, rhs
        for l in range(L - 1):
            ul = self._smooth(us[l], rhss[l], l, ms)
            r = (
                self._sharded_residual(ul, rhss[l], l)
                if l < self.seam
                else stencils.poisson_residual(ul, rhss[l], self._dq[l], self.bcs)
            )
            rhss[l + 1] = self._restrict(r, l)
            us[l] = ul
            shape_c = list(self.h.shapes[l + 1])
            if l + 1 < self.seam:
                shape_c[0] //= self.ndev
            us[l + 1] = self._vary(jnp.zeros(tuple(shape_c), dtype=dtype))
        us[L - 1] = self._coarse_solve(rhss[L - 1], ex_tol, nmax_exact)
        for l in range(L - 2, -1, -1):
            uc = self._smooth(us[l + 1], rhss[l + 1], l + 1, ms)
            cor = self._prolong(uc, l)
            us[l] = self._smooth(us[l] + cor, rhss[l], l, ms)
        return us[0]

    def _cycle_mixed(self, u, rhs, ex_tol, nmax_exact):
        """f64 defect correction around an f32 V-cycle (the sharded
        analogue of PoissonBVP's mixed mode; see mg/poisson.py)."""
        r0 = self._sharded_residual(u, rhs, 0)
        s = lax.pmax(jnp.max(jnp.abs(r0)), self.axis_name)
        s_safe = jnp.where(s > 0, s, jnp.ones_like(s))
        r32 = (r0 / s_safe).astype(jnp.float32)
        eps32 = 32.0 * float(np.finfo(np.float32).eps)
        ex_tol_eff = jnp.maximum(ex_tol, eps32)
        e0 = self._vary(jnp.zeros(r32.shape, dtype=jnp.float32))
        e32 = self._vcycle(e0, r32, ex_tol_eff, nmax_exact)
        e = e32.astype(self.dtype) * s_safe
        e = jnp.where(s > 0, e, jnp.zeros_like(e))
        u_new = u + e
        if stencils.is_all_neumann(self.bcs):
            total = float(np.prod(self.h.shapes[0]))
            mean = lax.psum(jnp.sum(u_new), self.axis_name) / jnp.asarray(
                total, u_new.dtype
            )
            u_new = u_new - mean
        return u_new

    def _local_solve(self, u0, rhs, vc_tol, ex_tol, nmax, nmax_exact):
        vc_tol = vc_tol.astype(self.dtype)
        big = jnp.asarray(jnp.finfo(self.dtype).max, self.dtype)
        mixed = self.mode == "mixed"

        def cond(c):
            _, du, it = c
            return jnp.logical_and(it < nmax, du >= vc_tol)

        def body(c):
            u, _, it = c
            if mixed:
                u_new = self._cycle_mixed(u, rhs, ex_tol, nmax_exact)
            else:
                u_new = self._vcycle(u, rhs, ex_tol, nmax_exact)
            du = self._metric(u_new, u, 0)
            return (u_new, du, it + 1)

        u, du, it = lax.while_loop(cond, body, (u0, big, jnp.int32(0)))
        ierr = jnp.where(du < vc_tol, IERR_SUCCESS, IERR_COVFAIL).astype(
            jnp.int32
        )
        return u, du, it, ierr

    def solve(self, u0, rhs, *, name: str = "") -> Tuple[jax.Array, SolveInfo]:
        o = self.options
        u0 = jax.device_put(jnp.asarray(u0, self.dtype), self.sharding)
        rhs = jax.device_put(jnp.asarray(rhs, self.dtype), self.sharding)
        u, du, it, ierr = self._solve_jit(
            u0,
            rhs,
            jnp.asarray(o.vc_tol, jnp.float64),
            jnp.asarray(o.ex_tol, jnp.float64),
            jnp.int32(o.ncycles_max),
            jnp.int32(o.niterex_max),
        )
        du, it, ierr = jax.device_get((du, it, ierr))
        return u, SolveInfo(
            ierr=int(ierr), du_last=float(du), cycles=int(it), name=name
        )


def _allgather0(v: jax.Array, axis_name: str) -> jax.Array:
    """All-gather local axis-0 blocks into the full (replicated) array."""
    return lax.all_gather(v, axis_name, axis=0, tiled=True)


def apply_axis_matrices_rest(x: jax.Array, mats: Sequence[np.ndarray]) -> jax.Array:
    """Apply per-axis matrices to axes 1..n (axis 0 already handled)."""
    for k, m in enumerate(mats):
        ax = k + 1
        mj = jnp.asarray(m, dtype=x.dtype)
        x = jnp.moveaxis(x, ax, 0)
        x = jnp.tensordot(mj, x, axes=([1], [0]), precision=lax.Precision.HIGHEST)
        x = jnp.moveaxis(x, 0, ax)
    return x
