"""Pallas TPU kernel: multi-sweep COLOR-COMPACT red-black Gauss-Seidel.

Third-generation production smoother (supersedes the dense windowed
kernel ops/pallas_fused.py on eligible shapes; both replace the
reference hot loop fortran/ndsm_optimized.f90:40-191).

Why compact: the v5e VPU sustains ~10^11 dense stencil evaluations/s in
f32; a dense two-color formulation evaluates every point twice per sweep
and is therefore capped at ~64% of the 12 B/point-sweep HBM roofline
even with zero overhead (measured, PERF_NOTES.md round 2).  Storing the
two colors as separate half-width arrays (ops/stencils_compact.py
layout) evaluates each point ONCE per sweep — the only formulation that
can clear the >70%-of-SoL target on this chip.

Design:

  * State is the color split (R, B, rhs_R, rhs_B), each (nz, ny, nx/2)
    (R = total-index-parity-0 points; split/merge happen at the XLA
    level, once per multi-sweep smooth call).
  * (tz+2H_z, ty+2H_y, nxc) windows of all four arrays stream through
    VMEM double-buffered (the DMA pipeline proven in ops/pallas_fused);
    ``nsweeps`` complete sweeps run per HBM pass (halo H_z = 2*nsweeps;
    H_y rounded to the 8-sublane DMA alignment).  Updated halves are
    written back through the window refs between half-updates to keep
    Mosaic's live ranges plane-bounded.
  * NO mask array is streamed and no in-kernel iota is used (the axon
    Mosaic bug catalog, PERF_NOTES.md).  The window row parity is a
    STATIC numpy constant: tz, ty, H_z are even, H_y % 8 == 0 and
    nz, ny are even, so every clamped window start has sz + sy even and
    the (lz + ly) % 2 pattern is window-position-independent.  Dirichlet
    faces are static lane masks (x) and traced-scalar-conditioned row
    masks (z/y, active only in windows touching a global face).
  * Central tiles leave by direct VMEM->HBM async copy; the copies of
    step k are semaphore-waited before the step-(k+2) fetch reuses the
    buffer slot.

Neighbor semantics exactly match ops/stencils_compact.rb_sweep_compact
(which is rounding-identical to the masked rb_sweep): leading-axis
neighbors via in-window edge substitution (globally correct at true
faces, discarded halo elsewhere), split-axis neighbors via lane clamp
shifts selected by row parity.  Every in-kernel integer is an explicit
jnp.int32 (weak-int64 Mosaic traps, PERF_NOTES.md).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencils import BCS, first_color_parity, is_all_neumann

__all__ = [
    "compact_smooth_3d",
    "compact_kernel_supported",
    "pick_tiles_compact",
]

# VMEM budget for the 4 double-buffered window arrays (per-core VMEM is
# ~16 MB; leave room for eval temporaries and compiler scratch).
_VMEM_BUDGET = 8 * 1024 * 1024


def _halos(nsweeps: int) -> Tuple[int, int]:
    H = 2 * nsweeps
    return H, -(-H // 8) * 8


def pick_tiles_compact(
    shape: Tuple[int, int, int], nsweeps: int
) -> Optional[Tuple[int, int, int, int]]:
    """(tz, ty, W_z, W_y): tile divisors of (nz, ny) and their window
    extents, maximizing the useful fraction under the VMEM window budget.
    tz even (parity invariance), ty % 8 == 0; a window capped at the full
    axis has no halo there (its edges are true global faces)."""
    nz, ny, nx = shape
    nxc = nx // 2
    H_z, H_y = _halos(nsweeps)
    best, best_frac = None, 0.0
    for tz in range(8, min(nz, 256) + 1, 2):
        if nz % tz:
            continue
        for ty in range(8, min(ny, 256) + 1, 8):
            if ny % ty:
                continue
            wz = min(nz, tz + 2 * H_z)
            wy = min(ny, ty + 2 * H_y)
            if 4 * 2 * wz * wy * nxc * 4 > _VMEM_BUDGET:
                continue
            frac = (tz * ty) / (wz * wy)
            if frac > best_frac:
                best_frac, best = frac, (tz, ty, wz, wy)
    return best


def compact_kernel_supported(
    shape, bcs: BCS, dtype, nsweeps: int, interpret: bool = False
) -> bool:
    if len(shape) != 3 or jnp.dtype(dtype) != jnp.float32:
        return False
    if is_all_neumann(bcs):
        return False  # per-sweep global mean: XLA path
    if nsweeps < 1 or nsweeps > 8:
        return False
    nz, ny, nx = shape
    if nz % 2 or ny % 2 or nx % 2:
        return False  # even extents: parity-invariant windows, no ghosts
    if not interpret and (nx // 2) % 128 != 0:
        return False  # lane-aligned DMA slices of the compact halves
    if not interpret and ny % 8 != 0:
        return False
    return pick_tiles_compact(tuple(shape), nsweeps) is not None


def _shift_edge(v, axis: int):
    """(lower, upper) neighbors along a leading window axis with edge
    substitution to index 1 / n-2 (stencils._neighbors semantics)."""
    n = v.shape[axis]
    lo = jnp.concatenate(
        [lax.slice_in_dim(v, 1, 2, axis=axis), lax.slice_in_dim(v, 0, n - 1, axis=axis)],
        axis=axis,
    )
    hi = jnp.concatenate(
        [lax.slice_in_dim(v, 1, n, axis=axis), lax.slice_in_dim(v, n - 2, n - 1, axis=axis)],
        axis=axis,
    )
    return lo, hi


def _shift_clamp_lane(v, delta: int):
    """Lane shift by +-1 with edge clamp (stencils_compact._shift_clamp)."""
    n = v.shape[-1]
    if delta == -1:
        return jnp.concatenate(
            [lax.slice_in_dim(v, 0, 1, axis=2), lax.slice_in_dim(v, 0, n - 1, axis=2)],
            axis=2,
        )
    return jnp.concatenate(
        [lax.slice_in_dim(v, 1, n, axis=2), lax.slice_in_dim(v, n - 1, n, axis=2)],
        axis=2,
    )


def _compact_kernel(
    R_hbm, B_hbm, rR_hbm, rB_hbm,
    outR_ref, outB_ref,
    bufR, bufB, bufrR, bufrB,
    in_sems, out_sems,
    *,
    nz: int, ny: int, nxc: int, tz: int, ty: int, W_z: int, W_y: int,
    H_z: int, H_y: int,
    w: Tuple[float, float, float], w0: float, nsweeps: int, first: int,
    bcs: BCS,
):
    i = jnp.int32(pl.program_id(0))
    j = jnp.int32(pl.program_id(1))
    gy = jnp.int32(pl.num_programs(1))
    step = i * gy + j
    total = jnp.int32(pl.num_programs(0)) * gy
    i32 = jnp.int32

    def _clip(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, i32(lo)), i32(hi))

    def window_starts(ii, jj):
        sz = _clip(ii * i32(tz) - i32(H_z), 0, nz - W_z)
        sy = _clip(jj * i32(ty) - i32(H_y), 0, ny - W_y)
        return sz, pl.multiple_of(sy, 8)

    def fetch(slot, ii, jj):
        sz, sy = window_starts(ii, jj)
        win = (pl.ds(sz, W_z), pl.ds(sy, W_y), slice(None))
        return [
            pltpu.make_async_copy(src.at[win], buf.at[slot], in_sems.at[slot, i32(k)])
            for k, (src, buf) in enumerate(
                ((R_hbm, bufR), (B_hbm, bufB), (rR_hbm, bufrR), (rB_hbm, bufrB))
            )
        ]

    def out_dmas(slot, ii, jj):
        sz, sy = window_starts(ii, jj)
        z0 = ii * i32(tz)
        y0 = pl.multiple_of(jj * i32(ty), 8)
        src = (slot, pl.ds(z0 - sz, tz), pl.ds(pl.multiple_of(y0 - sy, 8), ty), slice(None))
        dst = (pl.ds(z0, tz), pl.ds(y0, ty), slice(None))
        return [
            pltpu.make_async_copy(bufR.at[src], outR_ref.at[dst], out_sems.at[slot, i32(0)]),
            pltpu.make_async_copy(bufB.at[src], outB_ref.at[dst], out_sems.at[slot, i32(1)]),
        ]

    slot = lax.rem(step, i32(2))

    @pl.when(step == i32(0))
    def _():
        for d in fetch(i32(0), i, j):
            d.start()

    @pl.when(step + i32(1) < total)
    def _():
        nstep = step + i32(1)
        ni, nj = nstep // gy, lax.rem(nstep, gy)

        # The next step reuses slot^1 — drain the out-copies step-1
        # launched from it before overwriting the windows.
        @pl.when(step >= i32(1))
        def _():
            pstep = step - i32(1)
            pi, pj = pstep // gy, lax.rem(pstep, gy)
            for d in out_dmas(lax.rem(pstep, i32(2)), pi, pj):
                d.wait()

        for d in fetch(lax.rem(nstep, i32(2)), ni, nj):
            d.start()

    for d in fetch(slot, i, j):
        d.wait()

    # ---- window masks (built per step from iota + traced scalars, all
    # hoisted out of the sweep loop; pallas forbids captured array
    # constants, and this kernel contains no streamed mask array).  The
    # row parity (lz+ly)%2 is window-position-independent because every
    # clamped start has sz+sy even (tz, ty, H_z even; H_y%8==0; nz, ny
    # even).  par_R: R's global x is 2k + par.
    lz = lax.broadcasted_iota(jnp.int32, (W_z, W_y, 1), 0)
    ly = lax.broadcasted_iota(jnp.int32, (W_z, W_y, 1), 1)
    parR = lax.rem(lz + ly, i32(2)) == i32(1)  # R-parity-odd rows
    kk = lax.broadcasted_iota(jnp.int32, (1, 1, nxc), 2)

    sz, sy = window_starts(i, j)

    def face_mask(par_is_odd):
        m = None

        def _and(m, c):
            return c if m is None else jnp.logical_and(m, c)

        if bcs[2][0] == "D":  # gx == 0: k == 0 on even-parity rows
            m = _and(m, ~jnp.logical_and(~par_is_odd, kk == i32(0)))
        if bcs[2][1] == "D":  # gx == nx-1 (nx even): k == nxc-1, odd rows
            m = _and(m, ~jnp.logical_and(par_is_odd, kk == i32(nxc - 1)))
        if bcs[0][0] == "D":
            m = _and(m, ~jnp.logical_and(sz == i32(0), lz == i32(0)))
        if bcs[0][1] == "D":
            m = _and(
                m, ~jnp.logical_and(sz == i32(nz - W_z), lz == i32(W_z - 1))
            )
        if bcs[1][0] == "D":
            m = _and(m, ~jnp.logical_and(sy == i32(0), ly == i32(0)))
        if bcs[1][1] == "D":
            m = _and(
                m, ~jnp.logical_and(sy == i32(ny - W_y), ly == i32(W_y - 1))
            )
        return m

    M_R = face_mask(parR)
    M_B = face_mask(~parR)

    def half(own, opp, rhs_own, mask, own_par_is_odd):
        lo0, hi0 = _shift_edge(opp, 0)
        lo1, hi1 = _shift_edge(opp, 1)
        km1 = _shift_clamp_lane(opp, -1)
        kp1 = _shift_clamp_lane(opp, +1)
        # even-parity rows: neighbors opp[k-1], opp[k]; odd: opp[k], opp[k+1]
        nbx = jnp.where(own_par_is_odd, opp + kp1, km1 + opp)
        s = (
            (lo0 + hi0) * jnp.float32(w[0])
            + (lo1 + hi1) * jnp.float32(w[1])
            + nbx * jnp.float32(w[2])
        )
        unew = (s - rhs_own) * jnp.float32(w0)
        return jnp.where(mask, unew, own)

    rR = bufrR[slot]
    rB = bufrB[slot]
    for _ in range(nsweeps):
        if first == 0:
            bufR[slot] = half(bufR[slot], bufB[slot], rR, M_R, parR)
            bufB[slot] = half(bufB[slot], bufR[slot], rB, M_B, ~parR)
        else:
            bufB[slot] = half(bufB[slot], bufR[slot], rB, M_B, ~parR)
            bufR[slot] = half(bufR[slot], bufB[slot], rR, M_R, parR)

    for d in out_dmas(slot, i, j):
        d.start()

    # Last two steps' copies have no later fetch to drain them.
    @pl.when(step == total - i32(1))
    def _():
        for d in out_dmas(slot, i, j):
            d.wait()

        @pl.when(total >= i32(2))
        def _():
            pstep = step - i32(1)
            pi, pj = pstep // gy, lax.rem(pstep, gy)
            for d in out_dmas(lax.rem(pstep, i32(2)), pi, pj):
                d.wait()


def compact_smooth_3d(
    bcs: BCS,
    dq,
    shape,
    nsweeps: int,
    dtype=jnp.float32,
    interpret: bool = False,
):
    """Build the compact-smoother callable for one configuration, or None
    if unsupported.  Returns call(R, B, rhs_R, rhs_B) -> (R, B) applying
    ``nsweeps`` red-black sweeps on color-split state, equal to
    ``nsweeps`` applications of stencils_compact.rb_sweep_compact up to
    f32 rounding (bitwise on TPU)."""
    bcs = tuple(tuple(b) for b in bcs)
    shape = tuple(int(s) for s in shape)
    if not compact_kernel_supported(shape, bcs, dtype, nsweeps, interpret=interpret):
        return None
    nz, ny, nx = shape
    nxc = nx // 2
    tz, ty, W_z, W_y = pick_tiles_compact(shape, nsweeps)
    # Mimic ops.stencils.stencil_weights EXACTLY (w cast to f32, w0 from
    # the f32 sum) so kernel sweeps are bitwise-equal to the XLA sweeps.
    dq = np.asarray(dq, dtype=np.float64)
    w32 = (1.0 / (dq * dq)).astype(np.float32)
    w = tuple(float(x) for x in w32)
    w0 = float(np.float32(1.0) / (np.float32(2.0) * np.sum(w32)))
    first = first_color_parity(bcs)

    H_z, H_y = _halos(nsweeps)
    kernel = functools.partial(
        _compact_kernel,
        nz=nz, ny=ny, nxc=nxc, tz=tz, ty=ty, W_z=W_z, W_y=W_y,
        H_z=H_z, H_y=H_y,
        w=w, w0=w0, nsweeps=nsweeps, first=first, bcs=bcs,
    )
    grid = (nz // tz, ny // ty)
    half_shape = (nz, ny, nxc)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct(half_shape, jnp.float32),
            jax.ShapeDtypeStruct(half_shape, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, W_z, W_y, nxc), jnp.float32),
            pltpu.VMEM((2, W_z, W_y, nxc), jnp.float32),
            pltpu.VMEM((2, W_z, W_y, nxc), jnp.float32),
            pltpu.VMEM((2, W_z, W_y, nxc), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * nsweeps * 11 * nz * ny * nxc),
            bytes_accessed=int(6 * 4 * nz * ny * nxc),
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def apply(R, B, rhs_R, rhs_B):
        out = call(R, B, rhs_R, rhs_B)
        return out[0], out[1]

    return apply
