"""Pallas TPU kernel: fused 3D red-black Gauss-Seidel sweep.

The XLA formulation of one sweep (ops/stencils.py) is two masked dense
updates — two full HBM round-trips (~6 array-traffic units per sweep).
This kernel fuses both color half-sweeps into ONE pass over HBM
(~3.5 units): tiles of (tz, ty, nx) stream through VMEM with a 2-deep
(z, y) halo; the red half-update is computed on the tile+1-halo region and
the black half-update on the tile interior, so black reads exactly the
red-updated values — bit-identical to the two-pass formulation (red values
recomputed in neighbor tiles' halos agree bitwise because they are the
same arithmetic on the same inputs).

Inputs stay in HBM (`memory_space=ANY`); windows are fetched with manual
double-buffered async DMA (next tile's window prefetched during compute),
and the output tile is written through a standard blocked BlockSpec.

Boundary conditions follow ops/stencils.py exactly: the window clamp at
global edges makes the in-buffer index reflection coincide with the
global Neumann reflection; Dirichlet faces are masked out via global-index
tests.  All-Neumann problems (global mean term) use the XLA path instead.

Restrictions: float32, 3D, nz % tz == 0, ny % ty == 0, nz >= tz + 4,
ny >= ty + 4; `fused_rb_sweep_3d` returns None when unsupported and the
caller falls back to the XLA path.
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

__all__ = ["fused_rb_sweep_3d", "supported", "pick_tile"]

_HALO = 2  # red needs +1 around the tile; red's own neighbors need +2


def pick_tile(n: int, max_tile: int = 32, min_tile: int = 4) -> Optional[int]:
    """Largest divisor of n in [min_tile, max_tile] with n >= t + 4 (None
    if none exists — tiny/prime extents fall back to the XLA path)."""
    for t in range(min(max_tile, n - 4), min_tile - 1, -1):
        if n % t == 0:
            return t
    return None


def supported(shape: Tuple[int, int, int], bcs: BCS, dtype) -> bool:
    if len(shape) != 3 or jnp.dtype(dtype) != jnp.float32:
        return False
    if is_all_neumann(bcs):
        return False  # needs a global mean reduction per sweep
    nz, ny, nx = shape
    tz, ty = pick_tile(nz), pick_tile(ny)
    if tz is None or ty is None:
        return False
    # VMEM budget: 2 double-buffered (tz+4, ty+4, nx) f32 windows (u, rhs)
    # + the pipelined output tile.
    vmem = 2 * 2 * (tz + 4) * (ty + 4) * nx * 4 + 2 * tz * ty * nx * 4
    return nz >= 8 and ny >= 8 and nx >= 8 and vmem < 12 * 1024 * 1024


def _sweep_kernel(
    u_hbm,
    rhs_hbm,
    out_ref,
    u_buf,
    rhs_buf,
    sems,
    *,
    nz: int,
    ny: int,
    nx: int,
    tz: int,
    ty: int,
    w: Tuple[float, float, float],
    w0: float,
    bcs: BCS,
    red: int,
):
    i = jnp.int32(pl.program_id(0))
    j = jnp.int32(pl.program_id(1))
    gy_count = jnp.int32(pl.num_programs(1))
    step = i * gy_count + j
    total = jnp.int32(pl.num_programs(0)) * gy_count

    def _clip_i32(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, jnp.int32(lo)), jnp.int32(hi))

    def window_starts(ii, jj):
        sz = _clip_i32(ii * jnp.int32(tz) - jnp.int32(_HALO), 0, nz - (tz + 2 * _HALO))
        sy = _clip_i32(jj * jnp.int32(ty) - jnp.int32(_HALO), 0, ny - (ty + 2 * _HALO))
        return sz, sy

    def dmas(slot, ii, jj):
        sz, sy = window_starts(ii, jj)
        u_dma = pltpu.make_async_copy(
            u_hbm.at[pl.ds(sz, tz + 2 * _HALO), pl.ds(sy, ty + 2 * _HALO), :],
            u_buf.at[slot],
            sems.at[slot, jnp.int32(0)],
        )
        rhs_dma = pltpu.make_async_copy(
            rhs_hbm.at[pl.ds(sz, tz + 2 * _HALO), pl.ds(sy, ty + 2 * _HALO), :],
            rhs_buf.at[slot],
            sems.at[slot, jnp.int32(1)],
        )
        return u_dma, rhs_dma

    def start_dma(slot, ii, jj):
        for d in dmas(slot, ii, jj):
            d.start()

    def wait_dma(slot, ii, jj):
        for d in dmas(slot, ii, jj):
            d.wait()

    slot = lax.rem(step, jnp.int32(2))

    @pl.when(step == jnp.int32(0))
    def _():
        start_dma(jnp.int32(0), i, j)

    @pl.when(step + jnp.int32(1) < total)
    def _():
        nstep = (step + jnp.int32(1)).astype(jnp.int32)
        ni = nstep // gy_count
        nj = lax.rem(nstep, gy_count)
        start_dma(lax.rem(nstep, jnp.int32(2)), ni, nj)

    wait_dma(slot, i, j)

    U = u_buf[slot]
    R = rhs_buf[slot]
    sz, sy = window_starts(i, j)
    bshape = U.shape

    # NOTE: every integer scalar below is an explicit jnp.int32 — under
    # jax_enable_x64 a bare Python literal traces as weak int64 and the
    # Mosaic int64 conversion lowering recurses infinitely (jax 0.9.0).
    gz = sz + lax.broadcasted_iota(jnp.int32, bshape, 0)
    gy = sy + lax.broadcasted_iota(jnp.int32, bshape, 1)
    gx = lax.broadcasted_iota(jnp.int32, bshape, 2)

    interior = None  # avoid a full bool-constant array (axon compiler chokes)
    for ax, g, n in ((0, gz, nz), (1, gy, ny), (2, gx, nx)):
        if bcs[ax][0] == "D":
            m = g > jnp.int32(0)
            interior = m if interior is None else interior & m
        if bcs[ax][1] == "D":
            m = g < jnp.int32(n - 1)
            interior = m if interior is None else interior & m
    parity = lax.rem(gz + gy + gx, jnp.int32(2))

    z0 = i * jnp.int32(tz)
    y0 = j * jnp.int32(ty)
    one = jnp.int32(1)
    in_red_z = (gz >= z0 - one) & (gz <= z0 + jnp.int32(tz))
    in_red_y = (gy >= y0 - one) & (gy <= y0 + jnp.int32(ty))
    in_blk_z = (gz >= z0) & (gz <= z0 + jnp.int32(tz - 1))
    in_blk_y = (gy >= y0) & (gy <= y0 + jnp.int32(ty - 1))

    def shifted(u, axis):
        # In-buffer neighbor shift with edge reflection to index 1 /
        # n-2; coincides with the global reflection because the window is
        # clamped inside the global domain (see module docstring).
        n = u.shape[axis]
        lo = jnp.concatenate(
            [lax.slice_in_dim(u, 1, 2, axis=axis), lax.slice_in_dim(u, 0, n - 1, axis=axis)],
            axis=axis,
        )
        hi = jnp.concatenate(
            [lax.slice_in_dim(u, 1, n, axis=axis), lax.slice_in_dim(u, n - 2, n - 1, axis=axis)],
            axis=axis,
        )
        return lo, hi

    def half(u, mask):
        lo0, hi0 = shifted(u, 0)
        lo1, hi1 = shifted(u, 1)
        lo2, hi2 = shifted(u, 2)
        s = (
            (lo0 + hi0) * jnp.float32(w[0])
            + (lo1 + hi1) * jnp.float32(w[1])
            + (lo2 + hi2) * jnp.float32(w[2])
        )
        unew = (s - R) * jnp.float32(w0)
        return jnp.where(mask, unew, u)

    red_mask = (parity == jnp.int32(red)) & in_red_z & in_red_y
    blk_mask = (parity == jnp.int32(1 - red)) & in_blk_z & in_blk_y
    if interior is not None:
        red_mask = red_mask & interior
        blk_mask = blk_mask & interior
    Unew = half(U, red_mask)
    Unew = half(Unew, blk_mask)

    # Mosaic cannot dynamic-slice a value; write back through the scratch
    # ref (its window is fully consumed) and slice the ref instead.
    u_buf[slot] = Unew
    out_ref[:] = u_buf[slot, pl.ds(z0 - sz, tz), pl.ds(y0 - sy, ty), :]


def fused_rb_sweep_3d(bcs: BCS, dq, shape, dtype=jnp.float32, interpret: bool = False):
    """Build the fused-sweep callable for a given configuration, or return
    None if unsupported (caller falls back to the XLA path).

    Returns f(u, rhs) -> u (same shapes, float32).
    """
    bcs = tuple(tuple(b) for b in bcs)
    if not supported(tuple(shape), bcs, dtype):
        return None
    nz, ny, nx = shape
    tz = pick_tile(nz)
    ty = pick_tile(ny)
    dq = np.asarray(dq, dtype=np.float64)
    w = tuple(float(x) for x in 1.0 / dq**2)
    w0 = float(1.0 / (2.0 * sum(w)))
    red = first_color_parity(bcs)

    kernel = functools.partial(
        _sweep_kernel,
        nz=nz,
        ny=ny,
        nx=nx,
        tz=tz,
        ty=ty,
        w=w,
        w0=w0,
        bcs=bcs,
        red=red,
    )

    grid = (nz // tz, ny // ty)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tz, ty, nx), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tz + 2 * _HALO, ty + 2 * _HALO, nx), jnp.float32),
            pltpu.VMEM((2, tz + 2 * _HALO, ty + 2 * _HALO, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )

    @jax.jit
    def f(u, rhs):
        return call(u, rhs)

    return f
