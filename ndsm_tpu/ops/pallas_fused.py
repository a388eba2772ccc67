"""Pallas TPU kernel: multi-sweep fused 3D red-black Gauss-Seidel.

First-generation TPU smoother, now a FALLBACK behind the z-compact
kernel (ops/pallas_zc.py — one stencil evaluation per point-sweep and
25% less traffic; this dense kernel evaluates both colors everywhere
and is VPU-capped at ~66% of the HBM roofline).  The engine still routes
odd-nz shapes here, and the lane-batched variant serves mg/batched.py
when per-lane zc kernels are unavailable.  It replaces the reference's
hand-tuned OpenMP hot loop (fortran/ndsm_optimized.f90:40-191) with an
HBM-roofline design:

  * ``nsweeps`` complete red-black sweeps run in ONE pass over HBM.  A
    window of (tz + 2H, ty + 2H, nx) with halo H = 2*nsweeps streams
    through VMEM via manually double-buffered async DMA; both color
    half-updates of every sweep are computed densely over the whole
    window, and only the central (tz, ty, nx) tile — whose values are
    exact after ``nsweeps`` sweeps — is written back.  HBM traffic per
    sweep drops from ~3 full arrays (the best unfused XLA formulation)
    to ~4/nsweeps arrays.
  * NO in-kernel index arithmetic: the checkerboard parity and the
    Dirichlet-face freezing are carried by a precomputed mask-code array
    ``C`` (0 = black-active, 1 = red-active, 2 = frozen) streamed with
    the window.  The round-1 kernel (ops/pallas3d.py) crashed the axon
    Mosaic toolchain with broadcasted-iota masks inside the DMA pipeline
    (PERF_NOTES.md); this formulation contains no iota and no
    tile-coordinate masks at all — the only scalar arithmetic is the
    (previously probe-verified) clamped window-start computation.
  * Neumann faces use in-buffer index reflection (shift with edge
    substitution): windows are clamped inside the global domain, so a
    window edge coincides with a global face exactly when the reflection
    is globally correct; elsewhere the (wrong) edge values lie in the
    discarded halo region.  Semantics match ops/stencils.rb_sweep
    exactly (same update expression, same operation order).

All-Neumann problems need a global mean subtraction per sweep (reference
quirk Q7) and fall back to the XLA path; 2D problems (the chi solves) are
small and stay on XLA as well.

Every in-kernel integer is an explicit jnp.int32: under jax_enable_x64 a
bare Python int traces as weak int64 and the Mosaic int64-convert
lowering recurses infinitely (jax 0.9.0; PERF_NOTES.md).
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
    "fused_smooth_3d",
    "fused_smooth_3d_batched",
    "mask_code",
    "mask_code_jax",
    "supported",
    "pick_tiles",
]

# VMEM budget for the window buffers (per-core VMEM is ~16 MB; leave room
# for the output pipeline and compiler scratch).
_VMEM_BUDGET = 11 * 1024 * 1024


def mask_code(shape: Tuple[int, int, int], bcs: BCS) -> np.ndarray:
    """The mask-code array C: 1.0 where the first-updated ("red") color is
    active, 0.0 where the second ("black") color is active, 2.0 on frozen
    Dirichlet-face points.  float32, precomputed once per level."""
    red = first_color_parity(bcs)
    idx = np.indices(shape, dtype=np.int64)
    parity = (idx.sum(axis=0) % 2).astype(np.float32)
    C = np.where(parity == red, np.float32(1.0), np.float32(0.0))
    for ax, (blo, bhi) in enumerate(bcs):
        sl = [slice(None)] * 3
        if blo == "D":
            sl[ax] = 0
            C[tuple(sl)] = 2.0
        if bhi == "D":
            sl[ax] = shape[ax] - 1
            C[tuple(sl)] = 2.0
    return C


def mask_code_jax(shape: Tuple[int, int, int], bcs: BCS) -> jax.Array:
    """Traced (XLA-level) construction of the mask-code array C — used
    when the kernel is invoked inside a larger jitted program, where a
    baked-in numpy C would become a full-grid inline MLIR constant
    (67 MB at 256^3 — it crashes the remote compile helper).  Built from
    broadcasted_iota OUTSIDE the Pallas kernel (the Mosaic iota bug is
    in-kernel only) and hoisted out of solver while-loops by XLA LICM."""
    red = first_color_parity(bcs)
    s = None
    for ax in range(3):
        it = lax.broadcasted_iota(jnp.int32, shape, ax)
        s = it if s is None else s + it
    C = jnp.where((s % 2) == red, jnp.float32(1.0), jnp.float32(0.0))
    frozen = None
    for ax, (blo, bhi) in enumerate(bcs):
        idx = lax.broadcasted_iota(jnp.int32, shape, ax)
        if blo == "D":
            m = idx == 0
            frozen = m if frozen is None else frozen | m
        if bhi == "D":
            m = idx == shape[ax] - 1
            frozen = m if frozen is None else frozen | m
    if frozen is not None:
        C = jnp.where(frozen, jnp.float32(2.0), C)
    return C


def _halos(nsweeps: int) -> Tuple[int, int]:
    """(H_z, H_y): dependency radius is 2*nsweeps; the y halo is rounded
    up to a multiple of 8 because Mosaic requires HBM DMA slices along
    the sublane dimension to be 8-aligned (size and offset)."""
    H = 2 * nsweeps
    return H, -(-H // 8) * 8


def pick_tiles(
    shape: Tuple[int, int, int], nsweeps: int
) -> Optional[Tuple[int, int]]:
    """(tz, ty) divisors of (nz, ny) maximizing the useful fraction
    tz*ty / ((tz+2Hz)(ty+2Hy)) subject to the VMEM window budget, or
    None.  ty must be a multiple of 8 (sublane-aligned DMA slices)."""
    nz, ny, nx = shape
    H_z, H_y = _halos(nsweeps)

    def divisors(n, halo, step=1):
        return [
            d
            for d in range(4, min(n, 256) + 1)
            if n % d == 0 and n >= d + 2 * halo and d % step == 0
        ]

    best = None
    best_frac = 0.0
    for tz in divisors(nz, H_z):
        for ty in divisors(ny, H_y, step=8):
            wz, wy = tz + 2 * H_z, ty + 2 * H_y
            # 3 window arrays (u, rhs, C), double-buffered
            vmem = 3 * 2 * wz * wy * nx * 4 + 2 * tz * ty * nx * 4
            if vmem > _VMEM_BUDGET:
                continue
            frac = (tz * ty) / (wz * wy)
            if frac > best_frac:
                best_frac, best = frac, (tz, ty)
    return best


def supported(shape, bcs: BCS, dtype, nsweeps: int, interpret: bool = False) -> bool:
    if len(shape) != 3 or jnp.dtype(dtype) != jnp.float32:
        return False
    if is_all_neumann(bcs):
        return False  # per-sweep global mean: XLA path
    if nsweeps < 1 or nsweeps > 8:
        return False
    # Mosaic requires DMA window slices to be lane-aligned: the last axis
    # is padded to 128 lanes in HBM and a windowed memref_slice of a
    # non-multiple-of-128 extent is rejected ("Slice shape along dimension
    # 2 must be aligned to tiling (128)").  The bench/production shapes
    # (128^3..512^3 and their coarser levels) are all aligned; others use
    # the XLA path.  The interpreter has no such constraint.
    if not interpret and shape[-1] % 128 != 0:
        return False
    if not interpret and shape[1] % 8 != 0:
        return False  # sublane-aligned window clamps need ny % 8 == 0
    return pick_tiles(tuple(shape), nsweeps) is not None


def _shifted(u, axis: int):
    """(lower, upper) neighbors along ``axis`` with edge reflection to
    index 1 / n-2 — identical to ops/stencils._neighbors."""
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


def _fused_kernel(
    u_hbm,
    rhs_hbm,
    c_hbm,
    out_ref,
    u_buf,
    rhs_buf,
    c_buf,
    sems,
    *,
    nz: int,
    ny: int,
    nx: int,
    tz: int,
    ty: int,
    H_z: int,
    H_y: int,
    w: Tuple[float, float, float],
    w0: float,
    nsweeps: int,
    nb: int = 0,
):
    # nb = 0: grid (gz, gy) over one volume; nb > 0: grid (nb, gz, gy)
    # over a stacked (nb, nz, ny, nx) state with per-lane windows/masks
    # (the batched multi-BC component solves, mg/batched.py).
    if nb:
        b = jnp.int32(pl.program_id(0))
        i = jnp.int32(pl.program_id(1))
        j = jnp.int32(pl.program_id(2))
        gz_count = jnp.int32(pl.num_programs(1))
        gy_count = jnp.int32(pl.num_programs(2))
        step = (b * gz_count + i) * gy_count + j
        total = jnp.int32(nb) * gz_count * gy_count
    else:
        b = jnp.int32(0)
        i = jnp.int32(pl.program_id(0))
        j = jnp.int32(pl.program_id(1))
        gz_count = jnp.int32(pl.num_programs(0))
        gy_count = jnp.int32(pl.num_programs(1))
        step = i * gy_count + j
        total = gz_count * gy_count
    W_z, W_y = tz + 2 * H_z, ty + 2 * H_y

    def _clip(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, jnp.int32(lo)), jnp.int32(hi))

    def window_starts(ii, jj):
        # All y quantities (ty, H_y, ny - W_y) are multiples of 8, so sy
        # and the write-back offset y0 - sy stay sublane-aligned; Mosaic
        # cannot prove that through the clip, so assert it with
        # pl.multiple_of.
        sz = _clip(ii * jnp.int32(tz) - jnp.int32(H_z), 0, nz - W_z)
        sy = _clip(jj * jnp.int32(ty) - jnp.int32(H_y), 0, ny - W_y)
        return sz, pl.multiple_of(sy, 8)

    def dmas(slot, bb, ii, jj):
        sz, sy = window_starts(ii, jj)
        window = (pl.ds(sz, W_z), pl.ds(sy, W_y), slice(None))
        if nb:
            window = (bb,) + window
        return [
            pltpu.make_async_copy(src.at[window], buf.at[slot], sems.at[slot, jnp.int32(k)])
            for k, (src, buf) in enumerate(
                ((u_hbm, u_buf), (rhs_hbm, rhs_buf), (c_hbm, c_buf))
            )
        ]

    slot = lax.rem(step, jnp.int32(2))

    @pl.when(step == jnp.int32(0))
    def _():
        for d in dmas(jnp.int32(0), b, i, j):
            d.start()

    @pl.when(step + jnp.int32(1) < total)
    def _():
        nstep = (step + jnp.int32(1)).astype(jnp.int32)
        per = gz_count * gy_count
        nb_ = nstep // per
        r = lax.rem(nstep, per)
        ni = r // gy_count
        nj = lax.rem(r, gy_count)
        for d in dmas(lax.rem(nstep, jnp.int32(2)), nb_, ni, nj):
            d.start()

    for d in dmas(slot, b, i, j):
        d.wait()

    U = u_buf[slot]
    R = rhs_buf[slot]
    C = c_buf[slot]
    m_red = C == jnp.float32(1.0)
    m_blk = C == jnp.float32(0.0)

    def half(u, mask):
        lo0, hi0 = _shifted(u, 0)
        lo1, hi1 = _shifted(u, 1)
        lo2, hi2 = _shifted(u, 2)
        s = (
            (lo0 + hi0) * jnp.float32(w[0])
            + (lo1 + hi1) * jnp.float32(w[1])
            + (lo2 + hi2) * jnp.float32(w[2])
        )
        unew = (s - R) * jnp.float32(w0)
        return jnp.where(mask, unew, u)

    for _ in range(nsweeps):
        U = half(U, m_red)
        U = half(U, m_blk)

    # Mosaic cannot dynamic-slice a computed value, and a vector load from
    # a dynamic sublane offset must be 8-aligned — so write the result
    # through the consumed window buffer and move the central tile to the
    # output with a local DMA (DMAs allow arbitrary slice offsets).
    sz, sy = window_starts(i, j)
    u_buf[slot] = U
    z0 = i * jnp.int32(tz)
    y0 = j * jnp.int32(ty)
    out_dma = pltpu.make_async_copy(
        u_buf.at[slot, pl.ds(z0 - sz, tz), pl.ds(pl.multiple_of(y0 - sy, 8), ty), :],
        out_ref.at[jnp.int32(0)] if nb else out_ref,  # int32: x64 weak-i64 trap
        sems.at[slot, jnp.int32(3)],
    )
    out_dma.start()
    out_dma.wait()


def fused_smooth_3d(
    bcs: BCS,
    dq,
    shape,
    nsweeps: int,
    dtype=jnp.float32,
    interpret: bool = False,
    with_mask_arg: bool = False,
):
    """Build the fused-smoother callable for one configuration, or None if
    unsupported (caller falls back to the XLA path).

    Returns f(u, rhs) -> u applying ``nsweeps`` red-black sweeps, equal to
    ``nsweeps`` applications of ops.stencils.rb_sweep up to f32 rounding
    (same expressions; compilers may fuse multiplies differently).
    """
    bcs = tuple(tuple(b) for b in bcs)
    shape = tuple(int(s) for s in shape)
    if not supported(shape, bcs, dtype, nsweeps, interpret=interpret):
        return None
    nz, ny, nx = shape
    H_z, H_y = _halos(nsweeps)
    tz, ty = pick_tiles(shape, nsweeps)
    dq = np.asarray(dq, dtype=np.float64)
    # Mimic ops.stencils.stencil_weights EXACTLY (w cast to f32, w0 from
    # the f32 sum) so kernel sweeps are bitwise-equal to rb_sweep.
    w32 = (1.0 / (dq * dq)).astype(np.float32)
    w = tuple(float(x) for x in w32)
    w0 = float(np.float32(1.0) / (np.float32(2.0) * np.sum(w32)))

    kernel = functools.partial(
        _fused_kernel,
        nz=nz, ny=ny, nx=nx, tz=tz, ty=ty, H_z=H_z, H_y=H_y, w=w, w0=w0,
        nsweeps=nsweeps,
    )
    grid = (nz // tz, ny // ty)
    W_z, W_y = tz + 2 * H_z, ty + 2 * H_y
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            # NB: the literal 0 must be an explicit int32 — under
            # jax_enable_x64 it traces as weak int64 and Mosaic fails with
            # "failed to legalize operation 'func.return'" on the index map.
            (tz, ty, nx),
            lambda i, j: (i, j, jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, W_z, W_y, nx), jnp.float32),
            pltpu.VMEM((2, W_z, W_y, nx), jnp.float32),
            pltpu.VMEM((2, W_z, W_y, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * nsweeps * 11 * nz * ny * nx),
            bytes_accessed=int(4 * 4 * nz * ny * nx),
            transcendentals=0,
        ),
        interpret=interpret,
    )

    if with_mask_arg:
        # Caller supplies C (use mask_code_jax inside larger jits so the
        # mask is an argument/traced value, never an inline constant).
        return call

    # Standalone form: C is a real runtime argument of the jitted call
    # (passing the device array through the jit boundary keeps it out of
    # the serialized MLIR — as a closure constant it would inline all
    # n^3 floats and crash the remote compile helper on big grids).
    C_dev = jnp.asarray(mask_code(shape, bcs))
    call_jit = jax.jit(call)

    def f(u, rhs):
        return call_jit(u, rhs, C_dev)

    return f


def fused_smooth_3d_batched(
    bcs_list,
    dq,
    shape,
    nsweeps: int,
    dtype=jnp.float32,
    interpret: bool = False,
):
    """Batched form of ``fused_smooth_3d`` for B stacked problems with
    per-lane BCs (mg/batched.MultiBCSolver): grid (B, gz, gy), per-lane
    windows and mask codes.  Returns call(u, rhs, C) over (B, nz, ny, nx)
    arrays (C from stacked mask_code/mask_code_jax per lane), or None."""
    bcs_list = tuple(tuple(tuple(b) for b in bcs) for bcs in bcs_list)
    shape = tuple(int(s) for s in shape)
    if not all(
        supported(shape, bcs, dtype, nsweeps, interpret=interpret)
        for bcs in bcs_list
    ):
        return None
    nb = len(bcs_list)
    nz, ny, nx = shape
    H_z, H_y = _halos(nsweeps)
    tz, ty = pick_tiles(shape, nsweeps)
    dq = np.asarray(dq, dtype=np.float64)
    # Mimic ops.stencils.stencil_weights EXACTLY (w cast to f32, w0 from
    # the f32 sum) so kernel sweeps are bitwise-equal to rb_sweep.
    w32 = (1.0 / (dq * dq)).astype(np.float32)
    w = tuple(float(x) for x in w32)
    w0 = float(np.float32(1.0) / (np.float32(2.0) * np.sum(w32)))

    kernel = functools.partial(
        _fused_kernel,
        nz=nz, ny=ny, nx=nx, tz=tz, ty=ty, H_z=H_z, H_y=H_y, w=w, w0=w0,
        nsweeps=nsweeps, nb=nb,
    )
    grid = (nb, nz // tz, ny // ty)
    W_z, W_y = tz + 2 * H_z, ty + 2 * H_y
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            # every index must be int32 (weak-int64 under x64 fails
            # Mosaic's memref_slice verification)
            (1, tz, ty, nx),
            lambda b, i, j: (jnp.int32(b), jnp.int32(i), jnp.int32(j), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nb, nz, ny, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, W_z, W_y, nx), jnp.float32),
            pltpu.VMEM((2, W_z, W_y, nx), jnp.float32),
            pltpu.VMEM((2, W_z, W_y, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * nb * nsweeps * 11 * nz * ny * nx),
            bytes_accessed=int(4 * 4 * nb * nz * ny * nx),
            transcendentals=0,
        ),
        interpret=interpret,
    )
