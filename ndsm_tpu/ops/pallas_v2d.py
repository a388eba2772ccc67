"""Pallas TPU kernel: VMEM-resident multi-sweep red-black Gauss-Seidel
for 2D levels (the chi-face solves of the vector-potential pipeline).

Replaces the reference's hand-tuned 2D smoother
(fortran/ndsm_optimized.f90:199-334, red_black_gauss_2D) on the TPU: the
six all-Neumann chi solves (ndsm_vector_potential.f90:338-365) run as
ONE lane-batched program whose 2D smoothing previously used the XLA
compact path at ~10% of HBM bandwidth (PERF_NOTES.md).

Design — whole level in VMEM, not a tiled pipeline:

  * A production 2D level is small (512^2 f32 = 1 MB); the entire
    (ny, nx) array fits in VMEM with room for temporaries.  The kernel
    therefore loads u and rhs ONCE, runs ALL ``nsweeps`` sweeps (plus
    any fused epilogue) on the resident array, and writes the result
    once: 12 B/point per SMOOTH CALL (12/ms B per point-sweep) — no
    halos, no window overreads, no per-pass traffic.
  * All-Neumann per-sweep mean subtraction (reference:
    ndsm_optimized.f90:296-312, quirk Q7) happens INSIDE the kernel
    between sweeps — exact semantics with zero extra HBM passes, which
    a tiled kernel cannot do (the mean is a global reduction).  This is
    why the chi faces could not use the tiled 3D kernels.
  * Update expression and operation order match ops/stencils.rb_sweep
    (dense stencil eval, parity+interior masked select, red half then
    black half reading updated red, then mean when all-Neumann) with
    the f32 weight rounding of stencils.stencil_weights — sweeps agree
    with the masked XLA sweep to rounding (FMA contraction differs
    between Mosaic and the XLA CPU/TPU emitters; the all-Neumann mean
    reduction order also differs from jnp.mean's tree).
  * Batched use: the chi driver vmaps the engine over the face lanes.
    pallas_call's generic vmap rule emits int64 grid indices under
    jax_enable_x64, which the axon Mosaic toolchain cannot legalize
    (measured: "failed to legalize 'func.return' (i32, i64, i64)";
    the same bug family as CLAUDE.md's in-kernel-int64 rule) — so the
    builders return a ``jax.custom_batching.custom_vmap`` function
    whose batch rule dispatches to an explicitly batched grid=(B,)
    kernel using the proven pl.ANY + manual int32-indexed DMA pattern
    of ops/pallas_zc.py.  Per-slab DMA (a few MB at 819 GB/s) is
    negligible against the VPU sweep compute, so the batched kernel
    runs a single-slot fetch/compute/store pipeline.

Variants (one kernel, fused epilogues): plain smooth, +residual of the
swept state (descent), +correction add on load (ascent).
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
    "v2d_smooth",
    "v2d_smooth_residual",
    "v2d_smooth_cor",
    "v2d_kernel_supported",
]

# The whole level must fit in VMEM together with the sweep temporaries
# and masks.  Budget measured conservatively against the ~16 MB/core:
# u + rhs + ~5 live temporaries + masks + epilogue streams.
_VMEM_BUDGET = 12 * 1024 * 1024


def _units(residual: bool, with_cor: bool) -> int:
    return 9 + (1 if residual else 0) + (1 if with_cor else 0)


def v2d_kernel_supported(
    shape,
    bcs: BCS,
    dtype,
    nsweeps: int,
    interpret: bool = False,
    residual: bool = False,
    with_cor: bool = False,
) -> bool:
    if len(shape) != 2 or jnp.dtype(dtype) != jnp.float32:
        return False
    if nsweeps < 1 or nsweeps > 16:
        return False
    ny, nx = (int(v) for v in shape)
    if min(ny, nx) < 3:
        return False
    if not interpret and (nx % 128 != 0 or ny % 8 != 0):
        return False  # lane/sublane-aligned dense arrays
    return _units(residual, with_cor) * 4 * ny * nx <= _VMEM_BUDGET


def _shift_edge(v, axis: int):
    """(lower, upper) neighbors along ``axis`` with edge substitution to
    index 1 / n-2 — identical to ops/stencils._neighbors (Neumann index
    reflection; Dirichlet faces are masked out of the update)."""
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


def _sweep_body(
    u,
    rhs,
    cor,
    *,
    ny: int,
    nx: int,
    w: Tuple[float, float],
    w0: float,
    nsweeps: int,
    p0: int,
    bcs: BCS,
    all_neumann: bool,
    residual: bool,
):
    """The VMEM compute: nsweeps red-black sweeps (+mean) on a resident
    (ny, nx) array; returns (u_out, residual_or_None).  Shared by the
    gridless and the explicitly batched kernels."""
    f32 = jnp.float32
    if cor is not None:
        u = u + cor

    # Masks from in-kernel iota (int32 everywhere — the axon Mosaic
    # int64 lowering bug, CLAUDE.md).
    iy = lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    ix = lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    s = iy + ix
    interior = jnp.ones((ny, nx), dtype=jnp.bool_)
    for ax, (blo, bhi) in enumerate(bcs):
        ii = iy if ax == 0 else ix
        n_ax = ny if ax == 0 else nx
        if blo == "D":
            interior = interior & (ii > jnp.int32(0))
        if bhi == "D":
            interior = interior & (ii < jnp.int32(n_ax - 1))
    red_mask = (lax.rem(s, jnp.int32(2)) == jnp.int32(p0)) & interior
    black_mask = (lax.rem(s, jnp.int32(2)) == jnp.int32(1 - p0)) & interior

    wy = f32(w[0])
    wx = f32(w[1])
    w0c = f32(w0)
    inv_n = f32(1.0 / (ny * nx))

    def half(v, mask):
        lo0, hi0 = _shift_edge(v, 0)
        lo1, hi1 = _shift_edge(v, 1)
        total = (lo0 + hi0) * wy + (lo1 + hi1) * wx
        vnew = (total - rhs) * w0c
        return jnp.where(mask, vnew, v)

    for _ in range(nsweeps):
        u = half(u, red_mask)
        u = half(u, black_mask)
        if all_neumann:
            # reference: subtract the global mean after every sweep
            # (ndsm_optimized.f90:296-312); the whole array is resident,
            # so this is a free VPU reduction here.
            u = u - jnp.sum(u) * inv_n

    res = None
    if residual:
        lo0, hi0 = _shift_edge(u, 0)
        lo1, hi1 = _shift_edge(u, 1)
        lap = (lo0 - 2.0 * u + hi0) * wy + (lo1 - 2.0 * u + hi1) * wx
        res = jnp.where(interior, rhs - lap, f32(0.0))
    return u, res


def _v2d_kernel(
    *refs,
    residual: bool,
    with_cor: bool,
    **body_kw,
):
    # ref order: u, rhs[, cor] -> out[, res]
    u_ref, rhs_ref = refs[0], refs[1]
    k = 2
    cor = None
    if with_cor:
        cor = refs[k][...]
        k += 1
    out_ref = refs[k]
    k += 1
    res_ref = None
    if residual:
        res_ref = refs[k]

    u, res = _sweep_body(
        u_ref[...], rhs_ref[...], cor, residual=residual, **body_kw
    )
    out_ref[...] = u
    if residual:
        res_ref[...] = res


def _v2d_batched_kernel(
    *refs,
    B: int,
    residual: bool,
    with_cor: bool,
    **body_kw,
):
    """grid=(B,) form: pl.ANY HBM refs + manual int32-indexed slab DMA
    (the ops/pallas_zc.py pattern — the only index machinery the axon
    Mosaic toolchain accepts under jax_enable_x64).  Single-slot
    fetch/compute/store: slab DMA is negligible against the sweeps."""
    n_in = 2 + (1 if with_cor else 0)
    n_out = 2 if residual else 1
    hbm_in, refs = refs[:n_in], refs[n_in:]
    hbm_out, refs = refs[:n_out], refs[n_out:]
    bufs, refs = refs[:n_in], refs[n_in:]
    in_sems, out_sems = refs
    i32 = jnp.int32
    b = i32(pl.program_id(0))
    sl = (pl.ds(b, 1), slice(None), slice(None))

    # Drain the PREVIOUS slab's output copies BEFORE fetching into the
    # same buffers (single-slot pipeline; buffers are reused per step).
    @pl.when(b >= i32(1))
    def _():
        prev = (pl.ds(b - i32(1), 1), slice(None), slice(None))
        pltpu.make_async_copy(
            bufs[0].at[...], hbm_out[0].at[prev], out_sems.at[i32(0)]
        ).wait()
        if residual:
            pltpu.make_async_copy(
                bufs[1].at[...], hbm_out[1].at[prev], out_sems.at[i32(1)]
            ).wait()

    fetches = [
        pltpu.make_async_copy(src.at[sl], buf.at[...], in_sems.at[i32(k)])
        for k, (src, buf) in enumerate(zip(hbm_in, bufs))
    ]
    for d in fetches:
        d.start()
    for d in fetches:
        d.wait()

    cor = bufs[2][0] if with_cor else None
    u, res = _sweep_body(
        bufs[0][0], bufs[1][0], cor, residual=residual, **body_kw
    )
    bufs[0][...] = u[None]
    out_dmas = [
        pltpu.make_async_copy(bufs[0].at[...], hbm_out[0].at[sl], out_sems.at[i32(0)])
    ]
    if residual:
        bufs[1][...] = res[None]
        out_dmas.append(
            pltpu.make_async_copy(
                bufs[1].at[...], hbm_out[1].at[sl], out_sems.at[i32(1)]
            )
        )
    for d in out_dmas:
        d.start()

    @pl.when(b == i32(B - 1))
    def _():
        for d in out_dmas:
            d.wait()


def _build(
    bcs,
    dq,
    shape,
    nsweeps,
    dtype,
    interpret,
    residual=False,
    with_cor=False,
):
    bcs = tuple(tuple(b) for b in bcs)
    shape = tuple(int(s) for s in shape)
    if residual and with_cor:
        raise ValueError("residual and with_cor variants are exclusive")
    if not v2d_kernel_supported(
        shape, bcs, dtype, nsweeps, interpret=interpret, residual=residual,
        with_cor=with_cor,
    ):
        return None
    ny, nx = shape
    # Mimic ops.stencils.stencil_weights EXACTLY (w cast to f32, w0 from
    # the f32 sum) so kernel sweeps match rb_sweep's arithmetic.
    dq = np.asarray(dq, dtype=np.float64)
    w32 = (1.0 / (dq * dq)).astype(np.float32)
    w = tuple(float(x) for x in w32)
    w0 = float(np.float32(1.0) / (np.float32(2.0) * np.sum(w32)))
    p0 = first_color_parity(bcs)

    kernel = functools.partial(
        _v2d_kernel,
        ny=ny, nx=nx, w=w, w0=w0, nsweeps=nsweeps, p0=p0, bcs=bcs,
        all_neumann=is_all_neumann(bcs), residual=residual,
        with_cor=with_cor,
    )
    n_in = 2 + (1 if with_cor else 0)
    out_shape = [jax.ShapeDtypeStruct(shape, jnp.float32)]
    if residual:
        out_shape.append(jax.ShapeDtypeStruct(shape, jnp.float32))
    # all refs are whole-array VMEM blocks (no grid)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=int((2 * nsweeps + (1 if residual else 0)) * 8 * ny * nx),
            bytes_accessed=int((n_in + len(out_shape)) * 4 * ny * nx),
            transcendentals=0,
        ),
        interpret=interpret,
    )


def _build_batched(
    B,
    bcs,
    dq,
    shape,
    nsweeps,
    dtype,
    interpret,
    residual=False,
    with_cor=False,
):
    """Explicitly batched (B, ny, nx) kernel — grid=(B,), pl.ANY refs,
    manual int32 slab DMA (see module docstring for why the generic
    vmap rule cannot be used on the axon toolchain)."""
    bcs = tuple(tuple(b) for b in bcs)
    ny, nx = (int(s) for s in shape)
    dq = np.asarray(dq, dtype=np.float64)
    w32 = (1.0 / (dq * dq)).astype(np.float32)
    w = tuple(float(x) for x in w32)
    w0 = float(np.float32(1.0) / (np.float32(2.0) * np.sum(w32)))
    p0 = first_color_parity(bcs)

    kernel = functools.partial(
        _v2d_batched_kernel,
        B=int(B), ny=ny, nx=nx, w=w, w0=w0, nsweeps=nsweeps, p0=p0,
        bcs=bcs, all_neumann=is_all_neumann(bcs), residual=residual,
        with_cor=with_cor,
    )
    n_in = 2 + (1 if with_cor else 0)
    n_out = 2 if residual else 1
    out_shape = [jax.ShapeDtypeStruct((B, ny, nx), jnp.float32)]
    if residual:
        out_shape.append(jax.ShapeDtypeStruct((B, ny, nx), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_out,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((1, ny, nx), jnp.float32)] * n_in
        + [
            pltpu.SemaphoreType.DMA((n_in,)),
            pltpu.SemaphoreType.DMA((n_out,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(B * (2 * nsweeps + (1 if residual else 0)) * 8 * ny * nx),
            bytes_accessed=int(B * (n_in + n_out) * 4 * ny * nx),
            transcendentals=0,
        ),
        interpret=interpret,
    )


def _with_batch_rule(call, bcs, dq, shape, nsweeps, dtype, interpret,
                     residual=False, with_cor=False):
    """Wrap the gridless call in a custom_vmap whose batch rule
    dispatches to the explicitly batched kernel (memoized per B)."""
    shape = tuple(int(s) for s in shape)
    bcache = {}

    def _batched(B):
        f = bcache.get(B)
        if f is None:
            f = _build_batched(
                B, bcs, dq, shape, nsweeps, dtype, interpret,
                residual=residual, with_cor=with_cor,
            )
            bcache[B] = f
        return f

    if with_cor:

        @jax.custom_batching.custom_vmap
        def apply(u, cor, rhs):
            return call(u, rhs, cor)[0]

        @apply.def_vmap
        def _rule(axis_size, in_batched, u, cor, rhs):
            full = (axis_size,) + shape
            if not in_batched[0]:
                u = jnp.broadcast_to(u, full)
            if not in_batched[1]:
                cor = jnp.broadcast_to(cor, full)
            if not in_batched[2]:
                rhs = jnp.broadcast_to(rhs, full)
            return _batched(axis_size)(u, rhs, cor)[0], True

        return apply

    if residual:

        @jax.custom_batching.custom_vmap
        def apply(u, rhs):
            out = call(u, rhs)
            return out[0], out[1]

        @apply.def_vmap
        def _rule(axis_size, in_batched, u, rhs):
            full = (axis_size,) + shape
            if not in_batched[0]:
                u = jnp.broadcast_to(u, full)
            if not in_batched[1]:
                rhs = jnp.broadcast_to(rhs, full)
            out = _batched(axis_size)(u, rhs)
            return (out[0], out[1]), (True, True)

        return apply

    @jax.custom_batching.custom_vmap
    def apply(u, rhs):
        return call(u, rhs)[0]

    @apply.def_vmap
    def _rule(axis_size, in_batched, u, rhs):
        full = (axis_size,) + shape
        if not in_batched[0]:
            u = jnp.broadcast_to(u, full)
        if not in_batched[1]:
            rhs = jnp.broadcast_to(rhs, full)
        return _batched(axis_size)(u, rhs)[0], True

    return apply


def v2d_smooth(bcs: BCS, dq, shape, nsweeps: int, dtype=jnp.float32,
               interpret: bool = False):
    """call(u, rhs) -> u': ``nsweeps`` red-black sweeps (with per-sweep
    mean subtraction when all-Neumann) in ONE HBM pass, equal to
    ``nsweeps`` applications of stencils.rb_sweep to rounding.
    vmap-safe: batching dispatches to the explicit grid=(B,) kernel."""
    call = _build(bcs, dq, shape, nsweeps, dtype, interpret)
    if call is None:
        return None
    return _with_batch_rule(call, bcs, dq, shape, nsweeps, dtype, interpret)


def v2d_smooth_residual(bcs: BCS, dq, shape, nsweeps: int, dtype=jnp.float32,
                        interpret: bool = False):
    """call(u, rhs) -> (u', r): sweeps + the residual of the swept state
    (descent fusion; reference pairing ndsm_multigrid_core.f90:482-560)."""
    call = _build(bcs, dq, shape, nsweeps, dtype, interpret, residual=True)
    if call is None:
        return None
    return _with_batch_rule(
        call, bcs, dq, shape, nsweeps, dtype, interpret, residual=True
    )


def v2d_smooth_cor(bcs: BCS, dq, shape, nsweeps: int, dtype=jnp.float32,
                   interpret: bool = False):
    """call(u, cor, rhs) -> u': sweeps on (u + cor) — ascent fusion."""
    call = _build(bcs, dq, shape, nsweeps, dtype, interpret, with_cor=True)
    if call is None:
        return None
    return _with_batch_rule(
        call, bcs, dq, shape, nsweeps, dtype, interpret, with_cor=True
    )
