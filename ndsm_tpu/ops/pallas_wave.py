"""Pallas TPU kernel: z-wavefront multi-sweep red-black Gauss-Seidel.

Second-generation production smoother (the windowed kernel it supersedes
is ops/pallas_fused.py; the reference hot loop both replace is
fortran/ndsm_optimized.f90:40-191).  The windowed kernel computes both
color half-updates densely over (tz+2H, ty+2H, nx) halo windows, so at
useful tile sizes the VPU spends >half its work on discarded halo points
and VMEM caps the fusion depth at 2 sweeps (PERF_NOTES.md round 2).

This kernel eliminates the z halo entirely with temporal wavefront
blocking over z-planes:

  * A ring of P = 2*nsweeps + 4 planes of (u, rhs, C) streams through
    VMEM via per-plane async DMA (prefetch depth 2).
  * When plane z arrives, one half-color *stage* is applied per plane in
    wavefront order: stage s (s = 1..2*nsweeps; odd = first color, even
    = second) updates plane z - s IN PLACE.  A half-color update writes
    only its own color and reads only the opposite color, so in-place
    per-plane updates reproduce the masked sweep sequence exactly: when
    stage s runs on plane p, planes p-1 and p+1 hold precisely stage
    s-1 state for the color it reads.
  * Plane z - 2*nsweeps is then final and leaves by async DMA; its ring
    slot is reclaimed (semaphore-waited) before the fetch that reuses it.

Per pass of ``nsweeps`` sweeps each point is read once, written once,
and touched by exactly 2*nsweeps half-updates — no redundant compute in
z, and none in y either when the row window spans ny (the default at
256^3).  HBM traffic is (3 reads + 1 write)/nsweeps arrays per sweep vs
~3 arrays for the best unfused XLA formulation.

The parity/freeze mask-code array C (0 = second color, 1 = first color,
2 = frozen Dirichlet) is streamed exactly as in ops/pallas_fused.py —
no in-kernel iota (the axon Mosaic bug catalog in PERF_NOTES.md).  Every
in-kernel integer is an explicit jnp.int32 (weak-int64 traps, ibid).

Neumann faces use the same in-buffer index reflection as the windowed
kernel: z reflection picks ring plane 1 / nz-2 at the global z faces;
y/x reflection is the edge-substituting concat-shift, globally correct
when the row window touches a true y face and discarded (halo) when it
does not.
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

from .stencils import BCS, is_all_neumann
from .pallas_fused import mask_code, mask_code_jax

__all__ = [
    "wave_smooth_3d",
    "wave_smooth_3d_batched",
    "wave_supported",
    "pick_row_window",
]

# VMEM budget for the three plane rings (per-core VMEM ~16 MB; leave
# room for stage temporaries and compiler scratch).
_VMEM_BUDGET = 12 * 1024 * 1024

_PREFETCH = 2  # planes fetched ahead of the wavefront


def _ring_depth(nsweeps: int) -> int:
    # planes z-2ns-1 .. z live (stage 2ns at z-2ns reads z-2ns-1), plus
    # prefetch margin so slot reuse trails the out-DMA by >= 2 steps.
    return 2 * nsweeps + 2 + _PREFETCH


def _y_halo(nsweeps: int) -> int:
    # dependency radius 2*nsweeps, rounded to the 8-sublane DMA alignment
    return -(-2 * nsweeps // 8) * 8


def pick_row_window(
    shape: Tuple[int, int, int], nsweeps: int
) -> Optional[Tuple[int, int]]:
    """(ty, W_y): the y extent of the output stripe and of the fetched
    row window (W_y = ty + 2*halo, or exactly ny when one stripe spans
    the axis — then there is no y halo at all).  None if no stripe fits
    the VMEM ring budget."""
    nz, ny, nx = shape
    P = _ring_depth(nsweeps)
    H_y = _y_halo(nsweeps)
    best = None
    best_frac = 0.0
    for ty in range(8, ny + 1, 8):
        if ny % ty:
            continue
        W_y = ny if ty == ny else ty + 2 * H_y
        if W_y > ny:  # clamped window would exceed the axis
            continue
        if 3 * P * W_y * nx * 4 > _VMEM_BUDGET:
            continue
        frac = ty / W_y
        if frac > best_frac or (frac == best_frac and best and ty > best[0]):
            best_frac, best = frac, (ty, W_y)
    return best


def wave_supported(
    shape, bcs: BCS, dtype, nsweeps: int, interpret: bool = False
) -> bool:
    if len(shape) != 3 or jnp.dtype(dtype) != jnp.float32:
        return False
    if is_all_neumann(bcs):
        return False  # per-sweep global mean: XLA path
    if nsweeps < 1 or nsweeps > 8:
        return False
    nz, ny, nx = shape
    if nz < 2:
        return False
    if not interpret and nx % 128 != 0:
        return False  # lane-aligned DMA slices only (axon Mosaic)
    if not interpret and ny % 8 != 0:
        return False  # sublane-aligned row windows
    return pick_row_window(tuple(shape), nsweeps) is not None


def _shift_edge(u, axis: int):
    """(lower, upper) neighbors along ``axis`` of a plane value with edge
    substitution to index 1 / n-2 — ops/stencils._neighbors on one plane."""
    n = u.shape[axis]
    lo = jnp.concatenate(
        [
            lax.slice_in_dim(u, 1, 2, axis=axis),
            lax.slice_in_dim(u, 0, n - 1, axis=axis),
        ],
        axis=axis,
    )
    hi = jnp.concatenate(
        [
            lax.slice_in_dim(u, 1, n, axis=axis),
            lax.slice_in_dim(u, n - 2, n - 1, axis=axis),
        ],
        axis=axis,
    )
    return lo, hi


def _wave_kernel(
    u_hbm,
    rhs_hbm,
    c_hbm,
    out_ref,
    u_ring,
    r_ring,
    c_ring,
    in_sems,
    out_sems,
    *,
    nz: int,
    ny: int,
    nx: int,
    ty: int,
    W_y: int,
    P: int,
    w: Tuple[float, float, float],
    w0: float,
    nsweeps: int,
    nb: int = 0,
):
    # nb = 0: grid (gy,) over one volume; nb > 0: grid (nb, gy) over a
    # stacked (nb, nz, ny, nx) state with per-lane mask codes.
    if nb:
        b = jnp.int32(pl.program_id(0))
        j = jnp.int32(pl.program_id(1))
    else:
        b = jnp.int32(0)
        j = jnp.int32(pl.program_id(0))
    NS2 = 2 * nsweeps
    i32 = jnp.int32

    if ty == ny:
        sy = i32(0)
        y_off = i32(0)
    else:
        H_y = (W_y - ty) // 2
        sy = jnp.minimum(
            jnp.maximum(j * i32(ty) - i32(H_y), i32(0)), i32(ny - W_y)
        )
        sy = pl.multiple_of(sy, 8)
        y_off = pl.multiple_of(j * i32(ty) - sy, 8)

    def fetch_dmas(q):
        qs = lax.rem(q, i32(P))
        src = (pl.ds(q, 1), pl.ds(sy, W_y), slice(None))
        if nb:
            src = (b,) + src
        return [
            pltpu.make_async_copy(
                hbm.at[src], ring.at[pl.ds(qs, 1)], in_sems.at[qs, i32(k)]
            )
            for k, (hbm, ring) in enumerate(
                ((u_hbm, u_ring), (rhs_hbm, r_ring), (c_hbm, c_ring))
            )
        ]

    def out_dma(p):
        ps = lax.rem(p, i32(P))
        dst = (pl.ds(p, 1), pl.ds(pl.multiple_of(j * i32(ty), 8), ty), slice(None))
        if nb:
            dst = (b,) + dst
        return pltpu.make_async_copy(
            u_ring.at[pl.ds(ps, 1), pl.ds(y_off, ty), slice(None)],
            out_ref.at[dst],
            out_sems.at[ps],
        )

    # Prologue: start the first _PREFETCH plane fetches.
    for q0 in range(min(_PREFETCH, nz)):
        for d in fetch_dmas(i32(q0)):
            d.start()

    def stage(p, first_color):
        """One half-color update of plane p, in place in the ring."""
        ps = lax.rem(p, i32(P))
        plo = jnp.where(p > i32(0), p - i32(1), i32(1))
        phi = jnp.where(p < i32(nz - 1), p + i32(1), i32(nz - 2))
        U = u_ring[ps]
        lo0 = u_ring[lax.rem(plo, i32(P))]
        hi0 = u_ring[lax.rem(phi, i32(P))]
        lo1, hi1 = _shift_edge(U, 0)
        lo2, hi2 = _shift_edge(U, 1)
        s = (
            (lo0 + hi0) * jnp.float32(w[0])
            + (lo1 + hi1) * jnp.float32(w[1])
            + (lo2 + hi2) * jnp.float32(w[2])
        )
        unew = (s - r_ring[ps]) * jnp.float32(w0)
        code = jnp.float32(1.0) if first_color else jnp.float32(0.0)
        u_ring[ps] = jnp.where(c_ring[ps] == code, unew, U)

    def body(z, carry):
        z = i32(z)
        # Prefetch plane z + _PREFETCH (reclaiming its ring slot first).
        nxt = z + i32(_PREFETCH)

        @pl.when(nxt < i32(nz))
        def _():
            @pl.when(nxt >= i32(P))
            def _():
                out_dma(nxt - i32(P)).wait()

            for d in fetch_dmas(nxt):
                d.start()

        # Wait for plane z (started _PREFETCH steps ago / in the prologue).
        @pl.when(z < i32(nz))
        def _():
            for d in fetch_dmas(z):
                d.wait()

        # Wavefront: stage s finalizes one more half-color of plane z - s.
        for s in range(1, NS2 + 1):
            p = z - i32(s)

            @pl.when(jnp.logical_and(p >= i32(0), p < i32(nz)))
            def _(p=p, s=s):
                stage(p, first_color=(s % 2 == 1))

        # Plane z - 2*nsweeps is final: ship it.
        pout = z - i32(NS2)

        @pl.when(jnp.logical_and(pout >= i32(0), pout < i32(nz)))
        def _():
            out_dma(pout).start()

        return carry

    # int32-typed bounds: python-int bounds give an int64 induction var
    # under jax_enable_x64, and any in-kernel i64->i32 convert recurses
    # the Mosaic lowering (PERF_NOTES.md).
    lax.fori_loop(i32(0), i32(nz + NS2), body, i32(0), unroll=False)

    # Drain the out-DMAs not reclaimed by a fetch (the last min(P, nz)).
    for r in range(min(P, nz)):
        p = i32(nz - 1 - r)
        out_dma(p).wait()


def _build(bcs_list, dq, shape, nsweeps, interpret, nb):
    nz, ny, nx = shape
    ty, W_y = pick_row_window(shape, nsweeps)
    P = _ring_depth(nsweeps)
    # Mimic ops.stencils.stencil_weights EXACTLY (w cast to f32, w0 from
    # the f32 sum) so kernel sweeps are bitwise-equal to rb_sweep.
    dq = np.asarray(dq, dtype=np.float64)
    w32 = (1.0 / (dq * dq)).astype(np.float32)
    w = tuple(float(x) for x in w32)
    w0 = float(np.float32(1.0) / (np.float32(2.0) * np.sum(w32)))

    kernel = functools.partial(
        _wave_kernel,
        nz=nz, ny=ny, nx=nx, ty=ty, W_y=W_y, P=P, w=w, w0=w0,
        nsweeps=nsweeps, nb=nb,
    )
    grid = (nb, ny // ty) if nb else (ny // ty,)
    vol = (nb or 1) * nz * ny * nx
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(
            ((nb,) if nb else ()) + (nz, ny, nx), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((P, W_y, nx), jnp.float32),
            pltpu.VMEM((P, W_y, nx), jnp.float32),
            pltpu.VMEM((P, W_y, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((P, 3)),
            pltpu.SemaphoreType.DMA((P,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * nsweeps * 11 * vol),
            bytes_accessed=int(4 * 4 * vol),
            transcendentals=0,
        ),
        interpret=interpret,
    )


def wave_smooth_3d(
    bcs: BCS,
    dq,
    shape,
    nsweeps: int,
    dtype=jnp.float32,
    interpret: bool = False,
    with_mask_arg: bool = False,
):
    """Build the wavefront-smoother callable for one configuration, or
    None if unsupported (caller falls back to the windowed kernel or the
    XLA path).  Same contract as ops.pallas_fused.fused_smooth_3d:
    applies ``nsweeps`` red-black sweeps, equal to ``nsweeps``
    applications of ops.stencils.rb_sweep up to f32 rounding."""
    bcs = tuple(tuple(b) for b in bcs)
    shape = tuple(int(s) for s in shape)
    if not wave_supported(shape, bcs, dtype, nsweeps, interpret=interpret):
        return None
    call = _build([bcs], dq, shape, nsweeps, interpret, nb=0)
    if with_mask_arg:
        return call
    C_dev = jnp.asarray(mask_code(shape, bcs))
    call_jit = jax.jit(call)

    def f(u, rhs):
        return call_jit(u, rhs, C_dev)

    return f


def wave_smooth_3d_batched(
    bcs_list,
    dq,
    shape,
    nsweeps: int,
    dtype=jnp.float32,
    interpret: bool = False,
):
    """Batched form over B stacked problems with per-lane BCs
    (mg/batched.MultiBCSolver): grid (B, gy), per-lane mask codes.
    Returns call(u, rhs, C) over (B, nz, ny, nx) arrays, or None."""
    bcs_list = tuple(tuple(tuple(b) for b in bcs) for bcs in bcs_list)
    shape = tuple(int(s) for s in shape)
    if not all(
        wave_supported(shape, bcs, dtype, nsweeps, interpret=interpret)
        for bcs in bcs_list
    ):
        return None
    return _build(bcs_list, dq, shape, nsweeps, interpret, nb=len(bcs_list))
