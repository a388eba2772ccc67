"""Pallas TPU kernel: double-float (f32-pair) Poisson defect residual.

TPU-native replacement for the mixed-precision outer loop's float64
residual pass (reference context: the defect the reference never needed
— it runs native f64 loops, fortran/ndsm_poisson.f90:280-353; here f64
is software-emulated and Mosaic rejects f64 entirely, so the emulated
XLA residual runs at ~10% of HBM bandwidth, PERF_NOTES.md).

Representation: a float64 value x is carried as a pair of float32s
(hi, lo) with hi = f32(x), lo = f32(x - hi) — relative precision
~2^-48 ≈ 3.6e-15 (IEEE double-float).  The kernel computes

    r = rhs - sum_ax w_ax * ((lo_nb - u) + (hi_nb - u))

to the *pair representation floor* using error-free transformations,
and emits the plain-f32 residual (exactly what the mixed engine stores:
mg/poisson._mixed_group casts the scaled defect to f32 anyway).

Error budget (h = grid spacing, w = 1/h^2, U = |u| scale, R = |rhs|):
  * hi channel: neighbor differences d ~ u'h suffer w-amplification of
    any plain-f32 rounding (w * ulp(d) ~ 1e-5 R), so d uses TwoDiff,
    the d-pair sum TwoSum, the weight product a Dekker TwoProd against
    the pair-split weight, and the cross-axis accumulation TwoSum —
    residual error ~1e-13 R.
  * lo channel: |u_lo| <= ulp(|u|)/2, so a PLAIN f32 stencil on u_lo
    keeps its rounding error (~6e-8 * w * |u_lo| ~ 4e-10 R) at the pair
    representation floor w * 2^-48 U — compensating it further cannot
    improve the achievable residual of a pair-valued iterate.
  * combine: r_main = TwoDiff(rhs_hi, L_hi); the medium-magnitude lo
    Laplacian joins by TwoSum; all <=ulp-scale terms join plain.
The measured du floor of the resulting defect iteration is ~1e-13,
comfortably below the reference's vc_tol = 1e-10 contract (see
tests/test_pallas_df.py).

Boundary semantics are those of ops/stencils.poisson_residual: Neumann
index reflection (the out-of-range neighbor i = -1 reads u[1]) realized
as a face-row swap of the already-computed lower/upper differences, and
residual zeroed on Dirichlet-face points (static bcs -> in-kernel
global-index masks).

Pipeline: (tz+2, ty+16, nx) windows of each stream double-buffered
through VMEM with the fetch/compute/ship schedule proven by
ops/pallas_zc.py on the axon toolchain; 1-deep z halo, 8-aligned y halo
(sublane DMA alignment), full-x rows (lane alignment nx % 128).
HBM traffic: 20 B/point (u pair + rhs pair + f32 residual out), or
12 B/point for the zero-rhs variant the vector-potential component
solves use — versus 24+ B/point of emulated-f64 XLA passes at a tenth
of the bandwidth.
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

from .stencils import BCS

__all__ = [
    "df_decompose",
    "df_reconstruct",
    "df_add",
    "df_add_scaled",
    "df_residual_3d",
    "df_residual_supported",
    "pick_tiles_df",
    "df_residual_sharded_3d",
    "df_sharded_supported",
    "df_sharded_halos",
    "pick_tiles_df_sharded",
]

_VMEM_BUDGET = 12 * 1024 * 1024

_F32 = jnp.float32
_SPLIT = 4097.0  # 2**12 + 1: Veltkamp split constant for f32


# ----------------------------------------------------------------------
# XLA-level double-float glue (outside the kernel)
# ----------------------------------------------------------------------


def df_decompose(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """float64 array -> (hi, lo) float32 pair with hi + lo == x to f32-pair
    precision (hi = f32(x), lo = f32(x - hi); exact because x - hi is
    computed in f64 and |x - hi| <= ulp(hi)/2 fits one f32)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def df_reconstruct(hi: jax.Array, lo: jax.Array, dtype=jnp.float64) -> jax.Array:
    """(hi, lo) float32 pair -> float64 (exact: both casts are exact)."""
    return hi.astype(dtype) + lo.astype(dtype)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _two_diff(a, b):
    s = a - b
    bb = s - a
    err = (a - (s - bb)) - (b + bb)
    return s, err


def _quick_renorm(s, e):
    """Renormalize a non-overlapping-ish pair (|e| not >> ulp(s))."""
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


def df_add_scaled(uh, ul, e32, s):
    """Pair update u <- u + s*e32 (s, e32 float32), renormalized.

    Pure f32 elementwise (XLA fuses it into one pass); the product's
    plain rounding (~6e-8 * s * |e|) only perturbs the NEXT defect's
    input, which the defect-correction iteration measures and corrects —
    only the final group's update rounding (<= 6e-8 * du_last) persists.
    """
    p = (s * e32).astype(jnp.float32)
    t, te = _two_sum(uh, p)
    return _quick_renorm(t, te + ul)


def df_add(uh, ul, e32):
    """Pair update u <- u + e32 (exact TwoSum + renormalize)."""
    t, te = _two_sum(uh, e32)
    return _quick_renorm(t, te + ul)


# ----------------------------------------------------------------------
# Kernel
# ----------------------------------------------------------------------


def pick_tiles_df(
    shape: Tuple[int, int, int], n_stream: int = 5
) -> Optional[Tuple[int, int, int, int]]:
    """(tz, ty, W_z, W_y): tile divisors and window extents under the
    VMEM budget.  Halos: 1 plane in z, 8 rows in y (sublane alignment);
    a window capped at the full axis is halo-free there.  Budget counts
    ``n_stream`` double-buffered dense streams (inputs + dense outputs;
    5 for the plain full-rhs kernel, 8 for the update-fused one) + the
    compensated stencil's live temporaries (~12 dense units measured as
    Mosaic scoped stack)."""
    nz, ny, nx = shape
    units = 2 * n_stream + 12
    best, best_frac = None, 0.0
    for tz in range(1, min(nz, 256) + 1):
        if nz % tz:
            continue
        for ty in range(8, min(ny, 256) + 1, 8):
            if ny % ty:
                continue
            wz = min(nz, tz + 2)
            wy = min(ny, ty + 16)
            if units * wz * wy * nx * 4 > _VMEM_BUDGET:
                continue
            frac = (tz * ty) / (wz * wy)
            if frac > best_frac:
                best_frac, best = frac, (tz, ty, wz, wy)
    return best


def df_residual_supported(
    shape, dtype, interpret: bool = False, real_shape=None, update: bool = False
) -> bool:
    """``real_shape``: for PADDED operation, the real problem extents
    (nz, ny_real, nx_real) with ny_real <= ny, nx_real <= nx — the
    kernel applies the face reflection/zeroing at the REAL y/x upper
    faces and zeroes the residual in the pad region, letting aligned
    padded storage serve unaligned problems (same convention as
    ops/pallas_zc.py; z is never padded).

    ``update``: the pair-update-fused variant (extra e stream in, the
    updated pair streamed out) — larger VMEM footprint, so support is
    checked at its stream count."""
    if len(shape) != 3 or jnp.dtype(dtype) != jnp.float32:
        return False
    nz, ny, nx = shape
    if real_shape is not None:
        rz, ry, rx = (int(v) for v in real_shape)
        if rz != nz or not (3 <= ry <= ny) or not (3 <= rx <= nx):
            return False
    if min(nz, ny, nx) < 3:
        return False  # face-swap reflection assumes the faces are distinct
    if not interpret and nx % 128 != 0:
        return False  # lane-aligned dense DMA rows
    if not interpret and ny % 8 != 0:
        return False  # sublane-aligned window clamps
    n_stream = 8 if update else 5  # full-rhs variant (worst case)
    return pick_tiles_df(tuple(shape), n_stream) is not None


def _clamp_shifts(v, axis: int):
    """(lower, upper) in-window clamp shifts: out-of-window neighbors
    repeat the edge value.  For real points the window provides the true
    neighbor (1-deep halo); window edges that coincide with GLOBAL faces
    are fixed up by the face-row difference swap in the kernel."""
    n = v.shape[axis]
    lo = jnp.concatenate(
        [lax.slice_in_dim(v, 0, 1, axis=axis), lax.slice_in_dim(v, 0, n - 1, axis=axis)],
        axis=axis,
    )
    hi = jnp.concatenate(
        [lax.slice_in_dim(v, 1, n, axis=axis), lax.slice_in_dim(v, n - 1, n, axis=axis)],
        axis=axis,
    )
    return lo, hi


def _df_stencil_channels(uh, ul, face_masks, w_pairs, w_splits):
    """Compensated Laplacian of the pair over a VMEM window: returns
    (Lh, Le, Ll) — L(u_hi) as an (hi, err) pair plus the plain-f32
    L(u_lo) (error budget in the module docstring).  ``face_masks(ax)``
    returns (at_lo, at_hi) bool masks selecting the Neumann
    index-reflection difference swap, or (None, None) when the axis'
    window already carries true neighbor planes (halo-extended sharded
    blocks, where the engine pre-fills mirror planes at global faces)."""
    Lh = None
    Le = None
    Ll = jnp.zeros_like(uh)
    for ax in range(3):
        wf, wl = w_pairs[ax]
        wh_h, wh_l = w_splits[ax]
        at_lo, at_hi = face_masks(ax)

        nlo, nhi = _clamp_shifts(uh, ax)
        d1, e1 = _two_diff(nlo, uh)
        d2, e2 = _two_diff(nhi, uh)
        # Neumann index reflection: at the global lower face the lower
        # neighbor is u[1] (== the upper difference); symmetric at the
        # upper face.  Swap from the pre-substitution values.
        if at_lo is not None:
            d1n = jnp.where(at_lo, d2, d1)
            e1n = jnp.where(at_lo, e2, e1)
        else:
            d1n, e1n = d1, e1
        if at_hi is not None:
            d2n = jnp.where(at_hi, d1, d2)
            e2n = jnp.where(at_hi, e1, e2)
        else:
            d2n, e2n = d2, e2

        t, te = _two_sum(d1n, d2n)
        sm = te + (e1n + e2n)

        # Dekker TwoProd of t against the pair-split weight hi part,
        # plus the (plain-magnitude) correction terms.
        p = t * jnp.float32(wf)
        th_c = jnp.float32(_SPLIT) * t
        t_big = th_c - t
        t_h = th_c - t_big
        t_l = t - t_h
        perr = (
            (jnp.float32(wh_h) * t_h - p)
            + jnp.float32(wh_h) * t_l
            + jnp.float32(wh_l) * t_h
        ) + jnp.float32(wh_l) * t_l
        perr = perr + (jnp.float32(wf) * sm + jnp.float32(wl) * t)

        if Lh is None:
            Lh, Le = p, perr
        else:
            Lh, c = _two_sum(Lh, p)
            Le = Le + (c + perr)

        # ---- lo channel: plain stencil on u_lo (error budget in the
        # module docstring: already at the pair representation floor).
        nlo_l, nhi_l = _clamp_shifts(ul, ax)
        dl1 = nlo_l - ul
        dl2 = nhi_l - ul
        dl1n = jnp.where(at_lo, dl2, dl1) if at_lo is not None else dl1
        dl2n = jnp.where(at_hi, dl1, dl2) if at_hi is not None else dl2
        Ll = Ll + (dl1n + dl2n) * jnp.float32(wf)
    return Lh, Le, Ll


def _df_combine(Lh, Le, Ll, rh, rl):
    """r = (rhs_hi + rhs_lo) - (Lh + Le + Ll) to pair accuracy;
    rh is None for the zero-rhs variant."""
    if rh is None:
        rm, rme = _two_diff(jnp.float32(0.0) - Lh, Ll)  # -(Lh) - Ll, exact pair
        smalls = rme - Le
    else:
        rm, rme = _two_diff(rh, Lh)
        rm, c2 = _two_diff(rm, Ll)
        smalls = rme + c2 + (rl - Le)
    return rm + smalls


def _df_kernel(
    *refs,
    nz: int, ny: int, nx: int, tz: int, ty: int, W_z: int, W_y: int,
    w_pairs, w_splits, zero_rhs: bool, bcs: BCS,
    ny_real: int | None = None, nx_real: int | None = None,
    update: bool = False,
):
    # Padded storage: boundary logic keys on the REAL extents; the
    # residual is zeroed in the pad region (the work-storage invariant:
    # pads stay identically zero through the solve).
    ny_real = ny if ny_real is None else ny_real
    nx_real = nx if nx_real is None else nx_real
    pad_y = ny_real < ny
    pad_x = nx_real < nx
    # Ref layout: inputs (uh, ul[, rh, rl][, e]), outputs (r, max
    # [, uh', ul']), dense input buffers, bufO, bufM[, bufOH, bufOL],
    # semaphores.
    k = 0
    uh_hbm, ul_hbm = refs[0], refs[1]
    k = 2
    if zero_rhs:
        rh_hbm = rl_hbm = None
    else:
        rh_hbm, rl_hbm = refs[2], refs[3]
        k = 4
    e_hbm = None
    if update:
        e_hbm = refs[k]
        k += 1
    out_ref, max_ref = refs[k], refs[k + 1]
    k += 2
    outH_ref = outL_ref = None
    if update:
        outH_ref, outL_ref = refs[k], refs[k + 1]
        k += 2
    bufUH, bufUL = refs[k], refs[k + 1]
    k += 2
    if zero_rhs:
        bufRH = bufRL = None
    else:
        bufRH, bufRL = refs[k], refs[k + 1]
        k += 2
    bufE = None
    if update:
        bufE = refs[k]
        k += 1
    bufO, bufM = refs[k], refs[k + 1]
    k += 2
    bufOH = bufOL = None
    if update:
        bufOH, bufOL = refs[k], refs[k + 1]
        k += 2
    in_sems, out_sems = refs[k], refs[k + 1]
    i = jnp.int32(pl.program_id(0))
    j = jnp.int32(pl.program_id(1))
    gy = jnp.int32(pl.num_programs(1))
    step = i * gy + j
    total = jnp.int32(pl.num_programs(0)) * gy
    i32 = jnp.int32

    def _clip(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, i32(lo)), i32(hi))

    def window_starts(ii, jj):
        sz = _clip(ii * i32(tz) - i32(1), 0, nz - W_z)
        sy = _clip(jj * i32(ty) - i32(8), 0, ny - W_y)
        return sz, pl.multiple_of(sy, 8)

    streams = ((uh_hbm, bufUH), (ul_hbm, bufUL))
    if not zero_rhs:
        streams = streams + ((rh_hbm, bufRH), (rl_hbm, bufRL))
    if update:
        streams = streams + ((e_hbm, bufE),)

    def fetch(slot, ii, jj):
        sz, sy = window_starts(ii, jj)
        win = (pl.ds(sz, W_z), pl.ds(sy, W_y), slice(None))
        return [
            pltpu.make_async_copy(src.at[win], buf.at[slot], in_sems.at[slot, i32(k)])
            for k, (src, buf) in enumerate(streams)
        ]

    def out_dmas(slot, ii, jj):
        sz, sy = window_starts(ii, jj)
        z0 = ii * i32(tz)
        y0 = pl.multiple_of(jj * i32(ty), 8)
        src = (slot, pl.ds(z0 - sz, tz), pl.ds(pl.multiple_of(y0 - sy, 8), ty), slice(None))
        dst = (pl.ds(z0, tz), pl.ds(y0, ty), slice(None))
        dmas = [
            pltpu.make_async_copy(bufO.at[src], out_ref.at[dst], out_sems.at[slot, i32(0)]),
            pltpu.make_async_copy(
                bufM.at[slot], max_ref.at[ii, jj], out_sems.at[slot, i32(1)]
            ),
        ]
        if update:
            dmas += [
                pltpu.make_async_copy(
                    bufOH.at[src], outH_ref.at[dst], out_sems.at[slot, i32(2)]
                ),
                pltpu.make_async_copy(
                    bufOL.at[src], outL_ref.at[dst], out_sems.at[slot, i32(3)]
                ),
            ]
        return dmas

    slot = lax.rem(step, i32(2))

    @pl.when(step == i32(0))
    def _():
        for d in fetch(i32(0), i, j):
            d.start()

    @pl.when(step + i32(1) < total)
    def _():
        nstep = step + i32(1)
        ni, nj = nstep // gy, lax.rem(nstep, gy)

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

    sz, sy = window_starts(i, j)
    az = lax.broadcasted_iota(jnp.int32, (W_z, 1, 1), 0)
    ly = lax.broadcasted_iota(jnp.int32, (1, W_y, 1), 1)
    kx = lax.broadcasted_iota(jnp.int32, (1, 1, nx), 2)
    gz = az + sz
    gyy = ly + sy

    def face_masks(ax):
        if ax == 0:
            return gz == i32(0), gz == i32(nz - 1)
        if ax == 1:
            return gyy == i32(0), gyy == i32(ny_real - 1)
        return kx == i32(0), kx == i32(nx_real - 1)

    uh = bufUH[slot]
    ul = bufUL[slot]
    if update:
        # Pair update u <- u + e fused ahead of the stencil — the exact
        # expression sequence of the XLA df_add (TwoSum + renormalize),
        # so the iterate is bitwise-identical to the unfused pipeline.
        # Pad-region inputs are identically zero and stay zero.
        t, te = _two_sum(uh, bufE[slot])
        uh, ul = _quick_renorm(t, te + ul)
        bufOH[slot] = uh
        bufOL[slot] = ul

    Lh, Le, Ll = _df_stencil_channels(uh, ul, face_masks, w_pairs, w_splits)
    if zero_rhs:
        r32 = _df_combine(Lh, Le, Ll, None, None)
    else:
        r32 = _df_combine(Lh, Le, Ll, bufRH[slot], bufRL[slot])

    # ---- Dirichlet-face points: residual is zero (static bcs).
    interior = None

    def _and(m, c):
        return c if m is None else jnp.logical_and(m, c)

    for ax in range(3):
        at_lo, at_hi = face_masks(ax)
        if bcs[ax][0] == "D":
            interior = _and(interior, ~at_lo)
        if bcs[ax][1] == "D":
            interior = _and(interior, ~at_hi)
    if interior is not None:
        r32 = jnp.where(interior, r32, jnp.float32(0.0))
    if pad_y or pad_x:
        in_real = None
        if pad_y:
            in_real = gyy < i32(ny_real)
        if pad_x:
            c = kx < i32(nx_real)
            in_real = c if in_real is None else jnp.logical_and(in_real, c)
        r32 = jnp.where(in_real, r32, jnp.float32(0.0))

    bufO[slot] = r32

    # ---- window max of |r| over the REAL tile (halo rows excluded),
    # broadcast into an (8, 128)-aligned output tile; the engine reduces
    # the (gz, gy, 8, 128) grid output — a few KB — instead of paying a
    # full-array XLA |r| pass.
    oz = i * i32(tz) - sz
    oy = jnp.int32(pl.multiple_of(j * i32(ty), 8)) - sy
    real = (
        (az >= oz) & (az < oz + i32(tz)) & (ly >= oy) & (ly < oy + i32(ty))
    )
    m = jnp.max(jnp.where(real, jnp.abs(r32), jnp.float32(0.0)))
    bufM[slot] = jnp.zeros((8, 128), jnp.float32) + m

    for d in out_dmas(slot, i, j):
        d.start()

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


def df_residual_3d(
    bcs: BCS,
    dq,
    shape,
    zero_rhs: bool = False,
    dtype=jnp.float32,
    interpret: bool = False,
    real_shape=None,
    update: bool = False,
):
    """Build the double-float defect-residual callable, or None if the
    shape is unsupported.  Returns call(u_hi, u_lo[, rhs_hi, rhs_lo]) ->
    (r32, max_tiles) with r32 ~= f32(rhs - L(u)) evaluated at f32-pair
    precision (semantics of ops/stencils.poisson_residual on the
    f64-reconstructed inputs; max deviation ~1e-13 of the stencil-term
    scale) and max_tiles a (gz, gy, 8, 128) array whose jnp.max equals
    max|r32| (per-window maxima, broadcast into aligned tiles).

    ``real_shape``: padded operation on aligned work storage serving an
    unaligned real problem (see df_residual_supported).

    ``update``: the pair-update-fused variant — call(u_hi, u_lo
    [, rhs_hi, rhs_lo], e32) -> (r32, max_tiles, u_hi', u_lo') applies
    u <- u + e (exact TwoSum + renormalize, bitwise the XLA df_add)
    IN-KERNEL before the stencil, and streams the updated pair out.
    This folds the previous defect group's correction into the next
    group's residual pass: the standalone 5-array df_add pass (which
    runs at XLA's ~10%-of-HBM elementwise rate on this chip) disappears
    from every group but the last."""
    bcs = tuple(tuple(b) for b in bcs)
    shape = tuple(int(s) for s in shape)
    if real_shape is not None:
        real_shape = tuple(int(s) for s in real_shape)
        if real_shape == shape:
            real_shape = None
    if not df_residual_supported(
        shape, dtype, interpret=interpret, real_shape=real_shape, update=update
    ):
        return None
    nz, ny, nx = shape
    n_in = (2 if zero_rhs else 4) + (1 if update else 0)
    n_out = 2 + (2 if update else 0)
    n_dense_out = 1 + (2 if update else 0)
    tz, ty, W_z, W_y = pick_tiles_df(shape, n_in + n_dense_out)

    # Weights as f64 -> (hi, lo) f32 pairs; hi parts Veltkamp-split for
    # the in-kernel Dekker products (python-float constants).
    dq = np.asarray(dq, dtype=np.float64)
    w64 = 1.0 / (dq * dq)
    w_hi = w64.astype(np.float32)
    w_lo = (w64 - w_hi.astype(np.float64)).astype(np.float32)
    w_pairs = tuple((float(h), float(l)) for h, l in zip(w_hi, w_lo))

    def _vsplit(a: float):
        c = np.float32(_SPLIT) * np.float32(a)
        big = np.float32(c - np.float32(a))
        h = np.float32(c - big)
        return float(h), float(np.float32(a) - h)

    w_splits = tuple(_vsplit(h) for h, _ in w_pairs)

    kernel = functools.partial(
        _df_kernel,
        nz=nz, ny=ny, nx=nx, tz=tz, ty=ty, W_z=W_z, W_y=W_y,
        w_pairs=w_pairs, w_splits=w_splits, zero_rhs=zero_rhs, bcs=bcs,
        ny_real=None if real_shape is None else real_shape[1],
        nx_real=None if real_shape is None else real_shape[2],
        update=update,
    )
    grid = (nz // tz, ny // ty)
    # Scratch order must match the kernel's ref unpacking: dense input
    # buffers, bufO, bufM[, bufOH, bufOL], in/out semaphores.
    scratch = [pltpu.VMEM((2, W_z, W_y, nx), jnp.float32)] * (n_in + 1) + [
        pltpu.VMEM((2, 8, 128), jnp.float32),
    ]
    if update:
        scratch += [pltpu.VMEM((2, W_z, W_y, nx), jnp.float32)] * 2
    scratch += [
        pltpu.SemaphoreType.DMA((2, n_in)),
        pltpu.SemaphoreType.DMA((2, n_out)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct((grid[0], grid[1], 8, 128), jnp.float32),
    ]
    if update:
        out_shape += [jax.ShapeDtypeStruct(shape, jnp.float32)] * 2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_out,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=int((190 + (6 if update else 0)) * nz * ny * nx),
            bytes_accessed=int((n_in + n_dense_out) * 4 * nz * ny * nx),
            transcendentals=0,
        ),
        interpret=interpret,
    )


# ----------------------------------------------------------------------
# Sharded (per-shard) variant — the defect for the shard_map engine.
#
# The shard's local pair block arrives HALO-EXTENDED by the engine
# (ShardStencilKernels._extend_block): 1 plane per side in z, and an
# 8-aligned halo in y when y is partitioned too — neighbor planes via
# ppermute, node-mirror planes at true global faces.  The mirror IS the
# Neumann index reflection, so extended axes need no in-kernel face
# logic at all; non-extended axes span the full global extent in every
# shard and keep the static face swaps.  Dirichlet-face zeroing on a
# partitioned axis is shard-position-dependent: it rides a streamed
# mask-code array C (2.0 == Dirichlet-face point, the pallas_zc sharded
# convention), keeping one compiled program valid for every shard
# position (SPMD-uniform).  C is loop-invariant, so the engine builds
# and extends it ONCE per solve.
# ----------------------------------------------------------------------


def df_sharded_halos(parts) -> dict:
    """Halo depth per partitioned array axis for the sharded df
    residual: 1 plane in z; the y halo is rounded to the 8-sublane DMA
    alignment (only 1 of the 8 planes is read)."""
    H = {0: 1}
    if 1 in tuple(parts):
        H[1] = 8
    return H


def _df_with_c(bcs: BCS, parts) -> bool:
    """The C mask stream is needed iff a PARTITIONED axis has a
    Dirichlet face (position-dependent zeroing); when present it also
    takes over the non-partitioned axes' Dirichlet zeroing."""
    return any("D" in bcs[ax] for ax in tuple(parts))


def pick_tiles_df_sharded(
    local_shape, n_in: int, y_ext: bool, n_dense_out: int = 1
) -> Optional[Tuple[int, int, int, int]]:
    """(tz, ty, W_z, W_y) over the REAL local block; windows read the
    halo-extended arrays.  Budget: n_in + n_dense_out double-buffered
    dense streams plus ~12 units of compensated-stencil temporaries (the
    measured Mosaic scoped stack of the single-device kernel)."""
    nz, ny, nx = local_shape
    best, best_frac = None, 0.0
    for tz in range(1, min(nz, 256) + 1):
        if nz % tz:
            continue
        for ty in range(8, min(ny, 256) + 1, 8):
            if ny % ty:
                continue
            wz = tz + 2
            wy = ty + 16 if y_ext else min(ny, ty + 16)
            if (2 * (n_in + n_dense_out) + 12) * wz * wy * nx * 4 > _VMEM_BUDGET:
                continue
            frac = (tz * ty) / (wz * wy)
            if frac > best_frac:
                best_frac, best = frac, (tz, ty, wz, wy)
    return best


def df_sharded_supported(
    local_shape, bcs: BCS, parts, dtype, interpret: bool = False,
    update: bool = False,
) -> bool:
    if len(local_shape) != 3 or jnp.dtype(dtype) != jnp.float32:
        return False
    parts = tuple(parts)
    if not parts or any(ax not in (0, 1) for ax in parts):
        return False
    nz, ny, nx = local_shape
    if not interpret and nx % 128 != 0:
        return False
    if not interpret and ny % 8 != 0:
        return False
    if nx < 3:
        return False  # x face swap assumes distinct faces
    if 1 not in parts and ny < 3:
        return False  # y face swap likewise (y unextended)
    for ax, H in df_sharded_halos(parts).items():
        if local_shape[ax] < H + 1:
            return False  # engine mirror fill needs H+1 real planes
    # worst case stream count: rhs pair + C mask (+ e in / pair out)
    n_in = 4 + (1 if _df_with_c(tuple(tuple(b) for b in bcs), parts) else 0)
    if update:
        n_in += 1
    n_dense_out = 3 if update else 1
    return (
        pick_tiles_df_sharded(tuple(local_shape), n_in, 1 in parts, n_dense_out)
        is not None
    )


def _df_sharded_kernel(
    *refs,
    nz: int, ny: int, nx: int, tz: int, ty: int, W_z: int, W_y: int,
    y_ext: bool, w_pairs, w_splits, zero_rhs: bool, with_c: bool, bcs: BCS,
    update: bool = False,
):
    # Ref layout: inputs (uh, ul[, rh, rl][, e][, C]) — all halo-extended
    # — then outputs (r, max[, uh', ul']), dense input buffers + bufO,
    # bufM[, bufOH, bufOL], semaphores.
    n_in = (2 if zero_rhs else 4) + (1 if update else 0) + (1 if with_c else 0)
    n_out = 4 if update else 2
    ins, rest = refs[:n_in], refs[n_in:]
    out_ref, max_ref = rest[0], rest[1]
    outH_ref = outL_ref = None
    if update:
        outH_ref, outL_ref = rest[2], rest[3]
    bufs = rest[n_out : n_out + n_in + 1]
    k = n_out + n_in + 1
    bufM = rest[k]
    k += 1
    bufOH = bufOL = None
    if update:
        bufOH, bufOL = rest[k], rest[k + 1]
        k += 2
    in_sems, out_sems = rest[k], rest[k + 1]
    bufUH, bufUL = bufs[0], bufs[1]
    idx = 2
    if zero_rhs:
        bufRH = bufRL = None
    else:
        bufRH, bufRL = bufs[2], bufs[3]
        idx = 4
    bufE = None
    if update:
        bufE = bufs[idx]
        idx += 1
    bufC = bufs[idx] if with_c else None
    bufO = bufs[n_in]

    i = jnp.int32(pl.program_id(0))
    j = jnp.int32(pl.program_id(1))
    gy = jnp.int32(pl.num_programs(1))
    step = i * gy + j
    total = jnp.int32(pl.num_programs(0)) * gy
    i32 = jnp.int32

    def _clip(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, i32(lo)), i32(hi))

    def window_starts(ii, jj):
        # Extended coordinates: the real block sits at offset (1, 8*y_ext).
        sz = ii * i32(tz)
        if y_ext:
            sy = jj * i32(ty)
        else:
            sy = _clip(jj * i32(ty) - i32(8), 0, ny - W_y)
        return sz, pl.multiple_of(sy, 8)

    def fetch(slot, ii, jj):
        sz, sy = window_starts(ii, jj)
        win = (pl.ds(sz, W_z), pl.ds(sy, W_y), slice(None))
        return [
            pltpu.make_async_copy(src.at[win], buf.at[slot], in_sems.at[slot, i32(k)])
            for k, (src, buf) in enumerate(zip(ins, bufs))
        ]

    def out_dmas(slot, ii, jj):
        sz, sy = window_starts(ii, jj)
        z0 = ii * i32(tz)
        y0 = pl.multiple_of(jj * i32(ty), 8)
        oy = pl.multiple_of((y0 + (i32(8) if y_ext else i32(0))) - sy, 8)
        src = (slot, pl.ds(i32(1), tz), pl.ds(oy, ty), slice(None))
        dst = (pl.ds(z0, tz), pl.ds(y0, ty), slice(None))
        dmas = [
            pltpu.make_async_copy(bufO.at[src], out_ref.at[dst], out_sems.at[slot, i32(0)]),
            pltpu.make_async_copy(
                bufM.at[slot], max_ref.at[ii, jj], out_sems.at[slot, i32(1)]
            ),
        ]
        if update:
            # The updated pair ships the FULL window into the EXTENDED
            # outputs.  Adjacent windows overlap in the halo rows, but
            # every step computes identical values there (elementwise
            # update of identical inputs), so overlapping in-flight
            # writes are benign — and the union of windows covers the
            # whole extended block exactly.
            wdst = (pl.ds(sz, W_z), pl.ds(sy, W_y), slice(None))
            dmas += [
                pltpu.make_async_copy(
                    bufOH.at[slot], outH_ref.at[wdst], out_sems.at[slot, i32(2)]
                ),
                pltpu.make_async_copy(
                    bufOL.at[slot], outL_ref.at[wdst], out_sems.at[slot, i32(3)]
                ),
            ]
        return dmas

    slot = lax.rem(step, i32(2))

    @pl.when(step == i32(0))
    def _():
        for d in fetch(i32(0), i, j):
            d.start()

    @pl.when(step + i32(1) < total)
    def _():
        nstep = step + i32(1)
        ni, nj = nstep // gy, lax.rem(nstep, gy)

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

    sz, sy = window_starts(i, j)
    az = lax.broadcasted_iota(jnp.int32, (W_z, 1, 1), 0)
    ly = lax.broadcasted_iota(jnp.int32, (1, W_y, 1), 1)
    kx = lax.broadcasted_iota(jnp.int32, (1, 1, nx), 2)
    gyy = ly + sy  # local == global y when y is unextended

    def face_masks(ax):
        if ax == 0:
            return None, None  # halo-extended: true neighbors in-window
        if ax == 1:
            if y_ext:
                return None, None
            return gyy == i32(0), gyy == i32(ny - 1)
        return kx == i32(0), kx == i32(nx - 1)

    uh_w = bufUH[slot]
    ul_w = bufUL[slot]
    if update:
        # Pair update u <- u + e fused ahead of the stencil over the
        # whole window (halos included: e is halo-extended by the same
        # exchange/mirror fill, so updated halo values equal the
        # neighbor's updated boundary — the carried-extended-pair
        # invariant).  Bitwise the XLA df_add expression sequence.
        t, te = _two_sum(uh_w, bufE[slot])
        uh_w, ul_w = _quick_renorm(t, te + ul_w)
        bufOH[slot] = uh_w
        bufOL[slot] = ul_w

    Lh, Le, Ll = _df_stencil_channels(
        uh_w, ul_w, face_masks, w_pairs, w_splits
    )
    if zero_rhs:
        r32 = _df_combine(Lh, Le, Ll, None, None)
    else:
        r32 = _df_combine(Lh, Le, Ll, bufRH[slot], bufRL[slot])

    # ---- Dirichlet-face zeroing: streamed mask code when a partitioned
    # axis has Dirichlet faces (C == 2.0 there, all axes covered);
    # static masks otherwise (partitioned axes then all-Neumann).
    if with_c:
        r32 = jnp.where(bufC[slot] == jnp.float32(2.0), jnp.float32(0.0), r32)
    else:
        interior = None

        def _and(m, c):
            return c if m is None else jnp.logical_and(m, c)

        for ax in (1, 2):
            at_lo, at_hi = face_masks(ax)
            if at_lo is not None and bcs[ax][0] == "D":
                interior = _and(interior, ~at_lo)
            if at_hi is not None and bcs[ax][1] == "D":
                interior = _and(interior, ~at_hi)
        if interior is not None:
            r32 = jnp.where(interior, r32, jnp.float32(0.0))

    bufO[slot] = r32

    # ---- window max of |r| over the REAL tile (halo rows excluded).
    oz = i32(1)
    oy = jnp.int32(
        pl.multiple_of((j * i32(ty) + (i32(8) if y_ext else i32(0))) - sy, 8)
    )
    real = (
        (az >= oz) & (az < oz + i32(tz)) & (ly >= oy) & (ly < oy + i32(ty))
    )
    m = jnp.max(jnp.where(real, jnp.abs(r32), jnp.float32(0.0)))
    bufM[slot] = jnp.zeros((8, 128), jnp.float32) + m

    for d in out_dmas(slot, i, j):
        d.start()

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


def df_residual_sharded_3d(
    bcs: BCS,
    dq,
    local_shape,
    parts,
    zero_rhs: bool = False,
    dtype=jnp.float32,
    interpret: bool = False,
    vma=None,
    update: bool = False,
):
    """Per-shard double-float defect residual for the shard_map engine,
    or None if unsupported.

    ``parts`` lists the partitioned array axes ((0,) or (0, 1)); the
    call takes HALO-EXTENDED pair blocks (df_sharded_halos gives the
    per-axis depths; the engine fills neighbor planes via ppermute and
    node-mirror planes at global chain ends) and returns (r32,
    max_tiles) over the REAL local block, exactly like df_residual_3d.
    Argument order: (uh_ext, ul_ext[, rh_ext, rl_ext][, e_ext][, C_ext])
    — the C mask-code stream is present iff a partitioned axis has a
    Dirichlet face (see _df_with_c).  ``vma`` declares the mesh axes the
    outputs vary over (shard_map's vma type system).

    ``update``: the pair-update-fused variant — takes the previous
    group's correction e HALO-EXTENDED, applies u <- u + e over the
    whole extended window (bitwise the XLA df_add) and appends the
    updated EXTENDED pair to the outputs: (r32, max_tiles, uh_ext',
    ul_ext').  With the pair carried extended across defect groups this
    drops the per-group exchanges from two (uh, ul) to ONE (e) and
    removes the local df_add pass entirely."""
    bcs = tuple(tuple(b) for b in bcs)
    parts = tuple(parts)
    local_shape = tuple(int(s) for s in local_shape)
    if not df_sharded_supported(
        local_shape, bcs, parts, dtype, interpret=interpret, update=update
    ):
        return None
    nz, ny, nx = local_shape
    y_ext = 1 in parts
    with_c = _df_with_c(bcs, parts)
    n_in = (2 if zero_rhs else 4) + (1 if update else 0) + (1 if with_c else 0)
    n_out = 4 if update else 2
    n_dense_out = 3 if update else 1
    tiles = pick_tiles_df_sharded(local_shape, n_in, y_ext, n_dense_out)
    if tiles is None:
        return None
    tz, ty, W_z, W_y = tiles

    dq = np.asarray(dq, dtype=np.float64)
    w64 = 1.0 / (dq * dq)
    w_hi = w64.astype(np.float32)
    w_lo = (w64 - w_hi.astype(np.float64)).astype(np.float32)
    w_pairs = tuple((float(h), float(l)) for h, l in zip(w_hi, w_lo))

    def _vsplit(a: float):
        c = np.float32(_SPLIT) * np.float32(a)
        big = np.float32(c - np.float32(a))
        h = np.float32(c - big)
        return float(h), float(np.float32(a) - h)

    w_splits = tuple(_vsplit(h) for h, _ in w_pairs)

    kernel = functools.partial(
        _df_sharded_kernel,
        nz=nz, ny=ny, nx=nx, tz=tz, ty=ty, W_z=W_z, W_y=W_y,
        y_ext=y_ext, w_pairs=w_pairs, w_splits=w_splits,
        zero_rhs=zero_rhs, with_c=with_c, bcs=bcs, update=update,
    )
    grid = (nz // tz, ny // ty)

    def _shaped(shape):
        return (
            jax.ShapeDtypeStruct(shape, jnp.float32)
            if vma is None
            else jax.ShapeDtypeStruct(shape, jnp.float32, vma=frozenset(vma))
        )

    scratch = [pltpu.VMEM((2, W_z, W_y, nx), jnp.float32)] * (n_in + 1) + [
        pltpu.VMEM((2, 8, 128), jnp.float32),
    ]
    if update:
        scratch += [pltpu.VMEM((2, W_z, W_y, nx), jnp.float32)] * 2
    scratch += [
        pltpu.SemaphoreType.DMA((2, n_in)),
        pltpu.SemaphoreType.DMA((2, n_out)),
    ]
    ext_shape = (nz + 2, ny + (16 if y_ext else 0), nx)
    out_shape = [
        _shaped(local_shape),
        _shaped((grid[0], grid[1], 8, 128)),
    ]
    if update:
        out_shape += [_shaped(ext_shape)] * 2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_out,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=int((190 + (6 if update else 0)) * nz * ny * nx),
            bytes_accessed=int((n_in + n_dense_out) * 4 * nz * ny * nx),
            transcendentals=0,
        ),
        interpret=interpret,
    )
