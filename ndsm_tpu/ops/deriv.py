"""Second-order finite differences and curl.

Vectorized re-design of the reference's per-point ``derivq``
(ndsm_vector_potential.f90:825-872): central differences in the interior
and one-sided second-order stencils [-3, +4, -1]/(2h) at the ends, applied
as fused slice arithmetic along an axis.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["deriv_axis", "curl"]


def _sl(u: jax.Array, axis: int, lo: int, hi) -> jax.Array:
    if hi is None:
        hi = u.shape[axis]
    elif hi < 0:
        hi = u.shape[axis] + hi
    return lax.slice_in_dim(u, lo, hi, axis=axis)


def deriv_axis(u: jax.Array, h: jax.Array, axis: int) -> jax.Array:
    """du/dq along ``axis`` with uniform spacing ``h``: second-order central
    in the interior, one-sided [-3,+4,-1]/(2h) at the two boundary layers
    (reference: derivq, ndsm_vector_potential.f90:852-864)."""
    inv2h = (0.5 / jnp.asarray(h)).astype(u.dtype)
    interior = (_sl(u, axis, 2, None) - _sl(u, axis, 0, -2)) * inv2h
    lo = (
        -3.0 * _sl(u, axis, 0, 1) + 4.0 * _sl(u, axis, 1, 2) - _sl(u, axis, 2, 3)
    ) * inv2h
    n = u.shape[axis]
    hi = (
        3.0 * _sl(u, axis, n - 1, n)
        - 4.0 * _sl(u, axis, n - 2, n - 1)
        + _sl(u, axis, n - 3, n - 2)
    ) * inv2h
    return jnp.concatenate([lo, interior, hi], axis=axis)


@partial(jax.jit)
def curl(A: jax.Array, dq: jax.Array) -> jax.Array:
    """B = curl(A) for ``A`` of shape (3, nz, ny, nx) with components
    (Ax, Ay, Az) and ``dq = (dx, dy, dz)``
    (reference: curl, ndsm_vector_potential.f90:759-811).

    Axis map (C order): d/dx -> axis -1, d/dy -> axis -2, d/dz -> axis -3
    of each (nz, ny, nx) component.
    """
    Ax, Ay, Az = A[0], A[1], A[2]
    dx, dy, dz = dq[0], dq[1], dq[2]
    dAz_dy = deriv_axis(Az, dy, -2)
    dAy_dz = deriv_axis(Ay, dz, -3)
    dAx_dz = deriv_axis(Ax, dz, -3)
    dAz_dx = deriv_axis(Az, dx, -1)
    dAy_dx = deriv_axis(Ay, dx, -1)
    dAx_dy = deriv_axis(Ax, dy, -2)
    return jnp.stack([dAz_dy - dAy_dz, dAx_dz - dAz_dx, dAy_dx - dAx_dy])
