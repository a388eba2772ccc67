"""Explicit halo-exchange formulation of the smoother and residual under
``shard_map``: the grid is block-partitioned along axis 0 over the device
mesh and each red/black half-sweep exchanges one boundary plane with each
neighbor over ICI (``lax.ppermute``) — the distributed analogue of the
reference's shared-memory OpenMP sweep (ndsm_optimized.f90:40), which is a
new capability here (the reference is single-node only).

Semantics are identical to ``ops.stencils.rb_sweep``/``poisson_residual``:
index-reflection Neumann closure at the *global* ends of the partitioned
axis, Dirichlet faces frozen, true checkerboard coloring by global index
parity, and the all-Neumann mean subtraction as a cross-shard psum.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import stencils
from ..ops.stencils import BCS

__all__ = ["make_sharded_sweep", "make_sharded_residual"]


def _exchange_planes(u: jax.Array, axis_name: str, ndev: int):
    """Send the top plane up and the bottom plane down the 1-D device ring
    (non-periodic: end shards receive zeros, which the global boundary
    reflection below overrides)."""
    from_prev = lax.ppermute(
        u[-1:], axis_name, [(j, j + 1) for j in range(ndev - 1)]
    )
    from_next = lax.ppermute(
        u[:1], axis_name, [(j + 1, j) for j in range(ndev - 1)]
    )
    return from_prev, from_next


def _neighbors0_global(u, from_prev, from_next, g, n_global):
    """(lower, upper) neighbors along the sharded axis 0 with global
    Neumann reflection: at global row 0 the lower neighbor is row 1; at
    global row n-1 the upper neighbor is row n-2."""
    lo0 = jnp.concatenate([from_prev, u[:-1]], axis=0)
    hi0 = jnp.concatenate([u[1:], from_next], axis=0)
    lo = jnp.where(g == 0, hi0, lo0)
    hi = jnp.where(g == n_global - 1, lo0, hi0)
    return lo, hi


def _local_masks(shape, bcs: BCS, g, n_global):
    """Interior (non-Dirichlet) mask for a local block, with axis-0 tests
    done in *global* coordinates."""
    mask = jnp.ones(shape, dtype=bool)
    if bcs[0][0] == "D":
        mask = mask & (g > 0)
    if bcs[0][1] == "D":
        mask = mask & (g < n_global - 1)
    for ax in range(1, len(shape)):
        idx = lax.broadcasted_iota(jnp.int32, shape, ax)
        if bcs[ax][0] == "D":
            mask = mask & (idx > 0)
        if bcs[ax][1] == "D":
            mask = mask & (idx < shape[ax] - 1)
    return mask


def make_sharded_sweep(
    global_shape: Tuple[int, ...],
    bcs: Sequence[Sequence[str]],
    dq,
    mesh: Mesh,
    axis_name: str = "z",
    dtype=jnp.float32,
):
    """Build a jitted red-black sweep over arrays block-partitioned along
    axis 0 of ``mesh``.  ``global_shape[0]`` must divide evenly by the mesh
    size.  Returns f(u, rhs) -> u operating on globally-shaped arrays with
    NamedSharding(mesh, P(axis_name, ...)).
    """
    bcs = stencils.validate_bcs(bcs, len(global_shape))
    ndev = mesh.shape[axis_name]
    n0 = global_shape[0]
    if n0 % ndev:
        raise ValueError(f"axis 0 ({n0}) must divide over {ndev} devices")
    blk = n0 // ndev
    w_np = 1.0 / np.asarray(dq, dtype=np.float64) ** 2
    w = tuple(np.asarray(w_np, dtype=np.float64))
    w0 = float(1.0 / (2.0 * w_np.sum()))
    red = stencils.first_color_parity(bcs)
    all_n = stencils.is_all_neumann(bcs)
    total = float(np.prod(global_shape))

    spec = P(axis_name, *([None] * (len(global_shape) - 1)))

    def local_fn(u, rhs):
        shape = u.shape
        i = lax.axis_index(axis_name)
        g = (i * blk + lax.broadcasted_iota(jnp.int32, shape, 0)).astype(jnp.int32)
        interior = _local_masks(shape, bcs, g, n0)
        parity_src = g
        for ax in range(1, len(shape)):
            parity_src = parity_src + lax.broadcasted_iota(jnp.int32, shape, ax)

        def half(u, parity):
            from_prev, from_next = _exchange_planes(u, axis_name, ndev)
            lo, hi = _neighbors0_global(u, from_prev, from_next, g, n0)
            total_sum = (lo + hi) * jnp.asarray(w[0], u.dtype)
            for ax in range(1, len(shape)):
                lo_a, hi_a = stencils._neighbors(u, ax)
                total_sum = total_sum + (lo_a + hi_a) * jnp.asarray(w[ax], u.dtype)
            unew = (total_sum - rhs) * jnp.asarray(w0, u.dtype)
            mask = ((parity_src % 2) == parity) & interior
            return jnp.where(mask, unew, u)

        u = half(u, red)
        u = half(u, 1 - red)
        if all_n:
            mean = lax.psum(jnp.sum(u), axis_name) / jnp.asarray(total, u.dtype)
            u = u - mean
        return u

    f = shard_map(local_fn, mesh=mesh, in_specs=(spec, spec), out_specs=spec)
    return jax.jit(f), NamedSharding(mesh, spec)


def make_sharded_residual(
    global_shape: Tuple[int, ...],
    bcs: Sequence[Sequence[str]],
    dq,
    mesh: Mesh,
    axis_name: str = "z",
):
    """Jitted residual r = rhs - L[u] over axis-0 block-partitioned arrays
    (one halo exchange per evaluation)."""
    bcs = stencils.validate_bcs(bcs, len(global_shape))
    ndev = mesh.shape[axis_name]
    n0 = global_shape[0]
    if n0 % ndev:
        raise ValueError(f"axis 0 ({n0}) must divide over {ndev} devices")
    blk = n0 // ndev
    w_np = 1.0 / np.asarray(dq, dtype=np.float64) ** 2
    w = tuple(np.asarray(w_np, dtype=np.float64))
    spec = P(axis_name, *([None] * (len(global_shape) - 1)))

    def local_fn(u, rhs):
        shape = u.shape
        i = lax.axis_index(axis_name)
        g = (i * blk + lax.broadcasted_iota(jnp.int32, shape, 0)).astype(jnp.int32)
        interior = _local_masks(shape, bcs, g, n0)
        from_prev, from_next = _exchange_planes(u, axis_name, ndev)
        lo, hi = _neighbors0_global(u, from_prev, from_next, g, n0)
        lap = (lo - 2.0 * u + hi) * jnp.asarray(w[0], u.dtype)
        for ax in range(1, len(shape)):
            lo_a, hi_a = stencils._neighbors(u, ax)
            lap = lap + (lo_a - 2.0 * u + hi_a) * jnp.asarray(w[ax], u.dtype)
        return jnp.where(interior, rhs - lap, jnp.zeros((), u.dtype))

    f = shard_map(local_fn, mesh=mesh, in_specs=(spec, spec), out_specs=spec)
    return jax.jit(f), NamedSharding(mesh, spec)
