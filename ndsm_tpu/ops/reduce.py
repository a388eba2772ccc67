"""Reductions: convergence metrics and boundary-flux quadrature."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["du_metrics", "trapz_2d", "trapz_weights_1d"]


def du_metrics(u_new: jax.Array, u_old: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(max, mean) absolute inter-iterate change — NDSM's convergence
    metric is the change between successive iterates, not a residual norm
    (reference: du_metrics ndsm_multigrid_core.f90:808-853 and update_u
    :1077-1122; quirk Q6 in SURVEY.md)."""
    du = jnp.abs(u_new - u_old)
    return jnp.max(du), jnp.mean(du)


def trapz_weights_1d(n: int) -> np.ndarray:
    w = np.ones(n, dtype=np.float64)
    w[0] = 0.5
    w[-1] = 0.5
    return w


def trapz_2d(f: jax.Array, dq0: float, dq1: float) -> jax.Array:
    """2-D trapezoid-rule integral of ``f`` with spacings (dq0, dq1) along
    axes (0, 1).  The 2-D weight table (1 interior, 1/2 edges, 1/4 corners;
    reference trapz_2D, ndsm_vector_potential.f90:1070-1106) is the outer
    product of the 1-D trapezoid weights."""
    w0 = jnp.asarray(trapz_weights_1d(f.shape[0]), dtype=f.dtype)
    w1 = jnp.asarray(trapz_weights_1d(f.shape[1]), dtype=f.dtype)
    return jnp.sum(f * (w0[:, None] * w1[None, :])) * jnp.asarray(
        dq0 * dq1, dtype=f.dtype
    )
