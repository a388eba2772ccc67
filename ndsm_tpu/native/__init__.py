"""Native CPU core (C++/OpenMP) — the analogue of the reference's Fortran
compute library, used as a fast differential-test oracle and a no-JAX CPU
fallback.  Build lazily with ``ndsm_tpu.native.build()`` or via
``make native`` at the repo root."""

from .lib import build, get_lib, available, rb_sweep_3d, rb_sweep_nd, residual_3d
from .solver import solve_poisson_bvp_native
from .potential import vector_potential_native

__all__ = [
    "build",
    "get_lib",
    "available",
    "rb_sweep_3d",
    "rb_sweep_nd",
    "residual_3d",
    "solve_poisson_bvp_native",
    "vector_potential_native",
]
