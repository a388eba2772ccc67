from .stencils import (
    rb_sweep,
    poisson_residual,
    first_color_parity,
    stencil_weights,
    subtract_mean,
)
from .transfer import (
    interp_matrix_1d,
    restrict_matrix_1d,
    prolong,
    restrict,
    ninterp,
    inner_product,
)
from .reduce import du_metrics, trapz_2d

__all__ = [
    "rb_sweep",
    "poisson_residual",
    "first_color_parity",
    "stencil_weights",
    "subtract_mean",
    "interp_matrix_1d",
    "restrict_matrix_1d",
    "prolong",
    "restrict",
    "ninterp",
    "inner_product",
    "du_metrics",
    "trapz_2d",
]
