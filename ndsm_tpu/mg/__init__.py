from .poisson import PoissonBVP, solve_poisson_bvp

__all__ = ["PoissonBVP", "solve_poisson_bvp"]
