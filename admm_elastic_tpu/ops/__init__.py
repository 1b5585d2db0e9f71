"""Device-side numerical kernels (jnp reference implementations + Pallas)."""

from .svd import svd3x3_oriented, svd3x2, eigh_sym3x3, polar_project
from .newton import newton_minimize
from .segment import coeff_apply, coeff_apply_T, coeff_diag

__all__ = [
    "svd3x3_oriented", "svd3x2", "eigh_sym3x3", "polar_project",
    "newton_minimize",
    "coeff_apply", "coeff_apply_T", "coeff_diag",
]
