"""TPU compute kernels: SED expansion, per-model linear solves, posterior ops."""

from .sed import get_seds, get_seds_mag, get_seds_flux  # noqa: F401
from .optimize import (  # noqa: F401
    optimize_mag, optimize_flux_step, sed_mle, loglike_grid,
)
