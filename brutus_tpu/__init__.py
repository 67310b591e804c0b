"""
brutus_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
brute-force Bayesian inference of stellar distances, reddenings, and
stellar properties from photometry.

This is a ground-up TPU-first re-design with the capabilities of the
reference package `brutus` (joshspeagle/brutus v0.8.3).  The per-star
likelihood scan over a pre-computed model grid — including the iterative
analytic linear solves for the flux scale `s = parallax**2`, dust column
A(V), and dust-curve shape R(V) — runs as dense, batched XLA/Pallas
programs over a `(stars, models, filters)` block, with the model grid
shardable across a TPU device mesh and per-star reductions (evidence
logsumexp, top-k model selection) performed as XLA collectives.

Layer map (mirrors reference SURVEY.md §1):
  L1  foundations  : filters, utils, io, coords, healpix
  L2  models/priors: models.* (tracks, nn, sedmaker, isochrone), priors, dustmap
  L3  inference    : ops.* (kernels), fitting (loglike, lnpost, BruteForce)
  L4  applications : los, cluster, offsets
  L5  analysis     : pdf, plotting
"""

__version__ = "0.1.0"

from . import filters  # noqa: F401
from .filters import FILTERS  # noqa: F401


def __getattr__(name):
    """Lazy submodule access (keeps `import brutus_tpu` light)."""
    import importlib
    submodules = {"config", "utils", "io", "coords", "healpix", "dustmap",
                  "priors", "fitting", "parallel", "models", "ops", "los",
                  "cluster", "offsets", "pdf", "plotting"}
    if name in submodules:
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
