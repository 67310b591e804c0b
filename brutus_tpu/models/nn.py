"""
Bolometric-correction neural networks (batched, MXU-friendly).

Parity: reference `brutus/seds.py:860-1078` (`FastNN`,
`FastNNPredictor`): one tiny 3-layer MLP per photometric band
(sigmoid, sigmoid, linear) over the min-max-encoded inputs
`[Teff, logg, feh_surf, afe, av, rv]`, trained on the C3K bolometric
correction tables.  The reference evaluates one input vector at a time
with per-filter numpy matmuls; here all filters are stacked into single
weight tensors and evaluation is batched over arbitrary leading axes,
so the whole model grid (x an Av/Rv lattice) evaluates as a few large
matmuls on the MXU.
"""

import numpy as np
import h5py
import jax
import jax.numpy as jnp


def nneval_params(params, x):
    """Pure-function form of `FastNN.nneval`: evaluate the stacked
    per-filter MLPs at `x (..., 6)` given the weight pytree
    `params = (w1, b1, w2, b2, w3, b3, xmin, xmax)`.

    Kept free of `self` so jitted callers (the cluster likelihood
    core, `cluster._cluster_core`) can pass the weights as jit
    *arguments* instead of closure-captured XLA constants.
    """
    w1, b1, w2, b2, w3, b3, xmin, xmax = params
    x = jnp.asarray(x)
    xe = (x - xmin) / (xmax - xmin)
    # Precision.HIGHEST: at default precision the TPU MXU truncates
    # f32 einsum operands to bf16 (~0.4% relative), i.e. ~0.02-0.04
    # mag of noise in the generated SEDs.
    hi = jax.lax.Precision.HIGHEST
    a1 = jax.nn.sigmoid(
        jnp.einsum("fho,...o->...fh", w1, xe, precision=hi) + b1)
    a2 = jax.nn.sigmoid(
        jnp.einsum("fgh,...fh->...fg", w2, a1, precision=hi) + b2)
    y = jnp.einsum("fog,...fg->...fo", w3, a2, precision=hi)[..., 0] + b3
    ok = jnp.all(jnp.isfinite(x) & (x >= xmin) & (x <= xmax), axis=-1)
    return jnp.where(ok[..., None], y, jnp.nan)


def sed_params(params, logt, logg, feh_surf, afe, logl, av, rv, dist):
    """Pure-function form of `FastNNPredictor.sed`: apparent magnitudes
    `m = -2.5 log L + 4.74 - BC + mu(dist)` (reference
    `brutus/seds.py:1072-1073`); every argument broadcasts."""
    args = jnp.broadcast_arrays(*[jnp.asarray(a, jnp.result_type(float))
                                  for a in (logt, logg, feh_surf, afe,
                                            av, rv, logl, dist)])
    logt, logg, feh_surf, afe, av, rv, logl, dist = args
    mu = 5.0 * jnp.log10(dist) - 5.0
    x = jnp.stack([10.0 ** logt, logg, feh_surf, afe, av, rv], axis=-1)
    bc = nneval_params(params, x)
    return (-2.5 * logl + 4.74)[..., None] - bc + mu[..., None]


class FastNN:
    """Stacked per-filter MLPs over encoded stellar/extinction inputs."""

    def __init__(self, filters=None, nnfile=None, verbose=True):
        from ..filters import FILTERS
        if filters is None:
            filters = list(FILTERS)
        self.filters = list(filters)
        if nnfile is None:
            nnfile = "data/DATAFILES/nn_c3k.h5"
        self._load(nnfile)

    def _load(self, nnfile):
        """Read per-filter `w1,b1,w2,b2,w3,b3,xmin,xmax` (reference
        `brutus/seds.py:895-917` schema) into stacked arrays."""
        with h5py.File(nnfile, "r") as f:
            w1 = np.array([f[flt]["w1"] for flt in self.filters])
            b1 = np.array([f[flt]["b1"] for flt in self.filters])
            w2 = np.array([f[flt]["w2"] for flt in self.filters])
            b2 = np.array([f[flt]["b2"] for flt in self.filters])
            w3 = np.array([f[flt]["w3"] for flt in self.filters])
            b3 = np.array([f[flt]["b3"] for flt in self.filters])
            xmin = np.array([f[flt]["xmin"] for flt in self.filters])
            xmax = np.array([f[flt]["xmax"] for flt in self.filters])
        if not (np.all(xmin == xmin[0]) and np.all(xmax == xmax[0])):
            raise ValueError("neural networks disagree on input ranges")
        self.xmin = jnp.asarray(xmin[0])
        self.xmax = jnp.asarray(xmax[0])
        self.xspan = self.xmax - self.xmin
        # (F, h1, 6), (F, h1), (F, h2, h1), (F, h2), (F, 1, h2), (F,)
        self.w1 = jnp.asarray(w1)
        self.b1 = jnp.asarray(b1)[..., 0]
        self.w2 = jnp.asarray(w2)
        self.b2 = jnp.asarray(b2)[..., 0]
        self.w3 = jnp.asarray(w3)
        self.b3 = jnp.asarray(b3)[..., 0, 0] if np.ndim(b3) == 3 \
            else jnp.asarray(b3)[..., 0]
        self.NFILT = len(self.filters)

    @property
    def params(self):
        """Weight pytree for the pure-function eval path
        (`nneval_params` / `sed_params`)."""
        return (self.w1, self.b1, self.w2, self.b2, self.w3, self.b3,
                self.xmin, self.xmax)

    def encode(self, x):
        """Min-max rescale inputs (reference `brutus/seds.py:919-940`)."""
        return (x - self.xmin) / self.xspan

    def nneval(self, x):
        """Evaluate all filter MLPs at `x` of shape (..., 6).

        Returns (..., NFILT) bolometric corrections; NaN where any
        input falls outside the trained range (the reference's
        out-of-bounds guard, `brutus/seds.py:1067-1076`).
        """
        return nneval_params(self.params, x)


class FastNNPredictor(FastNN):
    """SED prediction from stellar parameters via the BC networks.

    Parity: reference `brutus/seds.py:978-1078`: apparent magnitude
    `m = -2.5 log L + 4.74 - BC + mu(dist)`.
    """

    def sed(self, logt=3.8, logg=4.4, feh_surf=0.0, logl=0.0, afe=0.0,
            av=0.0, rv=3.3, dist=1000.0, filt_idxs=slice(None)):
        """Batched SEDs: every argument broadcasts over leading axes.

        Returns (..., NFILT) apparent magnitudes (NaN out of bounds).
        """
        m = sed_params(self.params, logt, logg, feh_surf, afe, logl,
                       av, rv, dist)
        return m[..., filt_idxs]


def write_nn_file(path, filters, w1, b1, w2, b2, w3, b3, xmin, xmax):
    """Write an `nn_c3k.h5`-schema network file (fixtures / re-training)."""
    with h5py.File(path, "w") as f:
        for i, flt in enumerate(filters):
            g = f.create_group(flt)
            g.create_dataset("w1", data=w1[i])
            g.create_dataset("b1", data=b1[i])
            g.create_dataset("w2", data=w2[i])
            g.create_dataset("b2", data=b2[i])
            g.create_dataset("w3", data=w3[i])
            g.create_dataset("b3", data=b3[i])
            g.create_dataset("xmin", data=xmin)
            g.create_dataset("xmax", data=xmax)


__all__ = ["FastNN", "FastNNPredictor", "write_nn_file",
           "nneval_params", "sed_params"]
