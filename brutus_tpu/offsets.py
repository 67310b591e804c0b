"""
Photometric zero-point self-calibration.

Parity: reference `brutus/utils.py:1218-1400` (`photometric_offsets`):
for each band, compare the posterior-predicted model fluxes of fitted
stars against their observed fluxes, reweighting the posterior samples
by a leave-that-band-out likelihood, and bootstrap the median
model/data ratio over objects and samples.

TPU-first: the leave-one-band-out reweighting is a batched jitted
program over `(Nobj, Nsamps, Nfilt)`; the bootstrap resampling uses
stateless `jax.random` categorical draws for all `Nmc` realizations at
once instead of a Python loop.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from .ops.sed import get_seds
from .utils import phot_loglike


def _band_weights(phot, err, mask, seds, band, dim_prior):
    """Leave-`band`-out posterior reweighting (reference
    `brutus/utils.py:1358-1368`)."""
    m = np.array(mask)
    m[:, band] = False

    def one(p, e, mm, sed):
        return phot_loglike(p, e, mm, sed, dim_prior=dim_prior)

    lnl = jax.vmap(one)(jnp.asarray(phot), jnp.asarray(err),
                        jnp.asarray(m), jnp.asarray(seds))
    logwt = lnl - logsumexp(lnl, axis=1, keepdims=True)
    return np.asarray(jnp.exp(logwt))


def photometric_offsets(phot, err, mask, models, idxs, reds, dreds, dists,
                        sel=None, weights=None, mask_fit=None, Nmc=150,
                        old_offsets=None, dim_prior=True,
                        prior_mean=None, prior_std=None, verbose=True,
                        seed=0):
    """Multiplicative per-band offsets between data and posterior models.

    Parameters/semantics match reference `brutus/utils.py:1218-1400`
    (the stateful numpy RNG becomes a `seed`).

    Returns
    -------
    ratios, ratios_err : (Nfilt,) median model/data ratios + bootstrap
        errors; nratio : (Nfilt,) object counts used per band.
    """
    n_obj, n_filt = phot.shape
    n_samps = idxs.shape[1]
    if sel is None:
        sel = np.ones(n_obj, dtype=bool)
    if weights is None:
        weights = np.ones((n_obj, n_samps))
    if mask_fit is None:
        mask_fit = np.ones(n_filt, dtype=bool)
    if old_offsets is None:
        old_offsets = np.ones(n_filt)

    # Posterior-predicted model fluxes, scaled to each draw's distance
    # (reference utils.py:1330-1334).
    seds = np.asarray(get_seds(jnp.asarray(models[idxs.ravel()]),
                               av=jnp.asarray(reds.ravel()),
                               rv=jnp.asarray(dreds.ravel()),
                               return_flux=True))
    seds = seds / dists.ravel()[:, None] ** 2
    seds = seds.reshape(n_obj, n_samps, n_filt)

    key = jax.random.PRNGKey(seed)
    ratios = np.ones(n_filt)
    ratios_err = np.zeros(n_filt)
    nratio = np.zeros(n_filt, dtype=int)

    for i in range(n_filt):
        extra = 1 if mask_fit[i] else 0
        s = np.flatnonzero(mask[:, i] & sel
                           & (mask.sum(axis=1) > 3 + extra)
                           & (weights.sum(axis=1) > 0))
        nratio[i] = len(s)
        if len(s) == 0:
            continue
        ratio = seds[s, :, i] / phot[s, None, i]
        if mask_fit[i]:
            wt = _band_weights(phot[s] * old_offsets, err[s] * old_offsets,
                               mask[s], seds[s], i, dim_prior)
        else:
            wt = np.ones((len(s), n_samps))
        wt = wt * weights[s]
        wt = wt / wt.sum(axis=1, keepdims=True)
        wt_obj = (weights[s].sum(axis=1) > 0).astype(float)
        wt_obj = wt_obj / wt_obj.sum()

        # Bootstrap all Nmc realizations at once.
        key, k1, k2 = jax.random.split(key, 3)
        n = len(s)
        ridx = jax.random.categorical(k1, jnp.log(jnp.asarray(wt_obj)),
                                      shape=(Nmc, n))
        midx = jax.random.categorical(
            k2, jnp.log(jnp.asarray(wt))[ridx], axis=-1)
        boot = jnp.median(jnp.asarray(ratio)[ridx, midx], axis=1)
        boot = np.asarray(boot)
        ratios[i] = np.median(boot)
        ratios_err[i] = np.std(boot)
        if verbose:
            sys.stderr.write(f"\rBand {i + 1}/{n_filt} "
                             f"({ratios[i]:.4f} +/- {ratios_err[i]:.4f}) ")
            sys.stderr.flush()
    if verbose:
        sys.stderr.write("\n")

    # Gaussian prior combination (reference utils.py:1394-1398).
    if prior_mean is not None and prior_std is not None:
        var_tot = ratios_err ** 2 + prior_std ** 2
        ratios = (ratios * prior_std ** 2
                  + prior_mean * ratios_err ** 2) / var_tot
        ratios_err = ratios_err * prior_std / np.sqrt(var_tot)

    return ratios, ratios_err, nratio


__all__ = ["photometric_offsets"]
