"""
Binned 2-D distance-reddening posteriors (and prior re-exports).

Parity: reference `brutus/pdf.py:843-1113` (`bin_pdfs_distred`):
histogram each star's posterior draws onto a (distance-like x Av-like)
grid, with optional regeneration of draws from the saved
`(scale, av, rv, cov_sar)` Gaussians, parallax-aware Gaussian
smoothing, and optional CDF accumulation for LOS MAP evaluation.

Host-side analysis code (numpy + scipy.ndimage); the draw
regeneration path uses the JAX truncated-MVN sampler.
"""

import sys
import warnings

import numpy as np
import jax
from scipy.ndimage import gaussian_filter as norm_kde
from scipy.special import logsumexp

from .priors import (imf_lnprior, ps1_MrLF_lnprior, parallax_lnprior,  # noqa: F401
                     scale_parallax_lnprior, parallax_to_scale,
                     logn_disk, logn_halo, logp_feh, logp_age_from_feh,
                     gal_lnprior, dust_lnprior)
from .utils import draw_sar

DIST_TYPES = ["parallax", "scale", "distance", "distance_modulus"]


def _to_dist_type(ddraws, dist_type):
    pdraws = 1.0 / ddraws
    if dist_type == "scale":
        return pdraws ** 2
    if dist_type == "parallax":
        return pdraws
    if dist_type == "distance":
        return ddraws
    return 5.0 * np.log10(ddraws) + 10.0


def bin_pdfs_distred(data, cdf=False, ebv=False,
                     dist_type="distance_modulus", lndistprior=None,
                     coord=None, avlim=(0.0, 6.0), rvlim=(1.0, 8.0),
                     parallaxes=None, parallax_errors=None, Nr=100,
                     bins=(750, 300), span=None, smooth=0.01, seed=0,
                     verbose=False):
    """Binned 2-D (distance x reddening) PDFs/CDFs per star.

    Parity: reference `brutus/pdf.py:843-1113`.  `data` is either
    `(dists, reds, dreds)` saved draws or `(scales, avs, rvs, covs_sar)`
    to regenerate draws with the distance/parallax priors re-applied.
    """
    nobjs, nsamps = data[0].shape
    if dist_type not in DIST_TYPES:
        raise ValueError("The provided `dist_type` is not valid.")
    if lndistprior is None:
        lndistprior = gal_lnprior
    if parallaxes is None:
        parallaxes = np.full(nobjs, np.nan)
    if parallax_errors is None:
        parallax_errors = np.full(nobjs, np.nan)

    # Bin layout (reference pdf.py:949-976).
    if span is None:
        avlims = avlim
        dlims = 10 ** (np.array([4.0, 19.0]) / 5.0 - 2.0)
    else:
        avlims, dlims = span
    try:
        xbin, ybin = bins
    except TypeError:
        xbin = ybin = bins
    ylims = avlims
    if dist_type == "scale":
        xlims = (1.0 / dlims[::-1]) ** 2
    elif dist_type == "parallax":
        xlims = 1.0 / dlims[::-1]
    elif dist_type == "distance":
        xlims = dlims
    else:
        xlims = 5.0 * np.log10(dlims) + 10.0
    xbins = np.linspace(xlims[0], xlims[1], xbin + 1)
    ybins = np.linspace(ylims[0], ylims[1], ybin + 1)
    dx, dy = xbins[1] - xbins[0], ybins[1] - ybins[0]
    xspan, yspan = xlims[1] - xlims[0], ylims[1] - ylims[0]

    # Smoothing scales (reference pdf.py:978-992).
    try:
        xsmooth = smooth[0] * (xspan if smooth[0] < 1 else dx)
        ysmooth = smooth[1] * (yspan if smooth[1] < 1 else dy)
    except TypeError:
        xsmooth = smooth * (xspan if smooth < 1 else dx)
        ysmooth = smooth * (yspan if smooth < 1 else dy)

    binned_vals = np.zeros((nobjs, xbin, ybin), dtype="float32")
    xedges, yedges = xbins, ybins

    if len(data) == 3:
        # Saved draws (reference pdf.py:996-1023).
        ddraws, adraws, rdraws = [np.array(d) for d in data]
        ydraws = adraws / rdraws if ebv else adraws
        xdraws = _to_dist_type(ddraws, dist_type)
        for i in range(nobjs):
            if verbose:
                sys.stderr.write(f"\rBinning object {i + 1}/{nobjs}")
            H, xedges, yedges = np.histogram2d(xdraws[i], ydraws[i],
                                               bins=(xbins, ybins))
            binned_vals[i] = H / nsamps
    else:
        # Regenerate draws from the (s, Av, Rv) Gaussians
        # (reference pdf.py:1024-1078).
        scales, avs, rvs, covs_sar = [np.array(d) for d in data]
        if coord is None:
            raise ValueError("`coord` must be passed when regenerating "
                             "draws with the default distance prior")
        key = jax.random.PRNGKey(seed)
        for i in range(nobjs):
            if verbose:
                sys.stderr.write(f"\rBinning object {i + 1}/{nobjs}")
            key, sub = jax.random.split(key)
            sdr, adr, rdr = [np.asarray(v) for v in draw_sar(
                sub, scales[i], avs[i], rvs[i], covs_sar[i], ndraws=Nr,
                avlim=avlim, rvlim=rvlim)]
            pdr = np.sqrt(sdr)
            ddr = 1.0 / pdr
            lnp_draws = np.asarray(lndistprior(ddr, np.asarray(coord[i])))
            if np.isfinite(parallaxes[i]) and np.isfinite(
                    parallax_errors[i]):
                lnp_draws = lnp_draws + np.asarray(parallax_lnprior(
                    pdr, parallaxes[i], parallax_errors[i]))
            lnp = logsumexp(lnp_draws, axis=1)
            wts = np.exp(lnp_draws - lnp[:, None])
            wts /= wts.sum(axis=1)[:, None]
            ydr = (adr / rdr if ebv else adr).ravel()
            xdr = _to_dist_type(ddr, dist_type).ravel()
            H, xedges, yedges = np.histogram2d(xdr, ydr,
                                               bins=(xbins, ybins),
                                               weights=wts.ravel())
            binned_vals[i] = H / nsamps

    # Parallax-aware smoothing (reference pdf.py:1080-1106).
    for i, (H, par, perr) in enumerate(zip(binned_vals, parallaxes,
                                           parallax_errors)):
        p1sig = np.array([par + perr, max(par - perr, 1e-10)])
        with warnings.catch_warnings(), np.errstate(all="ignore"):
            warnings.simplefilter("ignore")
            if dist_type == "scale":
                x_min_smooth = abs(np.diff(p1sig ** 2))[0] / 2.0
            elif dist_type == "parallax":
                x_min_smooth = abs(np.diff(p1sig))[0] / 2.0
            elif dist_type == "distance":
                x_min_smooth = abs(np.diff(1.0 / p1sig))[0] / 2.0
            else:
                x_min_smooth = abs(np.diff(
                    5.0 * np.log10(1.0 / p1sig)))[0] / 2.0
        xsm = min(x_min_smooth, xsmooth) if np.isfinite(x_min_smooth) \
            else xsmooth
        binned_vals[i] = norm_kde(H, (xsm / dx, ysmooth / dy))

    if cdf:
        binned_vals = binned_vals.cumsum(axis=1)

    return binned_vals, xedges, yedges


__all__ = ["bin_pdfs_distred",
           "imf_lnprior", "ps1_MrLF_lnprior", "parallax_lnprior",
           "scale_parallax_lnprior", "parallax_to_scale",
           "logn_disk", "logn_halo", "logp_feh", "logp_age_from_feh",
           "gal_lnprior", "dust_lnprior"]
