"""
Co-eval cluster isochrone likelihood.

Parity: reference `brutus/cluster.py:23-419` (`isochrone_loglike`): a
joint likelihood for a stellar cluster given shared parameters
`(feh, loga, av, rv, dist, fout)`, optional per-band photometric
offsets, and optional empirical-correction parameters.  The model
marginalizes every star over the full EEP extent of the isochrone and
over a grid of binary secondary mass fractions, with an inlier/outlier
mixture.

The per-(smf) inner block — `(Niso_points, Nobj)` chi-square +
mass-measure logsumexp — runs as a jitted JAX program; the smf loop
stays in Python because each iteration regenerates the isochrone SEDs.
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp
from scipy.stats import chi2 as chisquare

from .utils import chi2_logpdf

DEFAULT_SMF_GRID = np.array([0.0, 0.2, 0.35, 0.45, 0.5, 0.55, 0.6, 0.65,
                             0.7, 0.75, 0.8, 0.85, 0.9, 0.95, 1.0])


def _read_params(theta, spec, n, counter):
    """Read `n` parameters from `theta`, skipping fixed entries."""
    if spec == "free":
        vals = np.asarray(theta[counter:counter + n], dtype=float)
        return vals, counter + n
    vals = np.zeros(n)
    for i, c in enumerate(spec):
        if c is None:
            vals[i] = theta[counter]
            counter += 1
        else:
            vals[i] = c
    return vals, counter


@partial(jax.jit, static_argnames=("dim_prior",))
def _smf_block(cmd_phot, cmd_mask, grad_mini, phot_t, err_t, phot_mask,
               chi2_p, lnorm_p, phot_n, lnprior_smf, dim_prior=True):
    """Inlier log-likelihood of all stars against one smf isochrone.

    cmd_phot/cmd_mask : (Npts, Nfilt) model fluxes + band validity;
    grad_mini : (Npts,) mass measure; phot_t/err_t/phot_mask :
    (Nobj, Nfilt); chi2_p/lnorm_p/phot_n : (Nobj,).  Returns (Nobj,)
    logsumexp over isochrone points.  The combined mask reproduces the
    reference's `np.nansum` semantics (cluster.py:381-383).
    """
    m = (phot_mask[None] & cmd_mask[:, None]).astype(cmd_phot.dtype)
    safe_err = jnp.where(phot_mask, err_t, 1.0)
    resid = phot_t[None] - cmd_phot[:, None]          # (Npts, Nobj, Nfilt)
    chi2_cmd = jnp.sum(jnp.square(resid) / safe_err ** 2 * m, axis=-1)
    lnorm_cmd = jnp.sum(jnp.log(2 * jnp.pi * safe_err ** 2) * m, axis=-1)
    chi2 = chi2_cmd + chi2_p
    lnorm = lnorm_cmd + lnorm_p
    if dim_prior:
        lnl = chi2_logpdf(chi2, phot_n)
    else:
        lnl = -0.5 * (chi2 + lnorm)
    lnl = jnp.where(jnp.isfinite(lnl), lnl, -jnp.inf)
    lnprior = jnp.log(grad_mini)[:, None] + lnprior_smf
    valid = jnp.isfinite(grad_mini) & (grad_mini > 0)
    lnl = jnp.where(valid[:, None], lnl + lnprior, -jnp.inf)
    return logsumexp(lnl, axis=0)


def isochrone_loglike(theta, isochrone, phot, err, cluster_params="free",
                      offsets="fixed", corr_params="fixed",
                      mini_bound=0.08, eep_binary_max=480.0,
                      smf_grid=None, eep_grid=None,
                      parallax=None, parallax_err=None,
                      cluster_prob=0.95, dim_prior=True,
                      return_lnls=False):
    """Total log-likelihood of a co-eval cluster population.

    Parity: reference `brutus/cluster.py:23-419`; see that docstring
    for the `theta` packing rules (fixed entries are skipped).
    """
    if isochrone is None:
        raise ValueError("`isochrone` must be provided")
    if phot is None or err is None:
        raise ValueError("`phot` and `err` must be provided")
    phot = np.asarray(phot, dtype=float)
    err = np.asarray(err, dtype=float)
    n_obj, n_bands = phot.shape
    phot_mask = np.isfinite(phot) & np.isfinite(err)
    phot_n = phot_mask.sum(axis=1).astype(float)
    if np.any(~phot_mask.all(axis=1) & (phot_n == 0)):
        raise ValueError("at least one object has no valid data")

    if smf_grid is None:
        smf_grid = DEFAULT_SMF_GRID
    smf_grid = np.asarray(smf_grid, dtype=float)
    grad_smf = (np.gradient(smf_grid) if len(smf_grid) > 1
                else np.array([1.0]))
    if eep_grid is None:
        eep_grid = np.linspace(202.0, 808.0, 2000)
    eep_grid = np.asarray(eep_grid, dtype=float)

    # Degeneracy guards (reference cluster.py:200-225).
    if parallax is None and parallax_err is None:
        if offsets == "free" and (cluster_params == "free"
                                  or cluster_params[4] is None):
            raise ValueError(
                "without parallaxes, fix either the distance or at "
                "least one photometric offset")
    if corr_params != "fixed" and ((corr_params[0] is None
                                    or corr_params[1] is None)
                                   and corr_params[3] is None):
        raise ValueError("if `feh_scale` is free then `dtdm` and `drdm` "
                         "must be fixed (perfect degeneracy)")
    if (parallax is None) != (parallax_err is None):
        raise ValueError("provide both `parallax` and `parallax_err`")

    # Unpack theta (reference cluster.py:227-290).
    counter = 0
    cvals, counter = _read_params(theta, cluster_params, 6, counter)
    feh, loga, av, rv, dist, fout = cvals
    fout = min(max(fout, 1e-10), 1.0 - 1e-10)
    if offsets == "fixed":
        Xb = np.ones(n_bands)
        counter += n_bands
    else:
        Xb, counter = _read_params(theta, offsets, n_bands, counter)
    if corr_params == "fixed":
        corr_coef = None
        counter += 4
    else:
        corr_coef, counter = _read_params(theta, corr_params, 4, counter)
        corr_coef = tuple(corr_coef)

    # Parallax contribution (reference cluster.py:292-301).
    chi2_p = np.zeros(n_obj)
    lnorm_p = np.zeros(n_obj)
    if parallax is not None:
        pmask = np.isfinite(parallax) & np.isfinite(parallax_err)
        chi2_p[pmask] = ((parallax[pmask] - 1e3 / dist) ** 2
                         / parallax_err[pmask] ** 2)
        lnorm_p[pmask] = np.log(2 * np.pi * parallax_err[pmask] ** 2)
        phot_n = phot_n + pmask

    # Outlier model (reference cluster.py:303-321).
    if dim_prior:
        outlier_chi2 = chisquare.ppf(1.0 - 1e-5, phot_n)
        lnl_outlier = chisquare.logpdf(outlier_chi2, phot_n)
    else:
        with np.errstate(all="ignore"):
            omax = np.nanmax(phot + 3 * err, axis=0)
            omin = np.nanmin(phot - 3 * err, axis=0)
            osize = (6.0 * err) / (omax - omin)
            osize[~phot_mask] = 1.0
            ovol = np.prod(np.where(phot_mask, osize, 1.0), axis=1)
            if parallax is not None and pmask.any():
                pmax = np.nanmax((parallax + 3 * parallax_err)[pmask])
                pmin = np.nanmin((parallax - 3 * parallax_err)[pmask])
                ovol[pmask] *= (6 * parallax_err[pmask]) / (pmax - pmin)
            lnl_outlier = -np.log(ovol)

    ln_fin = math.log(cluster_prob * (1.0 - fout))
    ln_fout = math.log(1.0 - cluster_prob * (1.0 - fout))

    phot_t = jnp.asarray(phot * Xb)
    err_t = jnp.asarray(err * Xb)
    mask_j = jnp.asarray(phot_mask)
    chi2_p_j = jnp.asarray(chi2_p)
    lnorm_p_j = jnp.asarray(lnorm_p)
    phot_n_j = jnp.asarray(phot_n)

    # SMF marginalization (reference cluster.py:328-407).
    lnls = np.full((len(smf_grid), n_obj), -np.inf)
    for i, smf in enumerate(smf_grid):
        cmd_sed, params1, _ = isochrone.get_seds(
            feh=feh, loga=loga, av=av, rv=rv, eep=eep_grid, smf=smf,
            dist=dist, mini_bound=mini_bound,
            eep_binary_max=eep_binary_max, corr_params=corr_coef,
            return_dict=True)
        cmd_sed = np.asarray(cmd_sed)
        cmd_mini = np.asarray(params1["mini"])
        grad_mini = np.gradient(cmd_mini)
        usable = (np.any(np.isfinite(cmd_sed), axis=1)
                  & np.isfinite(grad_mini) & (grad_mini > 0))
        if i > 0:
            usable &= eep_grid <= eep_binary_max
        if not usable.any():
            continue
        sed_ok = np.isfinite(cmd_sed)
        cmd_phot = 10.0 ** (-0.4 * np.where(sed_ok, cmd_sed, 0.0))
        gm = np.where(usable, grad_mini, np.nan)
        lnls[i] = np.asarray(_smf_block(
            jnp.asarray(cmd_phot), jnp.asarray(sed_ok), jnp.asarray(gm),
            phot_t, err_t, mask_j, chi2_p_j, lnorm_p_j, phot_n_j,
            jnp.asarray(math.log(grad_smf[i])), dim_prior=dim_prior))

    from scipy.special import logsumexp as np_lse
    lnl = np_lse(lnls, axis=0)
    lnl_mix = np.logaddexp(lnl + ln_fin, lnl_outlier + ln_fout)
    lnl_tot = float(np.sum(lnl_mix))
    if return_lnls:
        return lnl_tot, lnl_mix
    return lnl_tot


__all__ = ["isochrone_loglike", "DEFAULT_SMF_GRID"]
