"""
Pure-numpy oracle implementing the reference equations of
joshspeagle/brutus for golden-value testing.

This module re-derives (NOT copies) the math documented in the reference:
  * reddened-SED expansion             (brutus/utils.py:286-347)
  * magnitude-space alternating solves (brutus/fitting.py:34-271)
  * flux-space damped update           (brutus/fitting.py:274-427)
  * MLE re-expansion + 3x3 precision   (brutus/fitting.py:430-576)
  * per-star log-likelihood driver     (brutus/fitting.py:579-820)

It follows the reference's dynamic-shape semantics (actual subsetting of
culled models) so that the static-shape TPU implementation can be
validated against the true reference behavior.  Written against float64.
"""

import numpy as np
from scipy import stats


def oracle_get_seds(mag_coeffs, av, rv, return_flux=False):
    mags = mag_coeffs[..., 0]
    r0 = mag_coeffs[..., 1]
    dr = mag_coeffs[..., 2]
    rvecs = r0 + rv[:, None] * dr
    seds = mags + av[:, None] * rvecs
    drvecs = np.broadcast_to(dr, seds.shape).copy()
    if return_flux:
        fac = -0.4 * np.log(10.0)
        seds = 10.0 ** (-0.4 * seds)
        rvecs = fac * seds * rvecs
        drvecs = fac * seds * drvecs
    return seds, rvecs, drvecs


def oracle_sed_mle(data, tot_var, mag_coeffs, av, rv,
                   av_gauss=(0.0, 1e6), rv_gauss=(3.32, 0.18),
                   av_reg=0.05, rv_reg=0.1):
    models, rvecs, drvecs = oracle_get_seds(mag_coeffs, av, rv,
                                            return_flux=True)
    s_num = np.sum(models * data / tot_var, axis=1)
    s_den = np.sum(models ** 2 / tot_var, axis=1)
    scale = np.maximum(s_num / s_den, 1e-20)

    models_int = 10.0 ** (-0.4 * mag_coeffs[..., 0])
    reddening = models - models_int
    models = models * scale[:, None]
    resid = data - models
    t = models - resid
    sr_mix = np.sum(drvecs * t / tot_var, axis=1)
    sa_mix = np.sum(rvecs * t / tot_var, axis=1)
    rvecs = rvecs * scale[:, None]
    drvecs = drvecs * scale[:, None]
    reddening = reddening * scale[:, None]
    ar_mix = np.sum(drvecs * (reddening - resid) / tot_var, axis=1)
    a_den = (np.sum(rvecs ** 2 / tot_var, axis=1)
             + 1.0 / av_gauss[1] ** 2 + 1.0 / av_reg ** 2)
    r_den = (np.sum(drvecs ** 2 / tot_var, axis=1)
             + 1.0 / rv_gauss[1] ** 2 + 1.0 / rv_reg ** 2)

    N = len(scale)
    icov = np.zeros((N, 3, 3))
    icov[:, 0, 0] = s_den
    icov[:, 1, 1] = a_den
    icov[:, 2, 2] = r_den
    icov[:, 0, 1] = icov[:, 1, 0] = sa_mix
    icov[:, 0, 2] = icov[:, 2, 0] = sr_mix
    icov[:, 1, 2] = icov[:, 2, 1] = ar_mix
    return models, rvecs, drvecs, scale, icov, resid


def oracle_optimize_mag(data, tot_var, av, rv, mag_coeffs, mags, mags_var,
                        avlim=(0.0, 20.0), av_gauss=(0.0, 1e6),
                        rvlim=(1.0, 8.0), rv_gauss=(3.32, 0.18),
                        tol=0.05, init_thresh=5e-3):
    av, rv = av.copy(), rv.copy()
    models, rvecs, drvecs = oracle_get_seds(mag_coeffs, av, rv)
    resid = mags - models
    avmin, avmax = avlim
    rvmin, rvmax = rvlim
    av_vi = 1.0 / av_gauss[1] ** 2
    rv_vi = 1.0 / rv_gauss[1] ** 2
    s_den = np.sum(1.0 / mags_var, axis=1)
    rp_den = np.sum(drvecs ** 2 / mags_var, axis=1)
    srp_mix = np.sum(drvecs / mags_var, axis=1)

    while True:
        a_den = np.sum(rvecs ** 2 / mags_var, axis=1) + av_vi
        sa_mix = np.sum(rvecs / mags_var, axis=1)
        resid_s = np.sum(resid / mags_var, axis=1)
        resid_a = (np.sum(resid * rvecs / mags_var, axis=1)
                   + (av_gauss[0] - av) * av_vi)
        sa_idet = 1.0 / (s_den * a_den - sa_mix ** 2)
        dav = sa_idet * (s_den * resid_a - sa_mix * resid_s)
        dav = np.clip(dav, avmin - av, avmax - av)
        av = av + dav
        resid = resid - dav[:, None] * rvecs

        r_den = rp_den * av ** 2 + rv_vi
        sr_mix = srp_mix * av
        resid_s = np.sum(resid / mags_var, axis=1)
        resid_r = (av * np.sum(resid * drvecs / mags_var, axis=1)
                   + (rv_gauss[0] - rv) * rv_vi)
        sr_idet = 1.0 / (s_den * r_den - sr_mix ** 2)
        drv = sr_idet * (s_den * resid_r - sr_mix * resid_s)
        drv = np.clip(drv, rvmin - rv, rvmax - rv)
        rv = rv + drv
        resid = resid - (av * drv)[:, None] * drvecs
        rvecs = rvecs + drv[:, None] * drvecs

        chi2 = np.sum(resid ** 2 / mags_var, axis=1)
        logwt = -0.5 * chi2
        good = logwt > logwt.max() + np.log(init_thresh)
        err = max(np.abs(dav[good]).max(), np.abs(drv[good]).max(),
                  -np.inf)
        if err < tol:
            break

    return av, rv


def oracle_optimize_flux_step(data, tot_var, models, rvecs, drvecs, av, rv,
                              resid, stepsize,
                              avlim=(0.0, 20.0), av_gauss=(0.0, 1e6),
                              rvlim=(1.0, 8.0), rv_gauss=(3.32, 0.18)):
    av_vi = 1.0 / av_gauss[1] ** 2
    rv_vi = 1.0 / rv_gauss[1] ** 2
    a_num = (np.sum(rvecs * resid / tot_var, axis=1)
             + (av_gauss[0] - av) * av_vi)
    a_den = np.sum(rvecs ** 2 / tot_var, axis=1) + av_vi
    dav = a_num / a_den * stepsize
    r_num = (np.sum(drvecs * resid / tot_var, axis=1)
             + (rv_gauss[0] - rv) * rv_vi)
    r_den = np.sum(drvecs ** 2 / tot_var, axis=1) + rv_vi
    drv = r_num / r_den * stepsize
    dav = np.clip(dav, avlim[0] - av, avlim[1] - av)
    av = av + dav
    drv = np.clip(drv, rvlim[0] - rv, rvlim[1] - rv)
    rv = rv + drv
    return av, rv


def oracle_loglike(data, data_err, data_mask, mag_coeffs,
                   avlim=(0.0, 20.0), av_gauss=(0.0, 1e6),
                   rvlim=(1.0, 8.0), rv_gauss=(3.32, 0.18),
                   dim_prior=True, ltol=3e-2, ltol_subthresh=1e-2,
                   init_thresh=5e-3, parallax=np.nan, parallax_err=np.nan):
    """Reference `loglike` semantics with true dynamic subsetting."""
    Nmodels = mag_coeffs.shape[0]
    clean = np.isfinite(data) & np.isfinite(data_err) & (data_err > 0.0)
    data_mask = data_mask & clean
    Ndim = int(np.sum(data_mask))

    flux, fluxerr = data[data_mask], data_err[data_mask]
    mcoeffs = mag_coeffs[:, data_mask, :]
    tot_var = np.repeat(np.square(fluxerr)[None, :], Nmodels, axis=0)

    with np.errstate(all="ignore"):
        mags = -2.5 * np.log10(flux)
        mags_var = (2.5 / np.log(10.0)) ** 2 * tot_var / np.square(flux)
        mclean = np.isfinite(mags)
        mags = np.where(mclean, mags, 0.0)
        mags_var[:, ~mclean] = 1e30

    av0 = np.full(Nmodels, av_gauss[0])
    rv0 = np.full(Nmodels, rv_gauss[0])
    av, rv = oracle_optimize_mag(flux, tot_var, av0, rv0, mcoeffs, mags,
                                 mags_var, avlim=avlim, av_gauss=av_gauss,
                                 rvlim=rvlim, rv_gauss=rv_gauss,
                                 tol=2.5 * ltol,
                                 init_thresh=(init_thresh if init_thresh
                                              is not None else 5e-3))
    (models, rvecs, drvecs, scale, icov_sar,
     resid) = oracle_sed_mle(flux, tot_var, mcoeffs, av, rv,
                             av_gauss=av_gauss, rv_gauss=rv_gauss)

    chi2 = np.sum(resid ** 2 / tot_var, axis=1)
    lnl = -0.5 * chi2

    if init_thresh is not None:
        lnl_p = lnl.copy()
        if np.isfinite(parallax) and np.isfinite(parallax_err):
            par = np.sqrt(scale)
            lnl_p = lnl - 0.5 * (par - parallax) ** 2 / parallax_err ** 2
        sel = np.where(lnl_p > lnl_p.max() + np.log(init_thresh))[0]
    else:
        sel = np.arange(Nmodels)

    tv = tot_var[sel]
    mc = mcoeffs[sel]
    models, rvecs, drvecs = models[sel], rvecs[sel], drvecs[sel]
    av_n, rv_n, resid_n = av[sel], rv[sel], resid[sel]
    scale_n, icov_n = scale[sel], icov_sar[sel]

    lnl_old, lerr = np.full(len(sel), -1e300), 1e300
    stepsize = np.ones(len(sel))
    while lerr > ltol:
        av_n, rv_n = oracle_optimize_flux_step(
            flux, tv, models, rvecs, drvecs, av_n, rv_n, resid_n, stepsize,
            avlim=avlim, av_gauss=av_gauss, rvlim=rvlim, rv_gauss=rv_gauss)
        (models, rvecs, drvecs, scale_n, icov_n,
         resid_n) = oracle_sed_mle(flux, tv, mc, av_n, rv_n,
                                   av_gauss=av_gauss, rv_gauss=rv_gauss)
        chi2_new = np.sum(resid_n ** 2 / tv, axis=1)
        lnl_new = -0.5 * chi2_new
        good = lnl_new > lnl_new.max() + np.log(ltol_subthresh)
        lerr = np.max(np.abs(lnl_new - lnl_old)[good])
        stepsize[lnl_new < lnl_old] /= 1.2
        lnl_old = lnl_new

    lnl_new = lnl_new - 0.5 * (Ndim * np.log(2.0 * np.pi)
                               + np.sum(np.log(tv), axis=1))
    lnl[sel], chi2[sel] = lnl_new, chi2_new
    scale[sel], av[sel], rv[sel] = scale_n, av_n, rv_n
    icov_sar[sel] = icov_n

    if dim_prior:
        lnl = stats.chi2.logpdf(chi2, Ndim - 3)

    return lnl, Ndim, chi2, scale, av, rv, icov_sar


# ---------------------------------------------------------------------------
# Posterior-stage oracle (brutus/fitting.py:823-1107)
# ---------------------------------------------------------------------------

def oracle_scale_parallax_lnprior(s, s_err, p, p_err, snr_lim=4.0):
    """Reference pdf.py:178-260 in numpy float64."""
    if not (np.isfinite(p) and np.isfinite(p_err) and p / p_err > snr_lim):
        return np.zeros_like(s)
    pm = max(p, 0.0)
    s_mean = pm ** 2 + p_err ** 2
    s_std = np.sqrt(2 * p_err ** 4 + 4 * pm ** 2 * p_err ** 2)
    var = s_std ** 2 + s_err ** 2
    return -0.5 * ((s - s_mean) ** 2 / var + np.log(2 * np.pi * var))


def oracle_parallax_lnprior(par, p, p_err):
    if not (np.isfinite(p) and np.isfinite(p_err)):
        return np.zeros_like(par)
    return -0.5 * ((par - p) ** 2 / p_err ** 2
                   + np.log(2 * np.pi * p_err ** 2))


def oracle_dust_lnprior(dists, avs, av_dist, av_mean, av_std,
                        scale=1.0, offset=0.0, smooth=1.0, scatter=0.2):
    """Reference pdf.py:752-840 in numpy float64 (np.interp profile)."""
    mean_d = scale * np.interp(dists, av_dist, av_mean) + offset
    err_d = smooth * scale * np.interp(dists, av_dist, av_std)
    err_d = np.sqrt(err_d ** 2 + scatter ** 2)
    return -0.5 * ((avs - mean_d) ** 2 / err_d ** 2
                   + np.log(2 * np.pi * err_d ** 2))


def oracle_lnpost(results, z_full, parallax=np.nan, parallax_err=np.nan,
                  lnprior=None, gal_fn=None, dust_fn=None,
                  wt_thresh=1e-3, avlim=(0.0, 20.0), rvlim=(1.0, 8.0),
                  psd_width=0.02):
    """Reference `lnpost` (brutus/fitting.py:823-1107) with true dynamic
    subsetting, float64, and *injected* MC normals.

    Parameters
    ----------
    results : tuple `(lnlike, Ndim, chi2, scales, avs, rvs, icovs_sar)`.
    z_full : (M, 3, Nmc) standard-normal draws indexed by *global* model
        id, so the TPU path's threefry samples can be injected for exact
        golden-value comparison.
    gal_fn : callable `(dists, feh?, loga?) -> lnp` (already bound to the
        coordinate); dust_fn : callable `(dists, avs) -> lnp` or None.

    Returns
    -------
    `(sel, cov_sar, lnp, dists_mc, reds_mc, dreds_mc, logwts_mc, levid)`.
    """
    lnlike, Ndim, chi2, scales, avs, rvs, icovs = [
        np.asarray(v, dtype=float) if np.ndim(v) else v for v in results]
    M = len(lnlike)
    if lnprior is None:
        lnprior = np.zeros(M)

    # Rough parallax prior in scale space for clipping (fitting.py:975-985).
    s_err = 1.0 / np.sqrt(np.abs(icovs[:, 0, 0]))
    lnprob = lnlike + oracle_scale_parallax_lnprior(scales, s_err,
                                                    parallax, parallax_err)
    lnprob[~np.isfinite(lnprob)] = -1e300

    # Cull #1 on likelihood (+ parallax) (fitting.py:988-997).
    sel = np.where(lnprob > np.max(lnprob) + np.log(wt_thresh))[0]

    # Priors at the MLE solution (fitting.py:999-1010).
    with np.errstate(all="ignore"):
        dist = 1.0 / np.sqrt(scales[sel])
        lnp = lnlike[sel] + lnprior[sel] + gal_fn(dist, sel)
        if dust_fn is not None:
            lnp = lnp + dust_fn(dist, avs[sel])

    # Cull #2 on the posterior, then re-base (fitting.py:1012-1023).
    sel = sel[lnp > np.max(lnp) + np.log(wt_thresh)]
    lnp = lnlike[sel] + lnprior[sel]
    scale, av, rv = scales[sel], avs[sel], rvs[sel]
    icov = icovs[sel].copy()

    # Covariances + escalating PSD repair (fitting.py:1039-1065).
    cov = np.linalg.inv(icov)
    not_psd = np.where(~np.all(np.linalg.eigvals(cov) > 0, axis=1))[0]
    count = 1
    while len(not_psd) > 0:
        sfrac = scale[not_psd] * psd_width
        i1 = cov[not_psd][:, 0, 0] <= 0
        i2 = cov[not_psd][:, 1, 1] <= 0
        i3 = cov[not_psd][:, 2, 2] <= 0
        s1 = i1 + (~i2 * ~i3)
        s2 = i2 + (~i1 * ~i3)
        s3 = i3 + (~i1 * ~i2)
        icov[not_psd] += np.array(
            [np.diag([count / sf ** 2 * s1[i], count / psd_width ** 2 * s2[i],
                      count / psd_width ** 2 * s3[i]])
             for i, sf in enumerate(sfrac)])
        cov[not_psd] = np.linalg.inv(icov[not_psd])
        bad = np.where(~np.all(np.linalg.eigvals(cov[not_psd]) > 0,
                               axis=1))[0]
        not_psd = not_psd[bad]
        count *= 2

    # MC integration over the per-model (s, Av, Rv) Gaussians with the
    # injected normals (fitting.py:1068-1098).
    L = np.linalg.cholesky(cov)
    z = z_full[sel]                                   # (Nsel, 3, Nmc)
    mean = np.stack([scale, av, rv], axis=-1)
    samps = mean[:, :, None] + np.einsum('kij,kjn->kin', L, z)
    s_mc, a_mc, r_mc = samps[:, 0], samps[:, 1], samps[:, 2]
    with np.errstate(all="ignore"):
        par_mc = np.sqrt(s_mc)
        dist_mc = 1.0 / par_mc
        lnp_mc = gal_fn(dist_mc, sel)
        if dust_fn is not None:
            lnp_mc = lnp_mc + dust_fn(dist_mc, a_mc)
        lnp_mc = lnp_mc + oracle_parallax_lnprior(par_mc, parallax,
                                                  parallax_err)
    inbounds = ((s_mc >= 1e-20) &
                (a_mc >= avlim[0]) & (a_mc <= avlim[1]) &
                (r_mc >= rvlim[0]) & (r_mc <= rvlim[1]))
    lnp_mc[~inbounds] = -1e300
    n_eff = inbounds.sum(axis=1)
    from scipy.special import logsumexp
    with np.errstate(all="ignore"):
        lnp = lnp + logsumexp(lnp_mc, axis=1) - np.log(n_eff)
    lnp[~np.isfinite(lnp)] = -1e300
    levid = logsumexp(lnp)
    return sel, cov, lnp, dist_mc, a_mc, r_mc, lnp_mc, levid


def make_synthetic_grid(rng, nmodel=64, nfilt=8):
    """Random but physically-plausible (mag, r0, dr) coefficient grid."""
    mags = rng.uniform(2.0, 12.0, size=(nmodel, nfilt))
    # Reddening vectors: positive, band-dependent, O(1) with mild slope.
    r0 = rng.uniform(0.3, 1.2, size=(nmodel, nfilt))
    dr = rng.uniform(0.05, 0.25, size=(nmodel, nfilt))
    return np.stack([mags, r0, dr], axis=-1)


def make_synthetic_star(rng, mag_coeffs, av=0.4, rv=3.1, dist_kpc=1.0,
                        snr=50.0, idx=0):
    """Noisy fluxes generated from one grid model at given (av, rv, dist)."""
    nfilt = mag_coeffs.shape[1]
    seds, _, _ = oracle_get_seds(mag_coeffs[idx:idx + 1],
                                 np.array([av]), np.array([rv]))
    mu = 5.0 * np.log10(dist_kpc * 1000.0) - 5.0
    flux_true = 10.0 ** (-0.4 * (seds[0] + mu))
    err = flux_true / snr
    flux = flux_true + rng.normal(size=nfilt) * err
    mask = np.ones(nfilt, bool)
    return flux, err, mask
