"""
Per-star x per-model linear optimization of `(s, Av, Rv)` and the grid
log-likelihood.

This is the compute core of the framework: the reference's four numba
kernels (`brutus/fitting.py:34` `_optimize_fit_mag`, `:274`
`_optimize_fit_flux`, `:430` `_get_sed_mle`, and `brutus/utils.py:286`
`_get_seds`) recast as dense, batched tensor algebra over a
`(models, filters)` block with `lax.while_loop` control flow.  A single
call handles one star against the full (or sharded) model grid; stars
are batched with `vmap` and the model axis sharded with `pjit` /
`NamedSharding` (see `brutus_tpu.parallel`).

Design notes (TPU-first, not a translation):
  * The reference culls models between phases via boolean fancy-indexing
    (dynamic shapes).  Here all models stay resident and dense; the cull
    set only defines the convergence predicate and which phase's results
    each model reports (`keep` mask), which reproduces the reference's
    outputs exactly while keeping shapes static.
  * Band masking is handled by zero weights (`wt = mask / var`) instead
    of fancy-indexing the filter axis.
  * The filter-axis reductions are expressed as `X @ w` contractions so
    XLA can fuse them and feed the MXU/VPU efficiently.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..config import FitConfig, LN2PI
from ..utils import chi2_logpdf
from .sed import get_seds_mag, get_seds_flux

NEG_BIG = -1e30  # reference's -inf stand-in (fitting.py:778), float32-safe


def _masked_max(x, mask, initial=-jnp.inf):
    return jnp.max(jnp.where(mask, x, initial))


def prepare_star_data(flux, fluxerr, mask, cfg: FitConfig):
    """Data hygiene + magnitude conversion shared by both engines.

    Parity: reference `brutus/fitting.py:706-725`.  Shape-polymorphic
    over leading batch dims (band axis last).  Bands that are masked or
    unclean get zero weight; negative-flux bands keep their flux-space
    weight but get ~zero magnitude-space weight (the reference's 1e50
    variance flag).

    Returns `(flux, wt_flux, mags, wt_mag, mask, ndim, tot_var)`.
    """
    clean = jnp.isfinite(flux) & jnp.isfinite(fluxerr) & (fluxerr > 0.0)
    mask = (mask > 0) & clean
    flux = jnp.where(mask, flux, 0.0)
    fluxerr = jnp.where(mask, fluxerr, 1.0)
    ndim = jnp.sum(mask, axis=-1)
    tot_var = jnp.square(fluxerr)
    wt_flux = jnp.where(mask, 1.0 / tot_var, 0.0)
    pos = mask & (flux > 0.0)
    safe_flux = jnp.where(pos, flux, 1.0)
    mags = jnp.where(pos, -2.5 * jnp.log10(safe_flux), 0.0)
    mags_var = ((2.5 / jnp.log(10.0)) ** 2 * tot_var
                / jnp.square(safe_flux))
    wt_mag = jnp.where(mask,
                       jnp.where(pos, 1.0 / mags_var, 1.0 / cfg.big_var),
                       0.0)
    return flux, wt_flux, mags, wt_mag, mask, ndim, tot_var


# ---------------------------------------------------------------------------
# Phase A: magnitude-space alternating (Av, Rv) solves
# (parity: reference brutus/fitting.py:34-271)
# ---------------------------------------------------------------------------

def direct_mag_init(mags, wt_mag, mag_coeffs, cfg: FitConfig):
    """One-shot weighted least squares for `(mu-offset, Av, Av*Rv)`.

    In magnitudes the model is exactly linear in these three parameters
    (`sed = mag0 + u + Av*r0 + (Av*Rv)*dr`), so the optimum of the
    unclamped objective is a single batched 3x3 solve — the seed for the
    reference's alternating clamped iterations (see SURVEY.md §7).
    """
    from ..utils import inverse3
    r0 = mag_coeffs[..., 1]
    dr = mag_coeffs[..., 2]
    resid0 = mags - mag_coeffs[..., 0]               # (M, F)
    av_var_inv = 1.0 / cfg.av_gauss[1] ** 2
    M = mag_coeffs.shape[0]

    sw = jnp.sum(wt_mag) * jnp.ones(M, mag_coeffs.dtype)
    swr = r0 @ wt_mag
    swd = dr @ wt_mag
    swrr = (r0 * r0) @ wt_mag + av_var_inv
    swrd = (r0 * dr) @ wt_mag
    swdd = (dr * dr) @ wt_mag
    b0 = resid0 @ wt_mag
    b1 = (resid0 * r0) @ wt_mag + cfg.av_gauss[0] * av_var_inv
    b2 = (resid0 * dr) @ wt_mag

    G = jnp.stack([
        jnp.stack([sw, swr, swd], -1),
        jnp.stack([swr, swrr, swrd], -1),
        jnp.stack([swd, swrd, swdd], -1)], -2)       # (M, 3, 3)
    sol = jnp.einsum('mij,mj->mi', inverse3(G),
                     jnp.stack([b0, b1, b2], -1))
    av = jnp.clip(sol[:, 1], *cfg.avlim)
    rv = jnp.where(jnp.abs(sol[:, 1]) > 1e-10,
                   sol[:, 2] / jnp.where(jnp.abs(sol[:, 1]) > 1e-10,
                                         sol[:, 1], 1.0),
                   cfg.rv_gauss[0])
    rv = jnp.clip(rv, *cfg.rvlim)
    return av, rv


def optimize_mag(mags, wt_mag, mag_coeffs, av0, rv0, cfg: FitConfig):
    """Iterated alternating 2x2 weighted least-squares in magnitude space.

    In magnitudes, extinction is additive, so at fixed R(V) the system in
    (distance-modulus offset, dAv) is linear; the reference alternates
    the (s, Av) and (s, Rv) 2x2 solves with Gaussian priors and bound
    clamps until the (Av, Rv) updates of all "reasonably good" models
    fall below tolerance (fitting.py:173-264).

    Parameters
    ----------
    mags : (F,) observed magnitudes (0 where invalid).
    wt_mag : (F,) inverse magnitude variances, 0 for masked/invalid bands.
    mag_coeffs : (M, F, 3)
    av0, rv0 : (M,) initial values.

    Returns
    -------
    av, rv : (M,) optimized extinction parameters.
    """
    if cfg.mag_direct_init:
        av0, rv0 = direct_mag_init(mags, wt_mag, mag_coeffs, cfg)
    mag0 = mag_coeffs[..., 0]
    r0 = mag_coeffs[..., 1]
    dr = mag_coeffs[..., 2]                       # (M, F)

    av_var_inv = 1.0 / cfg.av_gauss[1] ** 2
    rv_var_inv = 1.0 / cfg.rv_gauss[1] ** 2
    av_mean, rv_mean = cfg.av_gauss[0], cfg.rv_gauss[0]
    avmin, avmax = cfg.avlim
    rvmin, rvmax = cfg.rvlim
    log_init_thresh = math.log(cfg.init_thresh)

    # Iteration-constant reductions (fitting.py:158-164).
    s_den = jnp.sum(wt_mag) * jnp.ones(mag_coeffs.shape[0],
                                       dtype=mag_coeffs.dtype)
    rp_den = (dr * dr) @ wt_mag                   # (M,)
    srp_mix = dr @ wt_mag                         # (M,)

    # TPU note: the carry holds only (M,) vectors.  `rvec` and `resid`
    # are exact functions of the carried (av, rv) — the reference's
    # in-place updates (fitting.py:204, 236-238) maintain precisely
    # `rvec = r0 + rv dr`, `resid = mags - mag0 - av rvec` — so they
    # are recomputed at the top of each iteration and every (M, F)
    # intermediate dies inside one XLA fusion instead of being copied
    # through the while-loop carry each iteration (the dominant HBM
    # cost of this engine at (chunk, 750k, F) shapes).
    def body(state):
        av, rv, _, it = state
        rvec = r0 + rv[:, None] * dr
        resid = mags - (mag0 + av[:, None] * rvec)

        # --- Av update (fitting.py:176-204) ---
        a_den = (rvec * rvec) @ wt_mag + av_var_inv
        sa_mix = rvec @ wt_mag
        resid_s = resid @ wt_mag
        resid_a = (resid * rvec) @ wt_mag + (av_mean - av) * av_var_inv
        sa_idet = 1.0 / (s_den * a_den - sa_mix * sa_mix)
        dav = sa_idet * (s_den * resid_a - sa_mix * resid_s)
        dav = jnp.clip(dav, avmin - av, avmax - av)
        av = av + dav
        resid = resid - dav[:, None] * rvec

        # --- Rv update (fitting.py:206-237) ---
        r_den = rp_den * av * av + rv_var_inv
        sr_mix = srp_mix * av
        resid_s = resid @ wt_mag
        resid_r = av * ((resid * dr) @ wt_mag) + (rv_mean - rv) * rv_var_inv
        sr_idet = 1.0 / (s_den * r_den - sr_mix * sr_mix)
        drv = sr_idet * (s_den * resid_r - sr_mix * resid_s)
        drv = jnp.clip(drv, rvmin - rv, rvmax - rv)
        rv = rv + drv
        resid = resid - (av * drv)[:, None] * dr

        # --- convergence over good-fit subset (fitting.py:240-264) ---
        chi2 = (resid * resid) @ wt_mag
        logwt = -0.5 * chi2
        good = logwt > jnp.max(logwt) + log_init_thresh
        err = _masked_max(jnp.maximum(jnp.abs(dav), jnp.abs(drv)), good)
        return av, rv, err, it + 1

    def cond(state):
        *_, err, it = state
        return (err >= cfg.mtol) & (it < cfg.max_iter_mag)

    init = (av0, rv0, jnp.asarray(jnp.inf, mags.dtype),
            jnp.asarray(0, jnp.int32))
    av, rv, _err, n_iter = lax.while_loop(cond, body, init)
    return av, rv, n_iter


# ---------------------------------------------------------------------------
# MLE re-expansion in flux space
# (parity: reference brutus/fitting.py:430-576 `_get_sed_mle`)
# ---------------------------------------------------------------------------

def sed_mle(flux, wt_flux, mag_coeffs, av, rv, cfg: FitConfig,
            want_step_sums=False):
    """Recompute flux-space models at `(av, rv)`, solve the MLE scale per
    model, and build the per-model 3x3 precision of `(s, Av, Rv)`.

    Parameters
    ----------
    flux : (F,) observed fluxes (0 where masked).
    wt_flux : (F,) `mask / tot_var`.
    mag_coeffs : (M, F, 3); av, rv : (M,).
    want_step_sums : also return the four filter-axis reductions the
        damped flux update consumes (`(rvec_s*resid)@w`,
        `(rvec_s*rvec_s)@w`, `(drvec_s*resid)@w`, `(drvec_s*drvec_s)@w`)
        plus `chi2` — so `_flux_polish` can carry only `(M,)` state
        (every `(M, F)` intermediate then dies inside one XLA fusion
        instead of being copied through the while-loop carry each
        iteration; measured 366 MB per carried array per star-chunk).

    Returns
    -------
    models, rvecs, drvecs : (M, F) scaled flux-space quantities.
    scale : (M,); icov_parts : 6-tuple of (M,) components
    `(s_den, a_den, r_den, sa, sr, ar)`; resid : (M, F).
    With `want_step_sums`: `(..., resid, (ra, qa, rd, qr), chi2)`.
    """
    m, rvec, drvec = get_seds_flux(mag_coeffs, av, rv)   # unscaled

    # MLE scale factor (fitting.py:510-518).  The normal matrix is
    # floored: m**2 underflows float32 for strongly extincted faint
    # models and 0/0 would poison chi2 with NaN.
    s_num = m @ (flux * wt_flux)
    s_den = jnp.maximum((m * m) @ wt_flux, 1e-30)
    scale = jnp.maximum(s_num / s_den, cfg.scale_min)

    # Reddening contribution relative to the intrinsic SED.
    m_int = 10.0 ** (-0.4 * mag_coeffs[..., 0])
    ms = m * scale[:, None]
    resid = flux - ms
    red_s = (m - m_int) * scale[:, None]

    # Cross terms: the scale rows use *unscaled* reddening vectors, the
    # (Av, Rv) block uses *scaled* ones (fitting.py:526-561).
    t = ms - resid                                       # = 2*ms - flux
    sa_mix = (rvec * t) @ wt_flux
    sr_mix = (drvec * t) @ wt_flux
    rvec_s = rvec * scale[:, None]
    drvec_s = drvec * scale[:, None]
    ar_mix = (drvec_s * (red_s - resid)) @ wt_flux
    qa = (rvec_s * rvec_s) @ wt_flux
    qr = (drvec_s * drvec_s) @ wt_flux
    a_den = qa + 1.0 / cfg.av_gauss[1] ** 2 + 1.0 / cfg.av_reg ** 2
    r_den = qr + 1.0 / cfg.rv_gauss[1] ** 2 + 1.0 / cfg.rv_reg ** 2

    # The 3x3 precisions travel as their 6 unique components; a dense
    # (M, 3, 3) tensor costs 9x the memory traffic of the parts and the
    # posterior stage only assembles the top-k rows
    # (`ops.pallas_loglike.icov_from_parts`).
    icov_parts = (s_den, a_den, r_den, sa_mix, sr_mix, ar_mix)
    if not want_step_sums:
        return ms, rvec_s, drvec_s, scale, icov_parts, resid
    ra = (rvec_s * resid) @ wt_flux
    rd = (drvec_s * resid) @ wt_flux
    chi2 = (resid * resid) @ wt_flux
    return (ms, rvec_s, drvec_s, scale, icov_parts, resid,
            (ra, qa, rd, qr), chi2)


# ---------------------------------------------------------------------------
# One damped flux-space (Av, Rv) update
# (parity: reference brutus/fitting.py:274-427 `_optimize_fit_flux`)
# ---------------------------------------------------------------------------

def optimize_flux_step(wt_flux, models, rvecs, drvecs, resid, av, rv,
                       stepsize, cfg: FitConfig):
    """Single damped `(dAv, dRv)` update in flux-density space.

    Both updates are solved at the *current* residuals (independently,
    fitting.py:385-402), scaled by the per-model `stepsize`, clamped to
    bounds, and applied.
    """
    av_var_inv = 1.0 / cfg.av_gauss[1] ** 2
    rv_var_inv = 1.0 / cfg.rv_gauss[1] ** 2

    a_num = (rvecs * resid) @ wt_flux + (cfg.av_gauss[0] - av) * av_var_inv
    a_den = (rvecs * rvecs) @ wt_flux + av_var_inv
    dav = stepsize * a_num / a_den

    r_num = (drvecs * resid) @ wt_flux + (cfg.rv_gauss[0] - rv) * rv_var_inv
    r_den = (drvecs * drvecs) @ wt_flux + rv_var_inv
    drv = stepsize * r_num / r_den

    dav = jnp.clip(dav, cfg.avlim[0] - av, cfg.avlim[1] - av)
    av = av + dav
    drv = jnp.clip(drv, cfg.rvlim[0] - rv, cfg.rvlim[1] - rv)
    rv = rv + drv
    return av, rv


def _flux_polish(flux, wt_flux, mcoeffs, init_arrays, keep, cfg: FitConfig):
    """Damped flux-space iteration to convergence on a model block.

    Parity: the `while lerr > ltol` loop of reference
    `brutus/fitting.py:777-803`; convergence is judged on the subset of
    `keep` models within `ltol_subthresh` of the block's best fit.

    TPU note: the loop carry holds only `(M,)` vectors — the damped
    `(dAv, dRv)` update (`optimize_flux_step`'s math) needs just four
    filter-axis reductions, which `sed_mle(want_step_sums=True)`
    emits alongside the precisions.  Carrying the `(M, F)`
    models/rvecs/drvecs/resid arrays instead (as a literal reading of
    the reference does) forces XLA to copy ~4 x (chunk, M, F) f32
    through the while-loop carry every iteration — the dominant HBM
    cost of this engine (and the round-3 B=128 OOM).

    Returns `(chi2, scale, av, rv, icov_sar, n_iter)` for the block.
    """
    models, rvecs, drvecs, scale, av, rv, icov, resid = init_arrays
    K = av.shape[0]
    dtype = av.dtype
    ln_subthresh = math.log(cfg.ltol_subthresh)
    av_var_inv = 1.0 / cfg.av_gauss[1] ** 2
    rv_var_inv = 1.0 / cfg.rv_gauss[1] ** 2

    # Step sums of the phase-A state (identical values to what the
    # previous carried-arrays formulation computed in its first
    # `optimize_flux_step`).
    sums0 = ((rvecs * resid) @ wt_flux, (rvecs * rvecs) @ wt_flux,
             (drvecs * resid) @ wt_flux, (drvecs * drvecs) @ wt_flux)

    def body(state):
        (scale, av, rv, icov, sums, lnl_old, stepsize, _, it) = state
        ra, qa, rd, qr = sums
        # Damped (dAv, dRv) update — optimize_flux_step's math on the
        # carried reductions (both solved at the current residuals,
        # fitting.py:385-402).
        a_num = ra + (cfg.av_gauss[0] - av) * av_var_inv
        a_den = qa + av_var_inv
        dav = stepsize * a_num / a_den
        r_num = rd + (cfg.rv_gauss[0] - rv) * rv_var_inv
        r_den = qr + rv_var_inv
        drv = stepsize * r_num / r_den
        dav = jnp.clip(dav, cfg.avlim[0] - av, cfg.avlim[1] - av)
        av = av + dav
        drv = jnp.clip(drv, cfg.rvlim[0] - rv, cfg.rvlim[1] - rv)
        rv = rv + drv
        (_m, _rv_, _drv_, scale, icov, _resid, sums,
         chi2) = sed_mle(flux, wt_flux, mcoeffs, av, rv, cfg,
                         want_step_sums=True)
        lnl_new = -0.5 * chi2
        sel = keep & (lnl_new > _masked_max(lnl_new, keep) + ln_subthresh)
        lerr = _masked_max(jnp.abs(lnl_new - lnl_old), sel)
        stepsize = jnp.where(lnl_new < lnl_old,
                             stepsize / cfg.stepsize_rescale, stepsize)
        return (scale, av, rv, icov, sums, lnl_new, stepsize, lerr,
                it + 1)

    def cond(state):
        *_, lerr, it = state
        return (lerr > cfg.ltol) & (it < cfg.max_iter_flux)

    init = (scale, av, rv, icov, sums0,
            jnp.full((K,), NEG_BIG, dtype), jnp.ones((K,), dtype),
            jnp.asarray(jnp.inf, dtype), jnp.asarray(0, jnp.int32))
    (scale_f, av_f, rv_f, icov_f, _sums, lnl_f, _ss, _lerr,
     n_iter) = lax.while_loop(cond, body, init)
    return -2.0 * lnl_f, scale_f, av_f, rv_f, icov_f, n_iter


# ---------------------------------------------------------------------------
# Full per-star grid log-likelihood
# (parity: reference brutus/fitting.py:579-820 `loglike`)
# ---------------------------------------------------------------------------

def _loglike_grid_body(flux, fluxerr, mask, mag_coeffs,
                       parallax, parallax_err, av_init, rv_init,
                       cfg: FitConfig):
    """Log-likelihood of one star against every model on the grid,
    profiling out `(s, Av, Rv)` per model.

    Pipeline (mirrors reference `fitting.py:579-820`):
      1. data hygiene + magnitude conversion,
      2. magnitude-space alternating solves (`optimize_mag`),
      3. MLE re-expansion in flux space (`sed_mle`),
      4. likelihood-threshold "cull" (here: a mask; optional parallax
         clip in scale space),
      5. damped flux-space iteration to convergence,
      6. Gaussian normalization constant + optional chi2 dimensionality
         prior.

    Parameters
    ----------
    flux, fluxerr, mask : (F,) per-band data.
    mag_coeffs : (M, F, 3) grid coefficients.
    parallax, parallax_err : scalars (NaN when absent).
    av_init, rv_init : optional (M,) per-model magnitude-phase seeds
        (reference `fitting.py:583-585, 700-703` — warm-starting
        repeat fits); default to the scalar `cfg.av0`/`cfg.rv0`.
        Ignored when `cfg.mag_direct_init` (the direct solve replaces
        any seed).

    Returns
    -------
    dict with `lnlike, ndim, chi2, scale, av, rv` of shapes
    `(M,) / scalar / (M,) / (M,) / (M,) / (M,)` plus `icov_parts`, the
    6 unique components `(s_den, a_den, r_den, sa, sr, ar)` of the
    `(s, Av, Rv)` precision matrices (assemble with
    `ops.pallas_loglike.icov_from_parts` when the full (M, 3, 3)
    tensor is needed).
    """
    dtype = mag_coeffs.dtype
    flux = flux.astype(dtype)
    fluxerr = fluxerr.astype(dtype)
    M = mag_coeffs.shape[0]

    # --- data hygiene + magnitude conversion (fitting.py:706-725) ---
    (flux, wt_flux, mags, wt_mag, mask, ndim,
     tot_var) = prepare_star_data(flux, fluxerr, mask, cfg)

    # --- phase A: magnitude fit (fitting.py:727-741) ---
    av0 = (jnp.broadcast_to(jnp.asarray(av_init, dtype), (M,))
           if av_init is not None else jnp.full((M,), cfg.av0, dtype))
    rv0 = (jnp.broadcast_to(jnp.asarray(rv_init, dtype), (M,))
           if rv_init is not None else jnp.full((M,), cfg.rv0, dtype))
    av, rv, n_iter_mag = optimize_mag(mags, wt_mag, mag_coeffs, av0, rv0, cfg)
    (models, rvecs, drvecs, scale, icov_parts,
     resid) = sed_mle(flux, wt_flux, mag_coeffs, av, rv, cfg)

    chi2_mag = (resid * resid) @ wt_flux
    lnl_mag = -0.5 * chi2_mag

    # --- initial cull mask (fitting.py:743-768) ---
    if cfg.apply_init_cull:
        par = jnp.sqrt(scale)
        have_plx = jnp.isfinite(parallax) & jnp.isfinite(parallax_err)
        chi2_p = jnp.where(have_plx,
                           (par - parallax) ** 2
                           / jnp.where(have_plx, parallax_err, 1.0) ** 2,
                           0.0)
        lnl_p = lnl_mag - 0.5 * chi2_p
        keep = lnl_p > jnp.max(lnl_p) + math.log(cfg.init_thresh)
    else:
        lnl_p = lnl_mag
        keep = jnp.ones((M,), bool)

    # --- phase B: damped flux iteration (fitting.py:777-803) ---
    # Restrict the polish to the top `polish_k` models by phase-A
    # likelihood (the reference's init cull flux-polishes only the
    # surviving models; everything outside keeps phase-A results).
    const = -0.5 * (ndim * LN2PI +
                    jnp.sum(jnp.log(jnp.where(mask, tot_var, 1.0)) * mask))
    if cfg.polish_k and cfg.polish_k < M:
        _, sel_idx = lax.approx_max_k(
            lnl_p if cfg.apply_init_cull else lnl_mag, cfg.polish_k,
            recall_target=0.95)
        g = lambda x: x[sel_idx]
        (chi2_f, scale_f, av_f, rv_f, icov_f, n_iter_flux) = _flux_polish(
            flux, wt_flux, mag_coeffs[sel_idx],
            (g(models), g(rvecs), g(drvecs), g(scale), g(av), g(rv),
             tuple(g(p_) for p_ in icov_parts), g(resid)), g(keep), cfg)
        keep_k = g(keep)
        put = lambda full, new, old_k: full.at[sel_idx].set(
            jnp.where(keep_k, new, old_k))
        lnl = put(lnl_mag, -0.5 * chi2_f + const, g(lnl_mag))
        chi2 = put(chi2_mag, chi2_f, g(chi2_mag))
        scale = put(scale, scale_f, g(scale))
        av = put(av, av_f, g(av))
        rv = put(rv, rv_f, g(rv))
        icov_parts = tuple(put(full, new, g(full)) for full, new
                           in zip(icov_parts, icov_f))
    else:
        (chi2_f, scale_f, av_f, rv_f, icov_f, n_iter_flux) = _flux_polish(
            flux, wt_flux, mag_coeffs,
            (models, rvecs, drvecs, scale, av, rv, icov_parts, resid),
            keep, cfg)
        # Merge: culled models report their phase-A results
        # (fitting.py:805-810).
        lnl = jnp.where(keep, -0.5 * chi2_f + const, lnl_mag)
        chi2 = jnp.where(keep, chi2_f, chi2_mag)
        scale = jnp.where(keep, scale_f, scale)
        av = jnp.where(keep, av_f, av)
        rv = jnp.where(keep, rv_f, rv)
        icov_parts = tuple(jnp.where(keep, new, full) for full, new
                           in zip(icov_parts, icov_f))

    # --- dimensionality prior (fitting.py:812-815) ---
    if cfg.dim_prior:
        lnl = chi2_logpdf(chi2, ndim - 3)

    return dict(lnlike=lnl, ndim=ndim, chi2=chi2, scale=scale,
                av=av, rv=rv, icov_parts=icov_parts,
                n_iter=jnp.stack([n_iter_mag, n_iter_flux]))


@partial(jax.jit, static_argnames=("cfg",))
def loglike_grid(flux, fluxerr, mask, mag_coeffs,
                 parallax=jnp.nan, parallax_err=jnp.nan,
                 av_init=None, rv_init=None,
                 cfg: FitConfig = FitConfig()):
    """See `_loglike_grid_body`.  Traced under
    `default_matmul_precision('highest')`: this engine is the
    exact-semantics verifier, and the TPU MXU truncates f32 matmul
    operands to bf16 (~0.2% noise) at default precision — the
    filter-axis `X @ w` contractions must not pay that."""
    with jax.default_matmul_precision("highest"):
        return _loglike_grid_body(flux, fluxerr, mask, mag_coeffs,
                                  parallax, parallax_err,
                                  av_init, rv_init, cfg)


__all__ = ["optimize_mag", "optimize_flux_step", "sed_mle", "loglike_grid"]
