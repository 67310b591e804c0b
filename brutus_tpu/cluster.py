"""
Co-eval cluster isochrone likelihood + TPU-native cluster fitter.

Parity: reference `brutus/cluster.py:23-419` (`isochrone_loglike`): a
joint likelihood for a stellar cluster given shared parameters
`(feh, loga, av, rv, dist, fout)`, optional per-band photometric
offsets, and optional empirical-correction parameters.  The model
marginalizes every star over the full EEP extent of the isochrone and
over a grid of binary secondary mass fractions, with an inlier/outlier
mixture.

TPU-first redesign: the reference regenerates the isochrone SEDs per
smf in a host Python loop and evaluates a dense `(Npts, Nobj, Nfilt)`
residual block in numpy (`brutus/cluster.py:336-414`); here one theta
evaluation is ONE jitted XLA program — a shared primary isochrone
interpolation + one batched secondary pass for all binary smf values
(`models.isochrone.population_seds_multi`), with the masked chi-square
block decomposed into three `(Nsmf*Neep, F) @ (F, Nobj)` MXU
contractions (no `(Npts, Nobj, Nfilt)` tensor is ever materialized).
`fit_cluster` wraps the same core in the shared stretch-move ensemble
sampler (`brutus_tpu.sampling`), replacing the external dynesty driver
of the reference's cluster demo ("Overview 5").
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp
from scipy.stats import chi2 as chisquare

from .utils import chi2_logpdf
from .models.isochrone import population_seds_multi
from .models.tracks import DEFAULT_CORR_PARAMS

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


@partial(jax.jit, static_argnames=("idx", "smf_sig", "dim_prior"))
def _cluster_core(xgrid, ygrid, nn_params, eep_grid, grad_smf_log,
                  phot, err, phot_mask, phot_n, lnl_outlier,
                  parallax, parallax_ivar, cvals, Xb, corr,
                  mini_bound, eep_binary_max, cluster_prob,
                  *, idx, smf_sig, dim_prior):
    """One cluster-likelihood evaluation as a single device program.

    Parameters (all traced unless starred): the isochrone tables
    `(xgrid, ygrid, nn_params)`; the EEP grid and per-smf log-measure
    `grad_smf_log (Nsmf,)`; the data block `phot/err/phot_mask
    (Nobj, F)`, per-star dof `phot_n`, outlier log-likelihood
    `lnl_outlier`, `parallax`/`parallax_ivar` (ivar 0 where absent);
    the parameters `cvals = (feh, loga, av, rv, dist, fout)`,
    per-band offsets `Xb (F,)`, correction params `corr (4,)`.
    *Static*: `idx` (`IsoIdx`), `smf_sig` (tuple of smf floats),
    `dim_prior`.

    Returns `(lnl_total, lnl_mix (Nobj,))` — the reference's
    `(lnl, lnl_mix)` of `brutus/cluster.py:407-419`.
    """
    feh, loga, av, rv, dist, fout = (cvals[i] for i in range(6))
    fout = jnp.clip(fout, 1e-10, 1.0 - 1e-10)

    # Population SEDs for every smf in one pass -> (Nsmf, Neep, F).
    seds, mini = population_seds_multi(
        xgrid, ygrid, nn_params, idx, eep_grid, feh, 0.0, loga, av, rv,
        dist, smf_sig, mini_bound, eep_binary_max,
        corr_params=(corr[0], corr[1], corr[2], corr[3]))
    n_smf, n_pts, n_f = seds.shape

    # IMF measure along the isochrone (reference cluster.py:367-375):
    # d(mini)/d(EEP) of the PRIMARY, shared by all smf values.
    grad_mini = jnp.gradient(mini)
    valid_pt = jnp.isfinite(grad_mini) & (grad_mini > 0)
    # Binaries are disallowed past the MSTO for smf > 0
    # (reference cluster.py:354-356).
    beyond = eep_grid > eep_binary_max
    smf_pos = jnp.asarray([s > 0 for s in smf_sig])[:, None]
    valid = valid_pt[None] & ~(smf_pos & beyond[None])     # (Nsmf, Neep)

    sed_ok = jnp.isfinite(seds)
    # A point with no finite band would otherwise score chi2_cmd = 0
    # (reference `usable` any-finite condition, cluster.py:348-352).
    valid = valid & sed_ok.any(-1)
    cmd = jnp.where(sed_ok, 10.0 ** (-0.4 * jnp.where(sed_ok, seds,
                                                      0.0)), 0.0)
    okf = sed_ok.astype(cmd.dtype)

    # Data side (per star, offset-scaled): w = mask / (err * Xb)^2.
    # Missing bands carry NaN in `phot`, so every data operand is
    # explicitly zeroed under the mask (NaN * 0 = NaN otherwise).
    m = phot_mask.astype(cmd.dtype)
    phot_t = jnp.where(phot_mask, phot, 0.0) * Xb
    safe_err = jnp.where(phot_mask, err, 1.0) * Xb
    w = m / safe_err ** 2                                   # (Nobj, F)
    dw = phot_t * w
    d2w = phot_t ** 2 * w
    lnvar = jnp.log(2.0 * jnp.pi * safe_err ** 2) * m

    # Masked chi-square of every (smf, EEP) model against every star,
    # decomposed into (Nsmf*Neep, F) @ (F, Nobj) contractions:
    #   chi2[p, o] = sum_f ok_pf w_of (d_of - m_pf)^2
    #             = (m^2 ok) @ w' - 2 (m ok) @ dw' + ok @ d2w'
    # — no (Npts, Nobj, F) residual tensor is ever materialized.
    # HIGHEST precision: the terms are O(SNR^2) and cancel to O(1);
    # bf16 operand noise would scramble the EEP logsumexp.
    # f32 SAFETY ENVELOPE: even at HIGHEST precision the cancellation
    # leaves an absolute chi2 error ~ eps_f32 * SNR^2 * F on f32
    # backends (TPU).  Measured against the explicit f64 residual
    # (tests/test_applications.py::test_cluster_chi2_f32_envelope,
    # F=8): ~0.05 at SNR=100, ~0.4 at SNR=300, ~40 at SNR=3000.
    # Survey photometry (SNR <~ 100-300) is safe — the error is well
    # below the per-star chi2 information scale; for SNR >~ 1000 the
    # EEP logsumexp weights shift O(1) — run the f64 CPU path there.
    hi = jax.lax.Precision.HIGHEST
    mm = (cmd * cmd * okf).reshape(-1, n_f)
    mo = (cmd * okf).reshape(-1, n_f)
    ok2 = okf.reshape(-1, n_f)
    chi2_cmd = (jnp.matmul(mm, w.T, precision=hi)
                - 2.0 * jnp.matmul(mo, dw.T, precision=hi)
                + jnp.matmul(ok2, d2w.T, precision=hi))
    lnorm_cmd = jnp.matmul(ok2, lnvar.T, precision=hi)

    # Parallax contribution at the shared cluster distance
    # (reference cluster.py:292-301); ivar is 0 where absent.
    chi2_p = (parallax - 1e3 / dist) ** 2 * parallax_ivar   # (Nobj,)
    lnorm_p = jnp.where(parallax_ivar > 0,
                        -jnp.log(parallax_ivar / (2.0 * jnp.pi)), 0.0)

    chi2 = chi2_cmd + chi2_p[None]
    if dim_prior:
        lnl = chi2_logpdf(chi2, phot_n[None])
    else:
        lnl = -0.5 * (chi2 + lnorm_cmd + lnorm_p[None])
    lnl = jnp.where(jnp.isfinite(lnl), lnl, -jnp.inf)

    # Mass-measure + smf-measure priors, then logsumexp over the whole
    # (smf, EEP) block at once (reference cluster.py:378-407).
    lnprior = jnp.where(valid, jnp.log(jnp.where(valid, grad_mini[None],
                                                 1.0))
                        + grad_smf_log[:, None], -jnp.inf)
    lnl = lnl + lnprior.reshape(-1)[:, None]
    lnl_in = logsumexp(lnl, axis=0)                         # (Nobj,)

    # Inlier/outlier mixture (reference cluster.py:410-414).
    ln_fin = jnp.log(cluster_prob * (1.0 - fout))
    ln_fout = jnp.log1p(-cluster_prob * (1.0 - fout))
    lnl_mix = jnp.logaddexp(lnl_in + ln_fin, lnl_outlier + ln_fout)
    return jnp.sum(lnl_mix), lnl_mix


def _prepare_cluster_data(phot, err, parallax, parallax_err, dim_prior):
    """Host-side, theta-independent data hygiene: masks, dof counts,
    and the outlier model (reference cluster.py:303-321)."""
    phot = np.asarray(phot, dtype=float)
    err = np.asarray(err, dtype=float)
    n_obj, n_bands = phot.shape
    phot_mask = np.isfinite(phot) & np.isfinite(err)
    phot_n = phot_mask.sum(axis=1).astype(float)
    if np.any(~phot_mask.all(axis=1) & (phot_n == 0)):
        raise ValueError("at least one object has no valid data")

    if (parallax is None) != (parallax_err is None):
        raise ValueError("provide both `parallax` and `parallax_err`")
    pmask = np.zeros(n_obj, bool)
    plx = np.zeros(n_obj)
    pivar = np.zeros(n_obj)
    if parallax is not None:
        parallax = np.asarray(parallax, float)
        parallax_err = np.asarray(parallax_err, float)
        pmask = np.isfinite(parallax) & np.isfinite(parallax_err)
        plx[pmask] = parallax[pmask]
        pivar[pmask] = 1.0 / parallax_err[pmask] ** 2
        phot_n = phot_n + pmask

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

    return (phot, err, phot_mask, phot_n, lnl_outlier, plx, pivar,
            n_bands)


def _smf_measures(smf_grid):
    smf_grid = np.asarray(smf_grid, dtype=float)
    grad_smf = (np.gradient(smf_grid) if len(smf_grid) > 1
                else np.array([1.0]))
    return tuple(float(s) for s in smf_grid), np.log(grad_smf)


def isochrone_loglike(theta, isochrone, phot, err, cluster_params="free",
                      offsets="fixed", corr_params="fixed",
                      mini_bound=0.08, eep_binary_max=480.0,
                      smf_grid=None, eep_grid=None,
                      parallax=None, parallax_err=None,
                      cluster_prob=0.95, dim_prior=True,
                      return_lnls=False):
    """Total log-likelihood of a co-eval cluster population.

    Parity: reference `brutus/cluster.py:23-419`; see that docstring
    for the `theta` packing rules (fixed entries are skipped).  One
    call is ONE jitted device program (`_cluster_core`); an external
    optimizer/sampler looping over `theta` re-dispatches the same
    compiled executable.
    """
    if isochrone is None:
        raise ValueError("`isochrone` must be provided")
    if phot is None or err is None:
        raise ValueError("`phot` and `err` must be provided")

    (phot, err, phot_mask, phot_n, lnl_outlier, plx, pivar,
     n_bands) = _prepare_cluster_data(phot, err, parallax, parallax_err,
                                      dim_prior)

    if smf_grid is None:
        smf_grid = DEFAULT_SMF_GRID
    smf_sig, grad_smf_log = _smf_measures(smf_grid)
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

    # Unpack theta (reference cluster.py:227-290).
    counter = 0
    cvals, counter = _read_params(theta, cluster_params, 6, counter)
    if offsets == "fixed":
        Xb = np.ones(n_bands)
        counter += n_bands
    else:
        Xb, counter = _read_params(theta, offsets, n_bands, counter)
    if corr_params == "fixed":
        corr = np.asarray(DEFAULT_CORR_PARAMS, float)
        counter += 4
    else:
        corr, counter = _read_params(theta, corr_params, 4, counter)

    xgrid, ygrid, nn_params = isochrone.tables
    total, lnl_mix = _cluster_core(
        xgrid, ygrid, nn_params, jnp.asarray(eep_grid),
        jnp.asarray(grad_smf_log), jnp.asarray(phot), jnp.asarray(err),
        jnp.asarray(phot_mask), jnp.asarray(phot_n),
        jnp.asarray(lnl_outlier), jnp.asarray(plx), jnp.asarray(pivar),
        jnp.asarray(cvals), jnp.asarray(Xb), jnp.asarray(corr),
        mini_bound, eep_binary_max, cluster_prob,
        idx=isochrone.iso_idx, smf_sig=smf_sig, dim_prior=dim_prior)
    if return_lnls:
        return float(total), np.asarray(lnl_mix)
    return float(total)


# ---------------------------------------------------------------------------
# TPU-native cluster fitting driver
# ---------------------------------------------------------------------------

# Uniform prior bounds for the free parameters sampled by
# `fit_cluster`; feh/loga default to the isochrone grid extent.
DEFAULT_BOUNDS = dict(feh=None, loga=None, av=(0.0, 6.0),
                      rv=(2.4, 4.2), dist=(100.0, 20000.0),
                      fout=(1e-4, 0.5), offsets=(0.8, 1.2),
                      dtdm=(-0.1, 0.3), drdm=(-0.3, 0.1),
                      msto_smooth=(5.0, 100.0), feh_scale=(-1.0, 2.0))

_CLUSTER_NAMES = ("feh", "loga", "av", "rv", "dist", "fout")
_CORR_NAMES = ("dtdm", "drdm", "msto_smooth", "feh_scale")


def fit_cluster(isochrone, phot, err, cluster_params="free",
                offsets="fixed", corr_params="fixed",
                mini_bound=0.08, eep_binary_max=480.0,
                smf_grid=None, eep_grid=None,
                parallax=None, parallax_err=None,
                cluster_prob=0.95, dim_prior=True, bounds=None,
                n_walkers=32, n_steps=1000, n_burn=500, stretch_a=2.0,
                seed=0, max_samples=4000, return_chain=False,
                evidence=False, n_temps=16, beta_power=5.0,
                verbose=False):
    """Fit the cluster parameters with the TPU-native ensemble sampler.

    The reference drives `isochrone_loglike` with an external nested
    sampler (dynesty, demo "Overview 5"); this is the self-contained
    replacement, the cluster-side sibling of `los.fit_clouds`: free
    parameters get independent uniform priors over `bounds` and the
    affine-invariant stretch-move sampler (`brutus_tpu.sampling`) runs
    fully jitted — every walker's `(smf, EEP)` block evaluates as one
    batched device program per step.

    Parameters
    ----------
    cluster_params, offsets, corr_params :
        Same fixed/free specs as `isochrone_loglike` (non-`None`
        entries are fixed at the given value); the FREE entries are
        the sampled dimensions, in `theta` order.
    bounds : dict, optional
        Per-parameter `(lo, hi)` uniform-prior bounds overriding
        `DEFAULT_BOUNDS` (keys: `feh, loga, av, rv, dist, fout,
        offsets, dtdm, drdm, msto_smooth, feh_scale`).  `feh`/`loga`
        default to the isochrone grid extent.
    evidence : bool
        Also estimate `logz +/- logz_err` (stepping-stone over an
        `n_temps`-rung power-posterior ladder; see `los.fit_clouds` —
        the reference gets this from dynesty, demo "Overview 5").
        Evidences are comparable across runs sharing the SAME bounds
        (the uniform prior volume is part of Z).

    Returns
    -------
    dict with `samples (n_kept, ndim_free)`, `logl`, `map_theta`,
    `names` (the free-parameter labels), `acceptance`, `tau`, `ess`,
    `rhat` (see `brutus_tpu.sampling.chain_diagnostics`), and the
    `theta_full` MAP vector including fixed entries; with
    `return_chain=True` also the full post-burn `chain
    (n_steps - n_burn, n_walkers, ndim_free)` and `chain_logl`.
    """
    from .sampling import ensemble_sample, chain_diagnostics

    if cluster_params == "fixed":
        # Unlike offsets/corr_params, the 6 cluster parameters have no
        # meaningful defaults — "fixed" would leave them NaN and every
        # likelihood -inf.  Pass explicit values to fix them instead.
        raise ValueError(
            'cluster_params="fixed" is not valid for fit_cluster: the '
            "cluster parameters have no defaults.  Pass a 6-tuple of "
            "values (None entries stay free) to fix them.")

    (phot_c, err_c, phot_mask, phot_n, lnl_outlier, plx, pivar,
     n_bands) = _prepare_cluster_data(phot, err, parallax, parallax_err,
                                      dim_prior)
    if smf_grid is None:
        smf_grid = DEFAULT_SMF_GRID
    smf_sig, grad_smf_log = _smf_measures(smf_grid)
    if eep_grid is None:
        eep_grid = np.linspace(202.0, 808.0, 2000)
    eep_grid = np.asarray(eep_grid, dtype=float)

    b = dict(DEFAULT_BOUNDS)
    b.update(bounds or {})
    if b["feh"] is None:
        g = np.asarray(isochrone.xgrid[0])
        b["feh"] = (float(g.min()), float(g.max()))
    if b["loga"] is None:
        g = np.asarray(isochrone.xgrid[2])
        b["loga"] = (float(g.min()), float(g.max()))

    # Assemble the free-parameter layout: defaults for fixed entries,
    # (lo, hi) rows for free ones, in the reference's theta order.
    fixed_c = np.array([np.nan] * 6)
    fixed_o = np.ones(n_bands)
    fixed_r = np.asarray(DEFAULT_CORR_PARAMS, float)
    names, los_, his_, targets = [], [], [], []

    def add_free(spec, n, base, group, labels):
        if spec == "fixed":
            return
        for i in range(n):
            v = None if spec == "free" else spec[i]
            if v is None:
                lab = labels[i]
                key = "offsets" if group == "o" else lab
                names.append(lab)
                los_.append(b[key][0])
                his_.append(b[key][1])
                targets.append((group, i))
            else:
                base[i] = v

    add_free(cluster_params, 6, fixed_c, "c", _CLUSTER_NAMES)
    add_free(offsets, n_bands, fixed_o, "o",
             [f"offset_{i}" for i in range(n_bands)])
    add_free(corr_params, 4, fixed_r, "r", _CORR_NAMES)
    ndim = len(names)
    if ndim == 0:
        raise ValueError("no free parameters to fit")
    lo = jnp.asarray(np.array(los_), jnp.float32)
    hi = jnp.asarray(np.array(his_), jnp.float32)
    c_idx = [k for k, (g, i) in enumerate(targets) if g == "c"]
    c_pos = [i for (g, i) in targets if g == "c"]
    o_idx = [k for k, (g, i) in enumerate(targets) if g == "o"]
    o_pos = [i for (g, i) in targets if g == "o"]
    r_idx = [k for k, (g, i) in enumerate(targets) if g == "r"]
    r_pos = [i for (g, i) in targets if g == "r"]

    xgrid, ygrid, nn_params = isochrone.tables
    data_args = (jnp.asarray(eep_grid), jnp.asarray(grad_smf_log),
                 jnp.asarray(phot_c), jnp.asarray(err_c),
                 jnp.asarray(phot_mask), jnp.asarray(phot_n),
                 jnp.asarray(lnl_outlier), jnp.asarray(plx),
                 jnp.asarray(pivar))
    core = partial(_cluster_core, idx=isochrone.iso_idx,
                   smf_sig=smf_sig, dim_prior=dim_prior)

    def logpost(u, xg0, xg1, xg2, xg3, yg, *rest):
        nn = rest[:len(nn_params)]
        dargs = rest[len(nn_params):]
        inb = jnp.all((u > 0.0) & (u < 1.0), axis=-1)
        x = lo + jnp.clip(u, 0.0, 1.0) * (hi - lo)        # (W, ndim)
        W = u.shape[0]
        cvals = jnp.broadcast_to(jnp.asarray(fixed_c, jnp.float32),
                                 (W, 6))
        Xb = jnp.broadcast_to(jnp.asarray(fixed_o, jnp.float32),
                              (W, n_bands))
        corr = jnp.broadcast_to(jnp.asarray(fixed_r, jnp.float32),
                                (W, 4))
        if c_idx:
            cvals = cvals.at[:, jnp.asarray(c_pos)].set(
                x[:, jnp.asarray(c_idx)])
        if o_idx:
            Xb = Xb.at[:, jnp.asarray(o_pos)].set(
                x[:, jnp.asarray(o_idx)])
        if r_idx:
            corr = corr.at[:, jnp.asarray(r_pos)].set(
                x[:, jnp.asarray(r_idx)])

        def one(cv, xb, cr):
            total, _ = core((xg0, xg1, xg2, xg3), yg, nn, *dargs,
                            cv, xb, cr, mini_bound, eep_binary_max,
                            cluster_prob)
            return total

        ll = jax.vmap(one)(cvals, Xb, corr)
        return jnp.where(inb & jnp.isfinite(ll), ll, -jnp.inf)

    ev = None
    if evidence:
        from .sampling import (tempered_ensemble_sample,
                               default_beta_ladder, evidence_from_ladder)
        betas = default_beta_ladder(n_temps, power=beta_power)
        trun = tempered_ensemble_sample(
            logpost, ndim, betas, n_walkers=n_walkers, n_steps=n_steps,
            stretch_a=stretch_a, seed=seed,
            logl_args=(*xgrid, ygrid, *nn_params, *data_args))
        ev = evidence_from_ladder(betas,
                                  np.asarray(trun["logl"])[:, n_burn:])
        run = dict(chain=trun["chain"][-1], logp=trun["logl"][-1],
                   accept=trun["accept"][-1])
    else:
        run = ensemble_sample(
            logpost, ndim, n_walkers=n_walkers, n_steps=n_steps,
            stretch_a=stretch_a, seed=seed,
            logpost_args=(*xgrid, ygrid, *nn_params, *data_args))
    chain_u = np.asarray(run["chain"][n_burn:])
    chain_lp = np.asarray(run["logp"][n_burn:])
    diag = chain_diagnostics(chain_u, accept=run["accept"][n_burn:])

    lo_np, hi_np = np.asarray(lo), np.asarray(hi)
    kept_u = chain_u.reshape(-1, ndim)
    kept_lp = chain_lp.reshape(-1)
    finite = np.isfinite(kept_lp)
    kept_u, kept_lp = kept_u[finite], kept_lp[finite]
    stride = max(1, len(kept_u) // max_samples) if max_samples else 1
    samples = lo_np + kept_u[::stride] * (hi_np - lo_np)
    logl = kept_lp[::stride]
    map_x = samples[np.argmax(logl)]

    theta_full = dict(cluster=fixed_c.copy(), offsets=fixed_o.copy(),
                      corr=fixed_r.copy())
    for k, (g, i) in enumerate(targets):
        {"c": theta_full["cluster"], "o": theta_full["offsets"],
         "r": theta_full["corr"]}[g][i] = map_x[k]
    out = dict(samples=samples, logl=logl, names=list(names),
               map_theta=map_x, theta_full=theta_full,
               acceptance=diag["acceptance"], tau=diag["tau"],
               ess=diag["ess"], rhat=diag["rhat"])
    if ev is not None:
        out["logz"] = ev["logz"]
        out["logz_err"] = ev["logz_err"]
        out["logz_ti"] = ev["logz_ti"]
    if return_chain:
        out["chain"] = lo_np + chain_u * (hi_np - lo_np)
        out["chain_logl"] = chain_lp
    if verbose:
        import sys
        sys.stderr.write(
            f"fit_cluster: acceptance={out['acceptance']:.2f} "
            f"max rhat={out['rhat'].max():.3f}\n")
    return out


__all__ = ["isochrone_loglike", "fit_cluster", "DEFAULT_SMF_GRID",
           "DEFAULT_BOUNDS"]
