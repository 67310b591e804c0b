"""
Line-of-sight (LOS) 3-D extinction modeling.

Parity: reference `brutus/los.py`: an N-cloud step model of cumulative
reddening along a sightline, fit to the per-star `(distance, Av)`
posterior draws produced by `BruteForce.fit`.  The prior transform maps
the nested-sampling unit cube to parameters; the likelihood
kernel-weights each star's posterior draws within each distance
segment, marginalizes with a logsumexp, and mixes in a uniform outlier
model.

The likelihood core is a jitted JAX program over the dense
`(clouds, stars, draws)` block, so an external sampler (e.g. dynesty)
driving tens of thousands of likelihood calls stays fast; the prior
transform stays in numpy (it runs on the sampler's host thread).
"""

import math
from functools import partial

import numpy as np
from scipy.stats import truncnorm
import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp


def LOS_clouds_priortransform(u, rlims=(0.0, 6.0), dlims=(4.0, 19.0),
                              pb_params=(-3.0, 0.7, -np.inf, 0.0),
                              s_params=(-3.0, 0.3, -np.inf, 0.0),
                              dust_template=False, nlims=(0.2, 2.0)):
    """Unit-cube -> LOS parameters for nested sampling.

    Parity: reference `brutus/los.py:24-116`: truncated-log-normal
    outlier fraction and smoothings, sorted uniform cloud distances,
    uniform cloud reddenings (or template rescalings).
    """
    u = np.asarray(u)
    x = np.array(u)

    pb_mean, pb_std, pb_low, pb_high = pb_params
    a = (pb_low - pb_mean) / pb_std
    b = (pb_high - pb_mean) / pb_std
    x[0] = np.exp(truncnorm.ppf(u[0], a, b, loc=pb_mean, scale=pb_std))

    s_mean, s_std, s_low, s_high = s_params
    a = (s_low - s_mean) / s_std
    b = (s_high - s_mean) / s_std
    x[1] = np.exp(truncnorm.ppf(u[1], a, b, loc=s_mean, scale=s_std))
    x[2] = np.exp(truncnorm.ppf(u[2], a, b, loc=s_mean, scale=s_std))

    ns = 2
    # sorted cloud distances
    x[ns + 2::2] = np.sort(u[ns + 2::2]) * (dlims[1] - dlims[0]) + dlims[0]
    # foreground reddening
    x[ns + 1] = u[ns + 1] * (rlims[1] - rlims[0]) + rlims[0]
    # cloud reddenings, tied to the distance ordering
    dsort = np.argsort(u[ns + 2::2])
    if dust_template:
        x[ns + 3::2] = (u[ns + 3::2][dsort] * (nlims[1] - nlims[0])
                        + nlims[0])
    else:
        x[ns + 3::2] = (u[ns + 3::2][dsort] * (rlims[1] - rlims[0])
                        + rlims[0])
    return x


def kernel_tophat(reds, kmean, kwidth):
    """Top-hat log-kernel (reference `brutus/los.py:251-282`)."""
    inb = (reds >= kmean - kwidth) & (reds < kmean + kwidth)
    return jnp.where(inb, -jnp.log(2.0 * kwidth), -jnp.inf)


def kernel_gauss(reds, kmean, kstd):
    """Gaussian log-kernel (reference `brutus/los.py:285-312`)."""
    return (-0.5 * ((reds - kmean) / kstd) ** 2
            - jnp.log(jnp.sqrt(2.0 * jnp.pi) * kstd))


def kernel_lorentz(reds, kmean, khwhm):
    """Lorentzian log-kernel (reference `brutus/los.py:315-342`)."""
    return (-jnp.log1p(((reds - kmean) / khwhm) ** 2)
            - jnp.log(jnp.pi * khwhm))


_KERNELS = {"tophat": kernel_tophat, "gauss": kernel_gauss,
            "lorentz": kernel_lorentz}


@partial(jax.jit, static_argnames=("kernel", "rlims",
                                   "additive_foreground"))
def _los_loglike_core(reds, dists, pb, rsmooth0, rsmooth, ds, rs,
                      template_reds=None, kernel="gauss",
                      rlims=(0.0, 6.0), additive_foreground=False):
    """Dense (clouds, stars, draws) likelihood block.

    reds : (C+1,) foreground + per-cloud reddenings.
    dists : (C,) cloud distances.  ds, rs : (Nobj, Ndraw).
    """
    kern = _KERNELS[kernel]
    area = rlims[1] - rlims[0]

    # Segment edges: [0, d_1, ..., d_C, inf).
    xlo = jnp.concatenate([jnp.zeros(1), dists])
    xhi = jnp.concatenate([dists, jnp.full(1, 1e10)])

    # Per-segment kernel means (C+1, Nobj, Ndraw-broadcast).
    means = reds[:, None, None] * jnp.ones_like(rs)[None]
    if template_reds is not None:
        means = means.at[1:].mul(template_reds[None, :, None])
    if additive_foreground:
        means = means.at[1:].add(means[0])
    sig = jnp.concatenate([jnp.full(1, rsmooth0),
                           jnp.full(reds.shape[0] - 1, rsmooth)])

    inseg = (ds[None] >= xlo[:, None, None]) & (ds[None] < xhi[:, None, None])
    logw = kern(rs[None], means, sig[:, None, None])
    logw = jnp.where(inseg, logw, -jnp.inf)

    # Marginalize over clouds and draws per star.
    n_draw = rs.shape[1]
    logls = logsumexp(logw, axis=(0, 2)) - jnp.log(n_draw)
    # Uniform outlier mixture.
    logls = jnp.logaddexp(jnp.log1p(-pb) + logls,
                          jnp.log(pb) - jnp.log(area))
    return jnp.sum(logls)


def LOS_clouds_loglike_samples(theta, dsamps, rsamps, kernel="gauss",
                               rlims=(0.0, 6.0), template_reds=None,
                               Ndraws=25, additive_foreground=False,
                               monotonic=True):
    """Log-likelihood of the cumulative-reddening cloud model.

    Parity: reference `brutus/los.py:119-248` (same parameterization,
    kernels, outlier mixture, and monotonicity rejection).
    """
    if kernel not in _KERNELS and not callable(kernel):
        raise ValueError(f"invalid kernel {kernel!r}")

    theta = np.asarray(theta, dtype=float)
    pb, s0, s = theta[0], theta[1], theta[2]
    reds = np.atleast_1d(theta[3::2])
    dists = np.atleast_1d(theta[4::2])

    if not np.all(np.sort(dists) == dists):
        raise ValueError("Distances must be monotonically increasing.")
    if monotonic and not np.all(np.sort(reds) == reds):
        return -np.inf

    area = rlims[1] - rlims[0]
    ds = jnp.asarray(dsamps[:, :Ndraws])
    rs = jnp.asarray(rsamps[:, :Ndraws])

    if callable(kernel) and not isinstance(kernel, str):
        # Custom kernel: un-jitted path, `kernel(reds, (mean, sigma))`.
        xlo = np.concatenate([[0.0], dists])
        xhi = np.concatenate([dists, [1e10]])
        sig = np.concatenate([[s0 * area],
                              np.full(len(reds) - 1, s * area)])
        means = np.array(reds, dtype=float)
        rs_np, ds_np = np.asarray(rs), np.asarray(ds)
        logw = []
        for c in range(len(reds)):
            mean_c = means[c] * (np.ones_like(rs_np) if template_reds is None
                                 or c == 0 else template_reds[:, None])
            if additive_foreground and c > 0:
                mean_c = mean_c + means[0]
            lw = np.asarray(kernel(rs_np, (mean_c, sig[c])))
            lw = np.where((ds_np >= xlo[c]) & (ds_np < xhi[c]), lw, -np.inf)
            logw.append(lw)
        from scipy.special import logsumexp as np_lse
        logls = np_lse(np.array(logw), axis=(0, 2)) - np.log(rs_np.shape[1])
        logls = np.logaddexp(np.log1p(-pb) + logls,
                             np.log(pb) - np.log(area))
        return float(np.sum(logls))

    out = _los_loglike_core(
        jnp.asarray(reds), jnp.asarray(dists),
        jnp.asarray(pb), jnp.asarray(s0 * area), jnp.asarray(s * area),
        ds, rs,
        template_reds=(None if template_reds is None
                       else jnp.asarray(template_reds)),
        kernel=kernel, rlims=tuple(rlims),
        additive_foreground=additive_foreground)
    return float(out)


# ---------------------------------------------------------------------------
# TPU-native LOS fitting driver
# ---------------------------------------------------------------------------

def _prior_transform_jax(u, rlims, dlims, pb_params, s_params,
                         dust_template, nlims):
    """JAX re-implementation of `LOS_clouds_priortransform` (same math;
    truncated-log-normal ppf via ndtri) for use inside the jitted
    sampler.  `u` may carry leading batch dims."""
    from jax.scipy.special import ndtri
    from jax.scipy.stats import norm

    def trunc_lognorm_ppf(q, mean, std, lo, hi):
        a = norm.cdf((lo - mean) / std)
        b = norm.cdf((hi - mean) / std)
        return jnp.exp(mean + std * ndtri(a + q * (b - a)))

    pb = trunc_lognorm_ppf(u[..., 0], *pb_params)
    s0 = trunc_lognorm_ppf(u[..., 1], *s_params)
    s = trunc_lognorm_ppf(u[..., 2], *s_params)
    fg = u[..., 3] * (rlims[1] - rlims[0]) + rlims[0]
    ud = u[..., 4::2]
    ur = u[..., 5::2]
    order = jnp.argsort(ud, axis=-1)
    dists = (jnp.take_along_axis(ud, order, axis=-1)
             * (dlims[1] - dlims[0]) + dlims[0])
    ur_sorted = jnp.take_along_axis(ur, order, axis=-1)
    lo, hi = nlims if dust_template else rlims
    creds = ur_sorted * (hi - lo) + lo
    return pb, s0, s, fg, dists, creds


def _theta_from_u(kept_u, rlims, dlims, pbp, ssp, dust_template, nlims):
    """Bulk unit-cube -> theta transform (device, batched): the same
    math as `LOS_clouds_priortransform`, applied to a whole chain at
    once, returning the reference's theta layout
    `[pb, s0, s, fg_red, d1, r1, d2, r2, ...]`."""
    pb, s0, s, fg, dists, creds = _prior_transform_jax(
        jnp.clip(jnp.asarray(kept_u), 1e-6, 1 - 1e-6),
        rlims, dlims, pbp, ssp, dust_template, nlims)
    dr = jnp.stack([dists, creds], axis=-1).reshape(*dists.shape[:-1], -1)
    return np.asarray(jnp.concatenate(
        [jnp.stack([pb, s0, s, fg], axis=-1), dr], axis=-1))


def fit_clouds(dsamps, rsamps, n_clouds, kernel="gauss",
               rlims=(0.0, 6.0), dlims=(4.0, 19.0),
               pb_params=(-3.0, 0.7, -np.inf, 0.0),
               s_params=(-3.0, 0.3, -np.inf, 0.0),
               template_reds=None, additive_foreground=False,
               monotonic=True, Ndraws=25,
               n_walkers=64, n_steps=1500, n_burn=750, stretch_a=2.0,
               seed=0, max_samples=4000, return_chain=False,
               evidence=False, n_temps=16, beta_power=5.0):
    """Fit the N-cloud LOS extinction model with a TPU-native sampler.

    The reference drives `LOS_clouds_loglike_samples` with an external
    nested sampler (dynesty, `demos/Overview 4`); this is a
    self-contained replacement built on the shared ensemble sampler
    (`brutus_tpu.sampling`): all walkers' likelihoods evaluate as one
    dense `(walkers, clouds, stars, draws)` block per step, and the
    whole chain is a `lax.scan`.  Sampling happens in the prior unit
    cube (the prior transform maps to parameters, so the uniform cube
    measure reproduces the reference's priors exactly); out-of-cube
    proposals and non-monotonic reddening profiles are rejected,
    mirroring the reference's rejection at `los.py:200-203`.

    Parameters
    ----------
    dsamps, rsamps : (Nobj, >=Ndraws) per-star posterior draws of
        distance modulus and reddening (from `BruteForce.fit`).
    n_clouds : number of clouds.
    max_samples : int
        `samples` is thinned (evenly) to at most this many rows; pass
        `0`/`None` for no thinning, or use `return_chain=True` for the
        full walker-resolved chain.
    return_chain : bool
        Also return `chain (n_steps - n_burn, n_walkers, ndim)` — the
        full unthinned post-burn chain in theta space — plus
        `chain_logl`.
    evidence : bool
        Also estimate the log-evidence `logz +/- logz_err`
        (stepping-stone over an `n_temps`-rung power-posterior ladder,
        `sampling.tempered_ensemble_sample`; ~`n_temps`x the
        likelihood work).  This is the model-selection quantity the
        reference's workflow gets from dynesty's nested sampling
        (`/root/reference/brutus/los.py:27-33`, demo "Overview 4"):
        compare `logz` across `n_clouds` to choose the cloud count.
        The posterior `samples` then come from the ladder's beta=1
        rung (different RNG stream than `evidence=False`).
    Other knobs mirror `LOS_clouds_priortransform` /
    `LOS_clouds_loglike_samples`.

    Returns
    -------
    dict with `samples (n_kept, ndim)` in the reference's theta layout
    `[pb, s0, s, fg_red, d1, r1, d2, r2, ...]`, `logl (n_kept,)`,
    `map_theta`, and convergence diagnostics: `acceptance` (mean
    rate), per-parameter `tau` (integrated autocorrelation time),
    `ess` (effective sample size), and split-chain `rhat`
    (`brutus_tpu.sampling.chain_diagnostics`; rhat > ~1.05 means the
    chain has not mixed — raise `n_steps`).
    """
    from .sampling import ensemble_sample, chain_diagnostics

    if kernel not in _KERNELS:
        raise ValueError(f"invalid kernel {kernel!r}")
    area = rlims[1] - rlims[0]
    ndim = 4 + 2 * n_clouds
    dust_template = template_reds is not None
    nlims = (0.2, 2.0)

    ds = jnp.asarray(dsamps[:, :Ndraws], jnp.float32)
    rs = jnp.asarray(rsamps[:, :Ndraws], jnp.float32)
    treds = (jnp.asarray(template_reds, jnp.float32)
             if dust_template else None)
    pbp = tuple(float(x) for x in pb_params)
    ssp = tuple(float(x) for x in s_params)

    def logpost(u, ds, rs):
        """(W, ndim) unit-cube positions -> (W,) log-posteriors."""
        inb = jnp.all((u > 0.0) & (u < 1.0), axis=-1)
        uc = jnp.clip(u, 1e-6, 1.0 - 1e-6)
        pb, s0, s, fg, dists, creds = _prior_transform_jax(
            uc, rlims, dlims, pbp, ssp, dust_template, nlims)
        reds = jnp.concatenate([fg[:, None], creds], axis=-1)

        def one(reds_w, dists_w, pb_w, s0_w, s_w):
            return _los_loglike_core(
                reds_w, dists_w, pb_w, s0_w * area, s_w * area, ds, rs,
                template_reds=treds, kernel=kernel, rlims=tuple(rlims),
                additive_foreground=additive_foreground)

        ll = jax.vmap(one)(reds, dists, pb, s0, s)
        if monotonic:
            # Reference rejection of non-monotonic profiles
            # (los.py:200-203); pass monotonic=False in template mode.
            mono = jnp.all(jnp.diff(reds, axis=-1) >= 0.0, axis=-1)
            ll = jnp.where(mono, ll, -jnp.inf)
        return jnp.where(inb, ll, -jnp.inf)

    ev = None
    if evidence:
        from .sampling import (tempered_ensemble_sample,
                               default_beta_ladder, evidence_from_ladder)
        betas = default_beta_ladder(n_temps, power=beta_power)
        trun = tempered_ensemble_sample(
            logpost, ndim, betas, n_walkers=n_walkers, n_steps=n_steps,
            stretch_a=stretch_a, seed=seed, logl_args=(ds, rs))
        ev = evidence_from_ladder(betas,
                                  np.asarray(trun["logl"])[:, n_burn:])
        # The beta=1 rung IS an ordinary posterior chain: reuse it.
        run = dict(chain=trun["chain"][-1], logp=trun["logl"][-1],
                   accept=trun["accept"][-1])
    else:
        run = ensemble_sample(logpost, ndim, n_walkers=n_walkers,
                              n_steps=n_steps, stretch_a=stretch_a,
                              seed=seed, logpost_args=(ds, rs))
    chain_u = np.asarray(run["chain"][n_burn:])
    chain_lp = np.asarray(run["logp"][n_burn:])
    diag = chain_diagnostics(chain_u, accept=run["accept"][n_burn:])

    kept_u = chain_u.reshape(-1, ndim)
    kept_lp = chain_lp.reshape(-1)
    finite = np.isfinite(kept_lp)
    kept_u, kept_lp = kept_u[finite], kept_lp[finite]
    stride = (max(1, len(kept_u) // max_samples) if max_samples
              else 1)
    thetas = _theta_from_u(kept_u[::stride], rlims, dlims, pbp, ssp,
                           dust_template, nlims)
    kept_lp = kept_lp[::stride]
    out = dict(samples=thetas, logl=kept_lp,
               map_theta=thetas[np.argmax(kept_lp)],
               acceptance=diag["acceptance"], tau=diag["tau"],
               ess=diag["ess"], rhat=diag["rhat"])
    if ev is not None:
        out["logz"] = ev["logz"]
        out["logz_err"] = ev["logz_err"]
        out["logz_ti"] = ev["logz_ti"]
    if return_chain:
        out["chain"] = _theta_from_u(chain_u, rlims, dlims, pbp, ssp,
                                     dust_template, nlims)
        out["chain_logl"] = chain_lp
    return out


__all__ = ["LOS_clouds_priortransform", "LOS_clouds_loglike_samples",
           "fit_clouds",
           "kernel_tophat", "kernel_gauss", "kernel_lorentz"]
