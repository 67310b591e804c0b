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


__all__ = ["LOS_clouds_priortransform", "LOS_clouds_loglike_samples",
           "kernel_tophat", "kernel_gauss", "kernel_lorentz"]
