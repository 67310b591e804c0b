"""
Prior probability functions (all JAX, device-side).

Parity: reference `brutus/pdf.py:30-840` — Kroupa IMF, PS1 r-band
luminosity function, parallax priors (direct and in scale space), the
3-component Galactic model (thin disk + thick disk + halo with
metallicity and age mixtures), and the 3-D dust prior.

Every function is elementwise over its leading dimensions so the same
code serves the per-model MLE pass `(Nsel,)` and the Monte-Carlo
integration pass `(Nmc, Nsel)` of the posterior stage, vmapped over
stars.
"""

import math
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from .config import GalPriorConfig, DustPriorConfig
from .coords import galactic_to_cylindrical
from .utils import truncnorm_logpdf


# ---------------------------------------------------------------------------
# Grid priors (parity: reference brutus/pdf.py:38-141)
# ---------------------------------------------------------------------------

def imf_lnprior(mgrid, alpha_low=1.3, alpha_high=2.3, mass_break=0.5,
                mgrid2=None):
    """Kroupa-like broken-power-law IMF log-prior over initial mass,
    optionally including an unresolved binary secondary.

    Parity: reference `brutus/pdf.py:38-108`.
    """
    def single(m):
        m = jnp.asarray(m)
        low = (-alpha_low * jnp.log(jnp.where(m > 0, m, 1.0)))
        high = (-alpha_high * jnp.log(jnp.where(m > 0, m, 1.0))
                + (alpha_high - alpha_low) * math.log(mass_break))
        lnp = jnp.where(m > mass_break, high,
                        jnp.where(m > 0.08, low, -jnp.inf))
        return lnp

    lnprior = single(mgrid)
    norm_low = mass_break ** (1.0 - alpha_low) / (alpha_high - 1.0)
    norm_high = (0.08 ** (1.0 - alpha_low) / (alpha_low - 1.0)
                 - mass_break ** (1.0 - alpha_low) / (alpha_low - 1.0))
    norm = norm_low + norm_high
    if mgrid2 is not None:
        lnprior = lnprior + single(mgrid2)
        norm = norm ** 2           # independent primary x secondary
    return lnprior - math.log(norm)


_PS1_TABLE = None


def _ps1_table():
    global _PS1_TABLE
    if _PS1_TABLE is None:
        path = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                            "data", "PSMrLF_lnprior.dat")
        _PS1_TABLE = np.loadtxt(path).T
    return _PS1_TABLE


def ps1_MrLF_lnprior(Mr):
    """PanSTARRS r-band luminosity-function log-prior over absolute M_r.

    Parity: reference `brutus/pdf.py:111-141`; interpolates the same
    published table (data table credited to Green et al.), with linear
    extrapolation at the edges.
    """
    grid_Mr, grid_lnp = _ps1_table()
    Mr = jnp.asarray(Mr)
    lnp = jnp.interp(Mr, jnp.asarray(grid_Mr), jnp.asarray(grid_lnp))
    # linear extrapolation beyond the table (scipy interp1d parity)
    slope_lo = (grid_lnp[1] - grid_lnp[0]) / (grid_Mr[1] - grid_Mr[0])
    slope_hi = (grid_lnp[-1] - grid_lnp[-2]) / (grid_Mr[-1] - grid_Mr[-2])
    lnp = jnp.where(Mr < grid_Mr[0],
                    grid_lnp[0] + slope_lo * (Mr - grid_Mr[0]), lnp)
    lnp = jnp.where(Mr > grid_Mr[-1],
                    grid_lnp[-1] + slope_hi * (Mr - grid_Mr[-1]), lnp)
    return lnp


# ---------------------------------------------------------------------------
# Parallax priors (parity: reference brutus/pdf.py:144-260)
# ---------------------------------------------------------------------------

def parallax_lnprior(parallaxes, p_meas, p_err):
    """Gaussian parallax log-prior; uniform when the measurement is
    missing (NaN).  Parity: reference `brutus/pdf.py:144-175`."""
    have = jnp.isfinite(p_meas) & jnp.isfinite(p_err)
    err = jnp.where(have, p_err, 1.0)
    chi2 = (parallaxes - jnp.where(have, p_meas, 0.0)) ** 2 / err ** 2
    lnorm = jnp.log(2.0 * jnp.pi * err ** 2)
    return jnp.where(have, -0.5 * (chi2 + lnorm),
                     jnp.zeros_like(parallaxes))


def parallax_to_scale(p_meas, p_err, snr_lim=4.0):
    """Gaussian approximation of the parallax in scale space `s = p**2`.

    Parity: reference `brutus/pdf.py:225-260`: `s_mean = p^2 + sig^2`,
    `s_std = sqrt(2 sig^4 + 4 p^2 sig^2)`, gated on SNR > `snr_lim`.
    """
    ok = jnp.isfinite(p_meas) & jnp.isfinite(p_err) & \
        (p_meas / p_err > snr_lim)
    pm = jnp.maximum(p_meas, 0.0)
    s_mean = jnp.where(ok, pm ** 2 + p_err ** 2, 1e-20)
    s_std = jnp.where(ok, jnp.sqrt(2 * p_err ** 4 + 4 * pm ** 2 * p_err ** 2),
                      1e20)
    return s_mean, s_std


def scale_parallax_lnprior(scales, scale_errs, p_meas, p_err, snr_lim=4.0):
    """Parallax prior applied to flux-scale factors `s ~ p**2`.

    Parity: reference `brutus/pdf.py:178-222` (uniform below the SNR
    gate or for missing measurements).
    """
    ok = jnp.isfinite(p_meas) & jnp.isfinite(p_err) & \
        (jnp.where(jnp.isfinite(p_err) & (p_err > 0), p_meas / p_err, -jnp.inf)
         > snr_lim)
    s_mean, s_std = parallax_to_scale(jnp.where(ok, p_meas, 1.0),
                                      jnp.where(ok, p_err, 1.0),
                                      snr_lim=-jnp.inf)
    svar_tot = s_std ** 2 + scale_errs ** 2
    chi2 = (scales - s_mean) ** 2 / svar_tot
    lnorm = jnp.log(2.0 * jnp.pi * svar_tot)
    return jnp.where(ok, -0.5 * (chi2 + lnorm), jnp.zeros_like(scales))


# ---------------------------------------------------------------------------
# Galactic model (parity: reference brutus/pdf.py:263-749)
# ---------------------------------------------------------------------------

def logn_disk(R, Z, R_solar=8.2, Z_solar=0.025, R_scale=2.6, Z_scale=0.3,
              R_smooth=2.0):
    """Exponential disk log-number-density, normalized at the Sun.

    Parity: reference `brutus/pdf.py:263-307`.
    """
    Reff = jnp.sqrt(R ** 2 + R_smooth ** 2)
    rterm = (Reff - R_solar) / R_scale
    zterm = (jnp.abs(Z) - abs(Z_solar)) / Z_scale
    return -(rterm + zterm)


def logn_halo(R, Z, R_solar=8.2, Z_solar=0.025, R_smooth=2.0,
              eta=4.2, q_ctr=0.2, q_inf=0.8, r_q=6.0):
    """Oblate power-law halo log-number-density, normalized at the Sun.

    Parity: reference `brutus/pdf.py:310-377`.
    """
    r = jnp.sqrt(R ** 2 + Z ** 2)
    rp = jnp.sqrt(r ** 2 + r_q ** 2)
    q = q_inf - (q_inf - q_ctr) * jnp.exp(1.0 - rp / r_q)
    Reff = jnp.sqrt(R ** 2 + (Z / q) ** 2 + R_smooth ** 2)
    rp_solar = math.sqrt(R_solar ** 2 + Z_solar ** 2 + r_q ** 2)
    q_solar = q_inf - (q_inf - q_ctr) * math.exp(1.0 - rp_solar / r_q)
    Reff_solar = math.sqrt(R_solar ** 2 + (Z_solar / q_solar) ** 2
                           + R_smooth ** 2)
    return -eta * jnp.log(Reff / Reff_solar)


def logp_feh(feh, feh_mean=-0.2, feh_sigma=0.3):
    """Gaussian metallicity log-prior (reference `brutus/pdf.py:380-407`)."""
    chi2 = (feh_mean - feh) ** 2 / feh_sigma ** 2
    lnorm = math.log(2.0 * math.pi * feh_sigma ** 2)
    return -0.5 * (chi2 + lnorm)


def logp_age_from_feh(age, feh_mean=-0.2, max_age=13.8, min_age=0.0,
                      feh_age_ctr=-0.5, feh_age_scale=0.5,
                      nsigma_from_max_age=2.0, max_sigma=4.0, min_sigma=1.0):
    """Truncated-normal age log-prior whose mean tracks metallicity.

    Parity: reference `brutus/pdf.py:410-473`.
    """
    age_mean = ((max_age - min_age)
                / (1.0 + math.exp((feh_mean - feh_age_ctr) / feh_age_scale))
                + min_age)
    age_sigma = (max_age - age_mean) / nsigma_from_max_age
    age_sigma = min(max(age_sigma, min_sigma), max_sigma)
    a = (min_age - age_mean) / age_sigma
    b = (max_age - age_mean) / age_sigma
    return truncnorm_logpdf(age, a, b, loc=age_mean, scale=age_sigma)


@partial(jax.jit, static_argnames=("cfg", "return_components"))
def gal_lnprior(dists, coord, feh=None, loga=None,
                cfg: GalPriorConfig = GalPriorConfig(),
                return_components=False):
    """Log-prior from the 3-D Galactic model (thin + thick disk + halo),
    with optional metallicity/age mixture priors.

    Parity: reference `brutus/pdf.py:476-749` (`gal_lnprior`), with the
    astropy SkyCoord chain replaced by the closed-form affine transform
    in `brutus_tpu.coords`.

    Parameters
    ----------
    dists : (...,) distances in kpc.
    coord : (2,) galactic `(l, b)` in degrees.
    feh, loga : optional model labels broadcastable to `dists`
        (equivalent to the reference's `labels` structured array).
    """
    dists = jnp.asarray(dists)
    vol_factor = 2.0 * jnp.log(dists + 1e-300)
    R, Z = galactic_to_cylindrical(coord[0], coord[1], dists)

    logp_thin = logn_disk(R, Z, R_solar=cfg.R_solar, Z_solar=cfg.Z_solar,
                          R_scale=cfg.R_thin, Z_scale=cfg.Z_thin,
                          R_smooth=cfg.Rs_thin) + vol_factor
    logp_thick = (logn_disk(R, Z, R_solar=cfg.R_solar, Z_solar=cfg.Z_solar,
                            R_scale=cfg.R_thick, Z_scale=cfg.Z_thick,
                            R_smooth=cfg.Rs_thick)
                  + vol_factor + math.log(cfg.f_thick))
    logp_halo = (logn_halo(R, Z, R_solar=cfg.R_solar, Z_solar=cfg.Z_solar,
                           R_smooth=cfg.Rs_halo, eta=cfg.eta_halo,
                           q_ctr=cfg.q_halo_ctr, q_inf=cfg.q_halo_inf,
                           r_q=cfg.r_q_halo)
                 + vol_factor + math.log(cfg.f_halo))

    lnprior = logsumexp(jnp.stack([logp_thin, logp_thick, logp_halo]), axis=0)
    components = {"number_density": [logp_thin, logp_thick, logp_halo]}

    if feh is not None or loga is not None:
        lnp_thin = logp_thin - lnprior
        lnp_thick = logp_thick - lnprior
        lnp_halo = logp_halo - lnprior

    if feh is not None:
        feh = jnp.asarray(feh)
        feh_mix = logsumexp(jnp.stack([
            logp_feh(feh, cfg.feh_thin, cfg.feh_thin_sigma) + lnp_thin,
            logp_feh(feh, cfg.feh_thick, cfg.feh_thick_sigma) + lnp_thick,
            logp_feh(feh, cfg.feh_halo, cfg.feh_halo_sigma) + lnp_halo,
        ]), axis=0)
        lnprior = lnprior + feh_mix
        components["feh"] = feh_mix

    if loga is not None:
        age = 10 ** jnp.asarray(loga) / 1e9
        kw = dict(max_age=cfg.max_age, min_age=cfg.min_age,
                  feh_age_ctr=cfg.feh_age_ctr,
                  feh_age_scale=cfg.feh_age_scale,
                  nsigma_from_max_age=cfg.nsigma_from_max_age,
                  max_sigma=cfg.max_sigma, min_sigma=cfg.min_sigma)
        age_mix = logsumexp(jnp.stack([
            logp_age_from_feh(age, feh_mean=cfg.feh_thin, **kw) + lnp_thin,
            logp_age_from_feh(age, feh_mean=cfg.feh_thick, **kw) + lnp_thick,
            logp_age_from_feh(age, feh_mean=cfg.feh_halo, **kw) + lnp_halo,
        ]), axis=0)
        lnprior = lnprior + age_mix
        components["age"] = age_mix

    if return_components:
        return lnprior, components
    return lnprior


# ---------------------------------------------------------------------------
# 3-D dust prior (parity: reference brutus/pdf.py:752-840)
# ---------------------------------------------------------------------------

def dust_lnprior(dists, avs, av_dist, av_mean, av_std,
                 cfg: DustPriorConfig = DustPriorConfig()):
    """Gaussian log-prior on A(V) from a line-of-sight dust profile.

    Device-side half of the reference's `dust_lnprior`
    (`brutus/pdf.py:752-840`): the host queries the `Bayestar` map once
    per star (`brutus_tpu.dustmap`), and this function interpolates the
    profile onto the sampled distances.  Uncovered sightlines (NaN
    profiles) get a uniform prior, as in the reference.

    PERFORMANCE NOTE: `av_dist` must be a **uniform** ladder, and the
    interpolation is *gather-free*: each sample's two neighbor weights
    are expressed as the hat function `max(0, 1 - |u - l|)` against an
    iota over the ladder and contracted with the table in a fused
    register-resident reduction.  Table gathers per (star, model, draw)
    previously dominated the entire posterior stage (~110 ms of 152 ms
    per batch-16 on v5e); the dense hat-weight reduction is ~120x the
    FLOPs and ~30x faster.  `dustmap.uniform_profile` resamples raw
    Bayestar profiles (which are uniform in distance modulus, not
    distance) onto a uniform ladder host-side.  For arbitrary ladders
    use `dust_lnprior_interp`.

    Parameters
    ----------
    dists, avs : (...,) distance (kpc) / reddening draws.
    av_dist : (Ndist,) *uniform* profile distance ladder.
    av_mean, av_std : (Ndist,) LOS profile (NaN when uncovered).
    """
    covered = jnp.all(jnp.isfinite(av_mean) & jnp.isfinite(av_std))
    safe_mean = jnp.where(jnp.isfinite(av_mean), av_mean, 0.0)
    safe_std = jnp.where(jnp.isfinite(av_std), av_std, 1.0)
    n = av_dist.shape[0]
    d0 = av_dist[0]
    dx = av_dist[1] - av_dist[0]
    # Clamping u to the ladder reproduces np.interp's endpoint behavior;
    # interior points get exactly the two-point linear weights.
    u = jnp.clip((dists - d0) / dx, 0.0, n - 1.0)
    ladder = jnp.arange(n, dtype=u.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(u[..., None] - ladder))
    mean_i = jnp.sum(w * safe_mean, axis=-1)
    std_i = jnp.sum(w * safe_std, axis=-1)
    mean_d = cfg.scale * mean_i + cfg.offset
    err_d = cfg.smooth * cfg.scale * std_i
    err_d = jnp.sqrt(err_d ** 2 + cfg.scatter ** 2)
    chi2 = (avs - mean_d) ** 2 / err_d ** 2
    lnorm = jnp.log(2.0 * jnp.pi * err_d ** 2)
    return jnp.where(covered, -0.5 * (chi2 + lnorm), jnp.zeros_like(avs))


def dust_lnprior_interp(dists, avs, av_dist, av_mean, av_std,
                        cfg: DustPriorConfig = DustPriorConfig()):
    """Exact-`np.interp` variant for non-uniform distance ladders
    (slow on TPU; used for oracle parity and host-side work)."""
    covered = jnp.all(jnp.isfinite(av_mean) & jnp.isfinite(av_std))
    safe_mean = jnp.where(jnp.isfinite(av_mean), av_mean, 0.0)
    safe_std = jnp.where(jnp.isfinite(av_std), av_std, 1.0)
    mean_d = cfg.scale * jnp.interp(dists, av_dist, safe_mean) + cfg.offset
    err_d = cfg.smooth * cfg.scale * jnp.interp(dists, av_dist, safe_std)
    err_d = jnp.sqrt(err_d ** 2 + cfg.scatter ** 2)
    chi2 = (avs - mean_d) ** 2 / err_d ** 2
    lnorm = jnp.log(2.0 * jnp.pi * err_d ** 2)
    return jnp.where(covered, -0.5 * (chi2 + lnorm), jnp.zeros_like(avs))


__all__ = [
    "imf_lnprior", "ps1_MrLF_lnprior",
    "parallax_lnprior", "parallax_to_scale", "scale_parallax_lnprior",
    "logn_disk", "logn_halo", "logp_feh", "logp_age_from_feh",
    "gal_lnprior", "dust_lnprior", "dust_lnprior_interp",
]
