"""Tests for coords, healpix, dustmap, and prior functions."""

import math

import numpy as np
import jax.numpy as jnp
from scipy.special import logsumexp as np_logsumexp
from scipy import stats

from brutus_tpu import coords, healpix, priors
from brutus_tpu.config import GalPriorConfig, DustPriorConfig
from brutus_tpu.dustmap import Bayestar, write_bayestar_file

rng = np.random.default_rng(3)


# --- coordinate transform -------------------------------------------------

def test_sun_position():
    x, y, z = coords.galactic_to_galactocentric(0.0, 0.0, 0.0)
    assert abs(float(z) - coords.Z_SUN) < 1e-9
    assert abs(float(y)) < 1e-12
    expect_x = -math.sqrt(coords.GALCEN_DISTANCE ** 2 - coords.Z_SUN ** 2)
    assert abs(float(x) - expect_x) < 1e-9


def test_galactic_center_maps_to_origin():
    # Sgr A* galactic coordinates (from its ICRS position).
    x, y, z = coords.galactic_to_galactocentric(359.94423568, -0.04616002,
                                                coords.GALCEN_DISTANCE)
    assert math.hypot(float(x), float(y)) < 0.02
    assert abs(float(z)) < 0.02


def test_plane_stays_planar():
    ls = np.linspace(0, 360, 25)
    R, Z = coords.galactic_to_cylindrical(ls, np.zeros_like(ls),
                                          np.full_like(ls, 3.0))
    assert np.all(np.abs(np.asarray(Z)) < 0.05)


def test_ngp_vertical():
    x, y, z = coords.galactic_to_galactocentric(123.0, 90.0, 2.0)
    assert abs(float(z) - (2.0 + coords.Z_SUN)) < 2e-3


# --- healpix --------------------------------------------------------------

def test_healpix_ranges_and_hierarchy():
    n = 2000
    l = rng.uniform(0, 360, n)
    b = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    for nside in [1, 2, 16, 64, 1024]:
        pix = healpix.lb2pix(nside, l, b)
        assert pix.min() >= 0 and pix.max() < 12 * nside * nside
    # nested hierarchy: parent = child >> 2
    for nside in [2, 16, 64, 512]:
        child = healpix.lb2pix(2 * nside, l, b)
        parent = healpix.lb2pix(nside, l, b)
        np.testing.assert_array_equal(child >> 2, parent)


def test_healpix_nside1_faces():
    # Face centers of the 12 base pixels (nested == base numbering).
    z_n, z_s = 2.0 / 3.0, -2.0 / 3.0
    lb = []
    for i in range(4):   # north faces 0-3
        lb.append((45.0 + 90.0 * i, np.degrees(np.arcsin(z_n))))
    for i in range(4):   # equatorial faces 4-7
        lb.append((90.0 * i, 0.0))
    for i in range(4):   # south faces 8-11
        lb.append((45.0 + 90.0 * i, np.degrees(np.arcsin(z_s))))
    l, b = np.array(lb).T
    pix = healpix.lb2pix(1, l, b)
    np.testing.assert_array_equal(pix, np.arange(12))


def test_healpix_invalid_latitude():
    assert healpix.lb2pix(16, np.array([10.0]), np.array([95.0]))[0] == -1


# --- dust map -------------------------------------------------------------

def test_bayestar_roundtrip(tmp_path):
    nside = 64
    l = np.array([30.0, 120.0, 250.0])
    b = np.array([5.0, -10.0, 40.0])
    pix = healpix.lb2pix(nside, l, b)
    dists = np.linspace(0.1, 10.0, 12)
    av_mean = rng.uniform(0, 2, size=(3, 12)).cumsum(axis=1) / 6
    av_std = rng.uniform(0.05, 0.3, size=(3, 12))
    path = str(tmp_path / "dust.h5")
    write_bayestar_file(path, np.full(3, nside), pix, dists, av_mean, av_std)

    bs = Bayestar(path)
    d, m, s = bs.query((l[1], b[1]))
    np.testing.assert_allclose(d, dists)
    np.testing.assert_allclose(m, av_mean[1], rtol=1e-6)
    np.testing.assert_allclose(s, av_std[1], rtol=1e-6)
    # Uncovered sightline -> NaN profile
    _, m2, _ = bs.query((200.0, -60.0))
    assert np.all(np.isnan(m2))


# --- priors ---------------------------------------------------------------

def test_imf_lnprior_oracle():
    m = np.array([0.05, 0.1, 0.3, 0.5, 0.8, 1.5, 3.0])
    got = np.asarray(priors.imf_lnprior(m))
    # numpy re-derivation of the broken power law + normalization
    aL, aH, mb = 1.3, 2.3, 0.5
    lnp = np.where(m > mb, -aH * np.log(m) + (aH - aL) * np.log(mb),
                   np.where(m > 0.08, -aL * np.log(m), -np.inf))
    nl = mb ** (1 - aL) / (aH - 1)
    nh = 0.08 ** (1 - aL) / (aL - 1) - mb ** (1 - aL) / (aL - 1)
    np.testing.assert_allclose(got, lnp - np.log(nl + nh), rtol=1e-10)
    # binary variant adds the secondary and squares the normalization
    got2 = np.asarray(priors.imf_lnprior(m, mgrid2=m))
    np.testing.assert_allclose(got2, 2 * lnp - np.log((nl + nh) ** 2),
                               rtol=1e-10)


def test_ps1_prior_interpolates_table():
    tab_Mr, tab_lnp = priors._ps1_table()
    got = np.asarray(priors.ps1_MrLF_lnprior(tab_Mr[10:20]))
    np.testing.assert_allclose(got, tab_lnp[10:20], rtol=1e-12)
    mid = 0.5 * (tab_Mr[3] + tab_Mr[4])
    got_mid = float(priors.ps1_MrLF_lnprior(mid))
    assert min(tab_lnp[3], tab_lnp[4]) <= got_mid <= max(tab_lnp[3],
                                                         tab_lnp[4])


def test_parallax_priors():
    p = np.array([0.5, 1.0, 2.0])
    got = np.asarray(priors.parallax_lnprior(p, 1.0, 0.1))
    expect = stats.norm.logpdf(p, 1.0, 0.1) - 0.5 * np.log(2 * np.pi) \
        - np.log(0.1) - (stats.norm.logpdf(p, 1.0, 0.1)
                         - stats.norm.logpdf(p, 1.0, 0.1))
    # direct formula: -0.5*(chi2 + ln(2 pi sig^2))
    expect = -0.5 * ((p - 1.0) ** 2 / 0.01 + np.log(2 * np.pi * 0.01))
    np.testing.assert_allclose(got, expect, rtol=1e-10)
    # missing measurement -> uniform
    got = np.asarray(priors.parallax_lnprior(p, np.nan, 0.1))
    np.testing.assert_array_equal(got, 0.0)


def test_scale_parallax_prior_gate():
    s = np.array([0.5, 1.0, 2.0])
    serr = np.full(3, 0.1)
    # High SNR: Gaussian in scale space.
    got = np.asarray(priors.scale_parallax_lnprior(s, serr, 1.0, 0.05))
    sm, ss = 1.0 ** 2 + 0.05 ** 2, np.sqrt(2 * 0.05 ** 4 + 4 * 0.05 ** 2)
    var = ss ** 2 + serr ** 2
    expect = -0.5 * ((s - sm) ** 2 / var + np.log(2 * np.pi * var))
    np.testing.assert_allclose(got, expect, rtol=1e-9)
    # Low SNR: uniform.
    got = np.asarray(priors.scale_parallax_lnprior(s, serr, 0.1, 0.1))
    np.testing.assert_array_equal(got, 0.0)


def test_gal_lnprior_oracle():
    """Cross-check the full Galactic prior against a numpy re-derivation."""
    cfg = GalPriorConfig()
    dists = np.linspace(0.05, 12.0, 40)
    coord = np.array([204.7, -19.2])
    feh = rng.uniform(-2, 0.4, dists.shape)
    loga = rng.uniform(8.0, 10.1, dists.shape)

    got = np.asarray(priors.gal_lnprior(jnp.asarray(dists),
                                        jnp.asarray(coord),
                                        feh=jnp.asarray(feh),
                                        loga=jnp.asarray(loga)))

    # numpy oracle
    R, Z = [np.asarray(v) for v in
            coords.galactic_to_cylindrical(coord[0], coord[1], dists)]
    vol = 2 * np.log(dists)

    def nd_disk(Rs, Zs, Rsc, Zsc, Rsm):
        Reff = np.sqrt(R ** 2 + Rsm ** 2)
        return -((Reff - cfg.R_solar) / Rsc
                 + (np.abs(Z) - abs(cfg.Z_solar)) / Zsc)

    lp_thin = nd_disk(R, Z, cfg.R_thin, cfg.Z_thin, cfg.Rs_thin) + vol
    lp_thick = (nd_disk(R, Z, cfg.R_thick, cfg.Z_thick, cfg.Rs_thick)
                + vol + np.log(cfg.f_thick))
    r = np.sqrt(R ** 2 + Z ** 2)
    rp = np.sqrt(r ** 2 + cfg.r_q_halo ** 2)
    q = cfg.q_halo_inf - (cfg.q_halo_inf - cfg.q_halo_ctr) * np.exp(
        1 - rp / cfg.r_q_halo)
    Reff = np.sqrt(R ** 2 + (Z / q) ** 2 + cfg.Rs_halo ** 2)
    rps = np.sqrt(cfg.R_solar ** 2 + cfg.Z_solar ** 2 + cfg.r_q_halo ** 2)
    qs = cfg.q_halo_inf - (cfg.q_halo_inf - cfg.q_halo_ctr) * np.exp(
        1 - rps / cfg.r_q_halo)
    Reffs = np.sqrt(cfg.R_solar ** 2 + (cfg.Z_solar / qs) ** 2
                    + cfg.Rs_halo ** 2)
    lp_halo = (-cfg.eta_halo * np.log(Reff / Reffs)
               + vol + np.log(cfg.f_halo))
    lnp = np_logsumexp([lp_thin, lp_thick, lp_halo], axis=0)

    mem = [lp - lnp for lp in (lp_thin, lp_thick, lp_halo)]

    def feh_p(mean, sig):
        return -0.5 * ((mean - feh) ** 2 / sig ** 2
                       + np.log(2 * np.pi * sig ** 2))

    lnp += np_logsumexp(
        [feh_p(cfg.feh_thin, cfg.feh_thin_sigma) + mem[0],
         feh_p(cfg.feh_thick, cfg.feh_thick_sigma) + mem[1],
         feh_p(cfg.feh_halo, cfg.feh_halo_sigma) + mem[2]], axis=0)

    age = 10 ** loga / 1e9

    def age_p(feh_mean):
        am = (cfg.max_age - cfg.min_age) / (
            1 + np.exp((feh_mean - cfg.feh_age_ctr) / cfg.feh_age_scale))
        asig = np.clip((cfg.max_age - am) / cfg.nsigma_from_max_age,
                       cfg.min_sigma, cfg.max_sigma)
        a = (cfg.min_age - am) / asig
        b = (cfg.max_age - am) / asig
        return stats.truncnorm.logpdf(age, a, b, loc=am, scale=asig)

    lnp += np_logsumexp([age_p(cfg.feh_thin) + mem[0],
                         age_p(cfg.feh_thick) + mem[1],
                         age_p(cfg.feh_halo) + mem[2]], axis=0)

    np.testing.assert_allclose(got, lnp, rtol=1e-8, atol=1e-8)


def test_dust_lnprior():
    av_dist = np.linspace(0.1, 10, 20)
    av_mean = np.linspace(0, 2, 20)
    av_std = np.full(20, 0.1)
    dists = np.array([0.5, 2.0, 20.0])
    avs = np.array([0.2, 0.5, 2.2])
    cfg = DustPriorConfig()
    got = np.asarray(priors.dust_lnprior(dists, avs, av_dist, av_mean,
                                         av_std, cfg))
    m = np.interp(dists, av_dist, av_mean)
    e = np.sqrt(np.interp(dists, av_dist, av_std) ** 2 + cfg.scatter ** 2)
    expect = -0.5 * ((avs - m) ** 2 / e ** 2 + np.log(2 * np.pi * e ** 2))
    np.testing.assert_allclose(got, expect, rtol=1e-8)
    # no coverage -> uniform
    got = np.asarray(priors.dust_lnprior(dists, avs, av_dist,
                                         np.full(20, np.nan), av_std, cfg))
    np.testing.assert_array_equal(got, 0.0)
