"""Parity tests for the likelihood core against the numpy oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from brutus_tpu.config import FitConfig
from brutus_tpu.ops import get_seds, loglike_grid, sed_mle
from brutus_tpu.ops.optimize import optimize_mag

from oracle import (make_synthetic_grid, make_synthetic_star,
                    oracle_get_seds, oracle_loglike, oracle_optimize_mag,
                    oracle_sed_mle)

rng = np.random.default_rng(42)


def test_get_seds_matches_oracle():
    mc = make_synthetic_grid(rng, nmodel=32, nfilt=6)
    av = rng.uniform(0, 2, 32)
    rv = rng.uniform(2, 5, 32)
    for flux in (False, True):
        seds, rv_, drv_ = oracle_get_seds(mc, av, rv, return_flux=flux)
        got = get_seds(jnp.asarray(mc), jnp.asarray(av), jnp.asarray(rv),
                       return_flux=flux, return_rvec=True, return_drvec=True)
        np.testing.assert_allclose(np.asarray(got[0]), seds, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(got[1]), rv_, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(got[2]), drv_, rtol=1e-12)


def test_sed_mle_matches_oracle():
    nmodel, nfilt = 48, 8
    mc = make_synthetic_grid(rng, nmodel, nfilt)
    flux, err, mask = make_synthetic_star(rng, mc, idx=5)
    av = rng.uniform(0, 2, nmodel)
    rv = rng.uniform(2, 5, nmodel)
    tot_var = np.tile(err ** 2, (nmodel, 1))

    o = oracle_sed_mle(flux, tot_var, mc, av, rv)
    wt = 1.0 / err ** 2
    g = list(sed_mle(jnp.asarray(flux), jnp.asarray(wt), jnp.asarray(mc),
                     jnp.asarray(av), jnp.asarray(rv), FitConfig()))
    from brutus_tpu.ops.pallas_loglike import icov_from_parts
    g[4] = icov_from_parts(g[4])
    names = ["models", "rvecs", "drvecs", "scale", "icov", "resid"]
    for name, oa, ga in zip(names, o, g):
        np.testing.assert_allclose(np.asarray(ga), oa, rtol=5e-9, atol=1e-20,
                                   err_msg=name)


def test_optimize_mag_matches_oracle():
    nmodel, nfilt = 40, 8
    mc = make_synthetic_grid(rng, nmodel, nfilt)
    flux, err, mask = make_synthetic_star(rng, mc, av=0.8, rv=3.4, idx=11)
    tot_var = np.tile(err ** 2, (nmodel, 1))
    mags = -2.5 * np.log10(flux)
    mags_var = (2.5 / np.log(10)) ** 2 * tot_var / flux ** 2

    cfg = FitConfig()
    av0 = np.full(nmodel, cfg.av0)
    rv0 = np.full(nmodel, cfg.rv0)
    av_o, rv_o = oracle_optimize_mag(flux, tot_var, av0, rv0, mc, mags,
                                     mags_var, tol=cfg.mtol)
    wt_mag = 1.0 / mags_var[0]
    av_g, rv_g, _ = optimize_mag(jnp.asarray(mags), jnp.asarray(wt_mag),
                              jnp.asarray(mc), jnp.asarray(av0),
                              jnp.asarray(rv0), cfg)
    np.testing.assert_allclose(np.asarray(av_g), av_o, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(rv_g), rv_o, rtol=1e-8, atol=1e-10)


def _compare_loglike(cfg, parallax=np.nan, parallax_err=np.nan,
                     drop_band=None, negative_band=None):
    nmodel, nfilt = 96, 8
    mc = make_synthetic_grid(rng, nmodel, nfilt)
    flux, err, mask = make_synthetic_star(rng, mc, av=0.5, rv=3.2, idx=17)
    if drop_band is not None:
        mask = mask.copy()
        mask[drop_band] = False
    if negative_band is not None:
        flux = flux.copy()
        flux[negative_band] = -abs(flux[negative_band])

    o_lnl, o_ndim, o_chi2, o_s, o_av, o_rv, o_icov = oracle_loglike(
        flux, err, mask, mc, dim_prior=cfg.dim_prior,
        init_thresh=cfg.init_thresh if cfg.apply_init_cull else None,
        parallax=parallax, parallax_err=parallax_err)

    out = loglike_grid(jnp.asarray(flux), jnp.asarray(err),
                       jnp.asarray(mask), jnp.asarray(mc),
                       parallax=jnp.asarray(parallax),
                       parallax_err=jnp.asarray(parallax_err), cfg=cfg)

    assert int(out["ndim"]) == o_ndim
    np.testing.assert_allclose(np.asarray(out["chi2"]), o_chi2,
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out["lnlike"]), o_lnl,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["scale"]), o_s, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["av"]), o_av,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["rv"]), o_rv,
                               rtol=1e-6, atol=1e-6)
    from brutus_tpu.ops.pallas_loglike import icov_from_parts
    np.testing.assert_allclose(np.asarray(icov_from_parts(
        out["icov_parts"])), o_icov, rtol=1e-5, atol=1e-6)


def test_loglike_no_cull_exact_parity():
    cfg = FitConfig(apply_init_cull=False, dim_prior=False)
    _compare_loglike(cfg)


def test_loglike_with_cull():
    cfg = FitConfig(dim_prior=False)
    _compare_loglike(cfg)


def test_loglike_dim_prior():
    cfg = FitConfig()
    _compare_loglike(cfg)


def test_loglike_masked_band():
    cfg = FitConfig(dim_prior=False)
    _compare_loglike(cfg, drop_band=2)


def test_loglike_negative_flux_band():
    cfg = FitConfig(dim_prior=False)
    _compare_loglike(cfg, negative_band=6)


def test_loglike_with_parallax_clip():
    cfg = FitConfig(dim_prior=False)
    # True distance 1 kpc -> parallax 1 mas; scale convention s = p^2.
    _compare_loglike(cfg, parallax=1.0, parallax_err=0.1)


def test_loglike_float32_close():
    """The float32 device path tracks the float64 oracle loosely."""
    nmodel, nfilt = 64, 8
    mc = make_synthetic_grid(rng, nmodel, nfilt)
    flux, err, mask = make_synthetic_star(rng, mc, idx=3)
    cfg = FitConfig(dim_prior=False)
    o_lnl, *_ = oracle_loglike(flux, err, mask, mc, dim_prior=False)
    out = loglike_grid(jnp.asarray(flux, jnp.float32),
                       jnp.asarray(err, jnp.float32),
                       jnp.asarray(mask),
                       jnp.asarray(mc, jnp.float32), cfg=cfg)
    got = np.asarray(out["lnlike"], np.float64)
    # Compare posterior weights of the dominant models.
    sel = o_lnl > o_lnl.max() - 10
    np.testing.assert_allclose(got[sel] - got[sel].max(),
                               o_lnl[sel] - o_lnl[sel].max(), atol=0.05)


@pytest.mark.slow
def test_direct_mag_init_converges_same():
    """The direct 3x3 seed reaches the same optimum as cold-start."""
    nmodel, nfilt = 64, 8
    mc = make_synthetic_grid(rng, nmodel, nfilt)
    flux, err, mask = make_synthetic_star(rng, mc, av=0.9, rv=3.5, idx=9)
    out_a = loglike_grid(jnp.asarray(flux), jnp.asarray(err),
                         jnp.asarray(mask), jnp.asarray(mc),
                         cfg=FitConfig(dim_prior=False))
    out_b = loglike_grid(jnp.asarray(flux), jnp.asarray(err),
                         jnp.asarray(mask), jnp.asarray(mc),
                         cfg=FitConfig(dim_prior=False,
                                       mag_direct_init=True))
    la, lb = np.asarray(out_a["lnlike"]), np.asarray(out_b["lnlike"])
    sel = la > la.max() - 10
    np.testing.assert_allclose(lb[sel] - lb[sel].max(),
                               la[sel] - la[sel].max(), atol=0.1)
    assert la.argmax() == lb.argmax()


@pytest.mark.slow
def test_polish_topk_matches_dense():
    """Restricting the flux polish to the top-k models reproduces the
    dense path wherever the init cull keeps models."""
    nmodel, nfilt = 96, 8
    mc = make_synthetic_grid(rng, nmodel, nfilt)
    flux, err, mask = make_synthetic_star(rng, mc, av=0.6, rv=3.1, idx=30)
    dense = loglike_grid(jnp.asarray(flux), jnp.asarray(err),
                         jnp.asarray(mask), jnp.asarray(mc),
                         cfg=FitConfig(dim_prior=False, polish_k=0))
    topk = loglike_grid(jnp.asarray(flux), jnp.asarray(err),
                        jnp.asarray(mask), jnp.asarray(mc),
                        cfg=FitConfig(dim_prior=False, polish_k=48))
    ld, lt = np.asarray(dense["lnlike"]), np.asarray(topk["lnlike"])
    # Models surviving the init cull are polished identically.
    keep = ld > ld.max() - 5.0
    np.testing.assert_allclose(lt[keep], ld[keep], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(topk["av"])[keep],
                               np.asarray(dense["av"])[keep], rtol=1e-9)
    assert ld.argmax() == lt.argmax()


def test_per_model_init_arrays():
    """Per-model av_init/rv_init seeds (reference fitting.py:583-585,
    700-703): warm-started fits converge to the same optimum, and a
    deliberately clamped-at-bounds seed still recovers."""
    rng = np.random.default_rng(55)
    M, F = 64, 8
    mc = np.stack([rng.uniform(8, 16, (M, F)),
                   rng.uniform(0.4, 1.1, (M, F)),
                   rng.uniform(0.05, 0.2, (M, F))], -1)
    sed = mc[7, :, 0] + 0.7 * (mc[7, :, 1] + 3.1 * mc[7, :, 2])
    flux = 10 ** (-0.4 * sed) / 1.2 ** 2
    err = flux / 80.0
    flux = flux + rng.normal(size=F) * err
    cfg = FitConfig()
    base = loglike_grid(jnp.asarray(flux), jnp.asarray(err),
                        jnp.ones(F, bool), jnp.asarray(mc), cfg=cfg)
    warm = loglike_grid(jnp.asarray(flux), jnp.asarray(err),
                        jnp.ones(F, bool), jnp.asarray(mc),
                        av_init=jnp.asarray(base["av"]),
                        rv_init=jnp.asarray(base["rv"]), cfg=cfg)
    w = int(np.asarray(base["lnlike"]).argmax())
    assert w == 7
    np.testing.assert_allclose(np.asarray(warm["av"])[w],
                               np.asarray(base["av"])[w], atol=2e-2)
    np.testing.assert_allclose(np.asarray(warm["rv"])[w],
                               np.asarray(base["rv"])[w], atol=5e-2)
    assert abs(np.asarray(warm["lnlike"])[w]
               - np.asarray(base["lnlike"])[w]) < 0.1
