"""Fused MC-integration kernel (`ops.pallas_mc` via `lnpost_batch`)
vs the XLA posterior path (`lnpost_grid`), interpret mode on CPU.

Same keys + same draw layout => the two paths must agree to float32
association error on every output.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode MC kernel
import jax
import jax.numpy as jnp

from bench import build_problem
from brutus_tpu.config import FitConfig, PosteriorConfig
from brutus_tpu.ops import pallas_loglike as PL
from brutus_tpu.ops.posterior import lnpost_grid, lnpost_batch


def _setup(M=4096, F=8, B=5):
    mc, flux, err, idx, feh, loga, plx, plxe = build_problem(M, F, B,
                                                             seed=11)
    cfg = FitConfig(mag_direct_init=True)
    ct, packed, names, n_real, maskrow = PL.prepare_screen(
        mc, aux=dict(lnprior=np.zeros(M, np.float32),
                     feh=feh.astype(np.float32),
                     loga=loga.astype(np.float32)), tile=512,
        screen_block=64)
    res = PL.loglike_grid_screened(
        jnp.asarray(flux), jnp.asarray(err), jnp.ones((B, F), bool),
        ct, packed, maskrow, n_real, parallax=jnp.asarray(plx),
        parallax_err=jnp.asarray(plxe), cfg=cfg, tile=512,
        screen_k=1024, screen_block=64, aux_names=names, interpret=True)
    gidx = res.pop("global_idx")
    aux = res.pop("aux")
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    return res, gidx, aux, jnp.asarray(plx), jnp.asarray(plxe), keys


COORD = jnp.asarray([204.7, -19.2], jnp.float32)
DUST = (jnp.linspace(0.05, 10.0, 120, dtype=jnp.float32),
        jnp.linspace(0.0, 1.5, 120, dtype=jnp.float32),
        jnp.full(120, 0.2, jnp.float32))


def _compare(ref, out):
    assert (np.asarray(ref["model_idx"])
            == np.asarray(out["model_idx"])).all()
    for k in ("log_evidence", "chi2min", "dist", "red", "dred", "scale",
              "av", "rv", "lnprob", "cov_sar"):
        a, b = np.asarray(ref[k], np.float64), np.asarray(out[k],
                                                          np.float64)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4,
                                   err_msg=k)
    a = np.asarray(ref["lnp_sel"])
    b = np.asarray(out["lnp_sel"])
    m = a > -1e29
    assert (m == (b > -1e29)).all()
    np.testing.assert_allclose(a[m], b[m], rtol=1e-4, atol=1e-4)


def test_lnpost_batch_matches_lnpost_grid():
    res, gidx, aux, plx, plxe, keys = _setup()
    pcfg = PosteriorConfig(n_mc_prior=20, n_draws=64, n_sel_max=256,
                           prefilter_k=256)
    ref = jax.jit(jax.vmap(
        lambda k, r, gi, lp, fe, lo, p, pe: lnpost_grid(
            k, r, lp, COORD, parallax=p, parallax_err=pe, feh=fe,
            loga=lo, dust_profile=DUST, global_idx=gi, cfg=pcfg)))(
        keys, res, gidx, aux["lnprior"], aux["feh"], aux["loga"],
        plx, plxe)
    out = lnpost_batch(keys, res, aux["lnprior"], COORD,
                       parallax=plx, parallax_err=plxe,
                       feh=aux["feh"], loga=aux["loga"],
                       dust_profile=DUST, global_idx=gidx, cfg=pcfg,
                       interpret=True)
    _compare(ref, out)


def test_lnpost_batch_minimal_variant():
    """No dust / labels / parallax; odd Nmc (padded draw rows)."""
    res, gidx, aux, plx, plxe, keys = _setup()
    pcfg = PosteriorConfig(n_mc_prior=13, n_draws=32, n_sel_max=128,
                           prefilter_k=128)
    ref = jax.jit(jax.vmap(
        lambda k, r, gi, lp: lnpost_grid(k, r, lp, COORD, global_idx=gi,
                                         cfg=pcfg)))(
        keys, res, gidx, aux["lnprior"])
    out = lnpost_batch(keys, res, aux["lnprior"], COORD, global_idx=gidx,
                       cfg=pcfg, interpret=True)
    _compare(ref, out)


def test_lnpost_batch_uncovered_dust_and_jit():
    """NaN dust profile => uniform prior (reference pdf.py:824-827);
    whole call traced inside an outer jit (the production shape)."""
    res, gidx, aux, plx, plxe, keys = _setup()
    pcfg = PosteriorConfig(n_mc_prior=16, n_draws=32, n_sel_max=128,
                           prefilter_k=128)
    nan_dust = (DUST[0], jnp.full(120, jnp.nan), jnp.full(120, jnp.nan))
    ref = jax.jit(jax.vmap(
        lambda k, r, gi, lp, p, pe: lnpost_grid(
            k, r, lp, COORD, parallax=p, parallax_err=pe,
            dust_profile=nan_dust, global_idx=gi, cfg=pcfg)))(
        keys, res, gidx, aux["lnprior"], plx, plxe)

    def wrapped(keys, res, lnp, gi, p, pe):
        return lnpost_batch(keys, res, lnp, COORD, parallax=p,
                            parallax_err=pe, dust_profile=nan_dust,
                            global_idx=gi, cfg=pcfg, interpret=True)

    out = jax.jit(wrapped)(keys, res, aux["lnprior"], gidx, plx, plxe)
    _compare(ref, out)


def test_overlong_dust_ladder_rejected():
    """Ladders beyond the kernel's NL_PAD table were silently
    truncated (zero hat weights past rung 128 => flat dust prior for
    distant stars); now they raise, and `BruteForce` resamples real
    profiles to n=NL_PAD (`fitting.py` uniform_profile call)."""
    from brutus_tpu.ops.pallas_mc import NL_PAD
    res, gidx, aux, plx, plxe, keys = _setup()
    pcfg = PosteriorConfig(n_mc_prior=8, n_draws=16, n_sel_max=128,
                           prefilter_k=128)
    n = NL_PAD * 2
    long_dust = (jnp.linspace(0.05, 10.0, n, dtype=jnp.float32),
                 jnp.linspace(0.0, 1.5, n, dtype=jnp.float32),
                 jnp.full(n, 0.2, jnp.float32))
    with pytest.raises(ValueError, match="NL_PAD"):
        lnpost_batch(keys, res, aux["lnprior"], COORD,
                     parallax=plx, parallax_err=plxe,
                     dust_profile=long_dust, global_idx=gidx,
                     cfg=pcfg, interpret=True)
