"""Plain-XLA funnel (ops.screen_xla) vs the dense XLA engine."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from brutus_tpu.config import FitConfig
from brutus_tpu.ops.optimize import loglike_grid
from brutus_tpu.ops.screen_xla import (prepare_screen_xla,
                                       loglike_grid_screened_xla)

from test_pallas import _problem


def test_screened_xla_matches_dense():
    """Screen + block gather + vmapped dense fit == dense engine on
    every shortlisted model, and the shortlist covers everything the
    posterior culls could keep (reference cull semantics,
    `brutus/fitting.py:743-768` ranking, `:987-997` culls)."""
    rng = np.random.default_rng(211)
    mc, flux, err, idx, dist = _problem(n_model=2000, n_star=6, rng=rng)
    mask = np.ones(flux.shape, bool)
    plx = (1.0 / dist).astype(np.float32)
    plxe = (0.1 / dist).astype(np.float32)
    cfg = FitConfig(mag_direct_init=True)
    M = len(mc)

    tabw, tabc, packed, names, n_real = prepare_screen_xla(
        mc, aux=dict(lnprior=np.zeros(M, np.float32),
                     feh=rng.uniform(-2, 0.3, M).astype(np.float32)),
        block=64)
    assert n_real == M
    res = loglike_grid_screened_xla(
        jnp.asarray(flux), jnp.asarray(err), jnp.asarray(mask),
        tabw, tabc, packed, n_real,
        parallax=jnp.asarray(plx), parallax_err=jnp.asarray(plxe),
        cfg=cfg, screen_k=512, aux_names=names)

    lnl = np.asarray(res["lnlike"])
    gidx = np.asarray(res["global_idx"])
    assert lnl.shape == (6, 512)

    dense = jax.vmap(lambda f, e, m, p, pe: loglike_grid(
        f, e, m, jnp.asarray(mc), parallax=p, parallax_err=pe,
        cfg=cfg))(jnp.asarray(flux), jnp.asarray(err),
                  jnp.asarray(mask), jnp.asarray(plx),
                  jnp.asarray(plxe))
    lnl_d = np.asarray(dense["lnlike"])
    rows = np.arange(len(flux))

    # Winner identity + injected-model recovery.
    w = gidx[rows, lnl.argmax(1)]
    np.testing.assert_array_equal(w, lnl_d.argmax(1))
    assert (w == idx).all()
    # Value parity on the whole shortlist: stage 2 is the same
    # `lax.while_loop`-to-tolerance dense engine, vmapped — but its
    # convergence predicates (max over "good" models) range over the
    # shortlist subset instead of the full grid, so iteration counts
    # can differ by one and values match to float32 tolerance rather
    # than bit-exactly.
    for b in rows:
        real = gidx[b] < len(mc)     # last block may carry pad models
        g = gidx[b][real]
        np.testing.assert_allclose(lnl[b][real], lnl_d[b][g],
                                   rtol=1e-4, atol=0.1)
        for k in ("chi2", "scale", "av", "rv"):
            np.testing.assert_allclose(
                np.asarray(res[k])[b][real],
                np.asarray(dense[k])[b][g], rtol=2e-3, atol=2e-3)
    # Every model within 10 nats of the max is on the shortlist (the
    # posterior culls at ln(1e-3) ~ -6.9).
    for b in rows:
        good = np.flatnonzero(lnl_d[b] > lnl_d[b].max() - 10.0)
        assert np.isin(good, gidx[b]).all()
    # Gathered aux columns match their grid rows.
    feh_full = np.zeros(M, np.float32)
    feh_full[:M] = np.asarray(packed).reshape(-1, packed.shape[-1])[
        :M, 3 * flux.shape[1] + names.index("feh")]
    np.testing.assert_allclose(np.asarray(res["aux"]["feh"])[0],
                               feh_full[gidx[0]])


def test_screened_xla_padding_models_dead():
    """Grid padded to the block quantum: padding models never win."""
    rng = np.random.default_rng(212)
    mc, flux, err, idx, _ = _problem(n_model=300, n_star=4, rng=rng)
    mask = np.ones(flux.shape, bool)
    cfg = FitConfig()
    tabw, tabc, packed, names, n_real = prepare_screen_xla(
        mc, aux=dict(lnprior=np.zeros(300, np.float32)), block=64)
    assert packed.shape[0] * packed.shape[1] == 320
    res = loglike_grid_screened_xla(
        jnp.asarray(flux), jnp.asarray(err), jnp.asarray(mask),
        tabw, tabc, packed, n_real, cfg=cfg, screen_k=320,
        aux_names=names)
    lnl = np.asarray(res["lnlike"])
    gidx = np.asarray(res["global_idx"])
    pad_rows = gidx >= n_real
    assert pad_rows.any()
    assert lnl[pad_rows].max() < -1e29
    w = gidx[np.arange(4), lnl.argmax(1)]
    assert (w == idx).all()


def test_bruteforce_xla_funnel_matches_dense():
    """BruteForce engine='xla' + screen_k < M routes through the
    plain-XLA funnel and matches the dense XLA engine posteriors."""
    from brutus_tpu.fitting import BruteForce
    rng = np.random.default_rng(213)
    mc, flux, err, idx, dist = _problem(n_model=2000, n_star=6, rng=rng)
    ltype = np.dtype([("mini", float), ("feh", float), ("loga", float)])
    labels = np.zeros(len(mc), dtype=ltype)
    labels["mini"] = rng.uniform(0.5, 2.0, len(mc))
    labels["feh"] = rng.uniform(-2.0, 0.3, len(mc))
    labels["loga"] = rng.uniform(8.0, 10.1, len(mc))
    mask = np.ones(flux.shape, bool)
    mask[:, 5] = False               # zero-weight band through the screen
    coords = np.tile([204.7, -19.2], (len(flux), 1))
    kw = dict(save_file=None, data_coords=coords,
              parallax=1.0 / dist, parallax_err=0.05 / dist,
              Nmc_prior=16, Ndraws=64, n_sel_max=64, batch_size=3,
              verbose=False, return_results=True, engine="xla")
    bf = BruteForce(mc, labels)
    out_s = bf.fit(flux, err, mask, screen_k=512, screen_block=64, **kw)
    out_d = bf.fit(flux, err, mask, screen_k=0, **kw)
    np.testing.assert_allclose(out_s["log_evidence"],
                               out_d["log_evidence"], rtol=0, atol=0.5)
    d_s = np.median(out_s["dist"], axis=1)
    d_d = np.median(out_d["dist"], axis=1)
    np.testing.assert_allclose(d_s, d_d, rtol=0.05)
    assert (out_s["model_idx"] == idx[:, None]).mean() > 0.9
    # model_idx draws are grid-global.
    assert (out_s["model_idx"] >= 0).all()
    assert (out_s["model_idx"] < len(mc)).all()


def test_xla_funnel_model_mesh():
    """Model-sharded XLA funnel: tables sharded over a ('data'=2,
    'model'=4) mesh, block shortlists merged with all_gather/psum —
    must match the single-device XLA funnel to float association
    error (identical shortlist SET; only reduction order differs)."""
    from brutus_tpu.fitting import BruteForce
    from brutus_tpu.parallel import make_mesh
    rng = np.random.default_rng(214)
    mc, flux, err, idx, dist = _problem(n_model=1000, n_star=4, rng=rng)
    ltype = np.dtype([("mini", float), ("feh", float), ("loga", float)])
    labels = np.zeros(len(mc), dtype=ltype)
    labels["mini"] = rng.uniform(0.5, 2.0, len(mc))
    labels["feh"] = rng.uniform(-2.0, 0.3, len(mc))
    labels["loga"] = rng.uniform(8.0, 10.1, len(mc))
    mask = np.ones(flux.shape, bool)
    coords = np.tile([204.7, -19.2], (len(flux), 1))
    kw = dict(save_file=None, data_coords=coords,
              parallax=1.0 / dist, parallax_err=0.05 / dist,
              Nmc_prior=16, Ndraws=32, n_sel_max=32, batch_size=4,
              verbose=False, return_results=True, engine="xla",
              screen_k=256, screen_block=32)
    bf = BruteForce(mc, labels)
    out1 = bf.fit(flux, err, mask, **kw)
    mesh = make_mesh(n_data=2, n_model=4)
    out8 = bf.fit(flux, err, mask, mesh=mesh, **kw)
    np.testing.assert_allclose(out8["log_evidence"],
                               out1["log_evidence"], rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(out8["chi2min"], out1["chi2min"],
                               rtol=1e-6)
    assert (out8["model_idx"] == out1["model_idx"]).mean() > 0.95
    assert (out8["model_idx"] >= 0).all()
    assert (out8["model_idx"] < bf.NMODEL).all()
