"""I/O layer tests: offsets loader, results writer, data registry."""

import os

import numpy as np
import pytest

from brutus_tpu.io import (load_offsets, ResultsWriter, load_results,
                           DATAVERSE_DOIS, fetch, data_dir)


def test_load_offsets(tmp_path):
    path = str(tmp_path / "offsets.txt")
    with open(path, "w") as f:
        f.write("PS_g 1.02\nPS_r 0.98\n2MASS_J 1.01\n")
    filters = ["PS_g", "PS_r", "PS_i", "2MASS_J"]
    offs = load_offsets(path, filters=filters, verbose=False)
    np.testing.assert_allclose(offs, [1.02, 0.98, 1.0, 1.01])
    # Duplicate rows are an error (reference utils.py:707-709).
    with open(path, "a") as f:
        f.write("PS_g 1.05\n")
    with pytest.raises(ValueError):
        load_offsets(path, filters=filters, verbose=False)


def test_results_writer_cursor(tmp_path):
    path = str(tmp_path / "res")
    w = ResultsWriter(path, n_data=5, n_draws=4)
    assert w.cursor == 0
    out = dict(model_idx=np.ones((2, 4), np.int32),
               scale=np.ones((2, 4)), av=np.zeros((2, 4)),
               rv=np.zeros((2, 4)), cov_sar=np.zeros((2, 4, 3, 3)),
               lnprob=np.zeros((2, 4)), log_evidence=np.zeros(2),
               chi2min=np.zeros(2), ndim=np.ones(2, np.int16),
               dist=np.ones((2, 4)), red=np.zeros((2, 4)),
               dred=np.zeros((2, 4)), logwt=np.zeros((2, 4)))
    w.write_batch(0, out)
    assert w.cursor == 2
    w.close()
    # Reopen for resume.
    w2 = ResultsWriter(path, n_data=5, n_draws=4, resume=True)
    assert w2.cursor == 2
    w2.close()
    res = load_results(path)
    assert (res["model_idx"][2:] == -99).all()


def test_fetch_registry_and_errors():
    from brutus_tpu.io import DATA_REGISTRY
    assert "grid_mist_v9.h5" in DATAVERSE_DOIS
    for name, (doi, sha) in DATA_REGISTRY.items():
        assert doi.startswith("10.7910/DVN/")
        assert len(sha) == 64 and int(sha, 16) >= 0
    with pytest.raises(KeyError):
        fetch("nonexistent.h5")
    assert isinstance(data_dir(), str)


def test_fetch_cache_hit_and_symlink(tmp_path, monkeypatch):
    """A cached file with the right SHA256 is served without network;
    corruption triggers a (failing, offline) re-download attempt."""
    import brutus_tpu.io as io

    cache = tmp_path / "cache"
    cache.mkdir()
    monkeypatch.setenv(io.DATA_DIR_ENV, str(cache))
    payload = b"synthetic offsets file\n"
    (cache / "offsets_mist_v8.txt").write_bytes(payload)
    good = io.sha256sum(cache / "offsets_mist_v8.txt")
    monkeypatch.setitem(io.DATA_REGISTRY, "offsets_mist_v8.txt",
                        ("10.7910/DVN/L7D1FY/QTNKKN", good))

    # Cache hit: no network touched, symlink created in target_dir.
    target = tmp_path / "work"
    out = io.fetch("offsets_mist_v8.txt", str(target), verbose=False)
    assert os.path.islink(out)
    assert open(out, "rb").read() == payload
    # Second call: symlink already present, same result.
    assert io.fetch("offsets_mist_v8.txt", str(target),
                    verbose=False) == out

    # Corrupt the cache: fetch must try to re-download (and fail offline
    # with an informative error, not serve the corrupt file).
    (cache / "offsets_mist_v8.txt").write_bytes(b"corrupted")
    with pytest.raises(RuntimeError, match="failed to fetch"):
        io.fetch("offsets_mist_v8.txt", verbose=False, retries=1)


REF_ORION = "/root/reference/demos/Orion_l204.7_b-19.2.h5"


@pytest.mark.skipif(not os.path.exists(REF_ORION),
                    reason="reference demo data not available")
@pytest.mark.slow
def test_real_orion_catalog_end_to_end():
    """Plumbing check on the reference's committed Orion catalog: the
    real structured photometry (1,642 stars, 8 bands, Gaia parallaxes)
    flows through magnitude conversion, masking, and a full BruteForce
    fit against a synthetic grid without any shape/NaN surprises."""
    import h5py
    import jax
    from brutus_tpu.utils import inv_magnitude
    from brutus_tpu.fitting import BruteForce

    with h5py.File(REF_ORION, "r") as f:
        cat = f["photometry/pixel 0-0"][:]
    assert len(cat) == 1642
    mag = np.asarray(cat["mag"], dtype=float)
    magerr = np.asarray(cat["err"], dtype=float)
    flux, fluxerr = [np.asarray(v) for v in inv_magnitude(mag, magerr)]
    mask = np.isfinite(flux) & np.isfinite(fluxerr) & (fluxerr > 0)
    good = mask.sum(axis=1) >= 4
    sel = np.flatnonzero(good)[:8]

    rng = np.random.default_rng(0)
    M, F = 512, mag.shape[1]
    mc = np.stack([rng.uniform(4, 14, (M, F)),
                   rng.uniform(0.4, 1.1, (M, F)),
                   rng.uniform(0.05, 0.2, (M, F))], axis=-1)
    ltype = np.dtype([("mini", float), ("feh", float), ("loga", float)])
    labels = np.zeros(M, dtype=ltype)
    labels["mini"] = rng.uniform(0.5, 2.0, M)
    labels["feh"] = rng.uniform(-2.0, 0.3, M)
    labels["loga"] = rng.uniform(8.0, 10.1, M)

    coords = np.c_[cat["l"][sel], cat["b"][sel]]
    plx = np.asarray(cat["parallax"][sel], dtype=float)
    plxe = np.asarray(cat["parallax_error"][sel], dtype=float)

    bf = BruteForce(mc, labels)
    out = bf.fit(flux[sel], fluxerr[sel], mask[sel],
                 data_coords=coords, parallax=plx, parallax_err=plxe,
                 Nmc_prior=16, Ndraws=32, batch_size=8, n_sel_max=64,
                 verbose=False, return_results=True)
    assert np.isfinite(out["log_evidence"]).all()
    assert np.isfinite(out["dist"]).all()
    assert (out["dist"] > 0).all()


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(REF_ORION),
                    reason="reference catalog unavailable")
def test_real_orion_full_pipeline_golden():
    """Full-pipeline float64 golden test on 64 REAL Orion stars
    (real fluxes/uncertainties/(l,b)/Gaia parallaxes; missing bands
    and NaN parallaxes injected to exercise those paths): the jitted
    posterior (culls, priors at the MLE, PSD repair, MC integration,
    evidence) must match `tests/oracle.py`'s reference re-derivation
    to float64-injection accuracy, and the fused engine must agree
    with the XLA engine on evidence.  Reference semantics:
    brutus/fitting.py:823-1107, 1803-2065."""
    import h5py
    import jax
    import jax.numpy as jnp
    from brutus_tpu.utils import inv_magnitude
    from brutus_tpu.config import FitConfig, PosteriorConfig
    from brutus_tpu.ops.optimize import loglike_grid
    from brutus_tpu.ops.posterior import lnpost_grid
    from brutus_tpu.ops.pallas_loglike import icov_from_parts
    from brutus_tpu.priors import gal_lnprior
    from oracle import oracle_lnpost, oracle_dust_lnprior

    with h5py.File(REF_ORION, "r") as f:
        cat = f["photometry/pixel 0-0"][:]
    mag = np.asarray(cat["mag"], dtype=float)
    magerr = np.asarray(cat["err"], dtype=float)
    flux, fluxerr = [np.asarray(v) for v in inv_magnitude(mag, magerr)]
    mask = np.isfinite(flux) & np.isfinite(fluxerr) & (fluxerr > 0) \
        & (mag < 50.0) & (magerr < 0.25)
    good = mask.sum(axis=1) >= 5
    sel = np.flatnonzero(good)[:64]
    n_star, F = len(sel), mag.shape[1]
    assert n_star == 64
    flux, fluxerr, mask = flux[sel], fluxerr[sel], mask[sel]
    coords = np.c_[cat["l"][sel], cat["b"][sel]]
    plx = np.asarray(cat["parallax"][sel], dtype=float)
    plxe = np.asarray(cat["parallax_error"][sel], dtype=float)
    # Exercise the degraded-data paths on real photometry: NaN
    # parallaxes for 8 stars, one extra masked band for 16.
    plx[::8] = np.nan
    plxe[::8] = np.nan
    mask[1::4, 2] = False

    rng = np.random.default_rng(3)
    M = 256
    mc = np.stack([rng.uniform(4, 14, (M, F)),
                   rng.uniform(0.4, 1.1, (M, F)),
                   rng.uniform(0.05, 0.2, (M, F))], axis=-1)
    feh = rng.uniform(-2.0, 0.3, M)
    loga = rng.uniform(8.0, 10.1, M)
    lnprior = rng.uniform(-1.0, 0.0, M)
    dust_dist = np.linspace(0.05, 5.0, 32)
    dust_mean = np.linspace(0.0, 1.0, 32)
    dust_std = np.full(32, 0.25)

    fit_cfg = FitConfig()
    Nmc = 16
    post_cfg = PosteriorConfig(n_sel_max=M, n_mc_prior=Nmc,
                               prefilter_k=0, n_draws=200)

    res_b = jax.vmap(lambda f_, e_, m_, p_, pe_: loglike_grid(
        f_, e_, m_, jnp.asarray(mc), parallax=p_, parallax_err=pe_,
        cfg=fit_cfg))(jnp.asarray(flux), jnp.asarray(fluxerr),
                      jnp.asarray(mask), jnp.asarray(plx),
                      jnp.asarray(plxe))

    n_checked = 0
    for b in range(n_star):
        res = {k: (tuple(p[b] for p in v) if isinstance(v, tuple)
                   else v[b])
               for k, v in res_b.items()}
        key = jax.random.PRNGKey(1000 + b)
        out = lnpost_grid(
            key, res, jnp.asarray(lnprior), jnp.asarray(coords[b]),
            parallax=jnp.asarray(plx[b]),
            parallax_err=jnp.asarray(plxe[b]),
            feh=jnp.asarray(feh), loga=jnp.asarray(loga),
            dust_profile=(jnp.asarray(dust_dist),
                          jnp.asarray(dust_mean),
                          jnp.asarray(dust_std)),
            cfg=post_cfg)

        # Inject the identical threefry normals into the oracle.
        kmvn, _, _ = jax.random.split(key, 3)
        dtype = res["lnlike"].dtype
        z_full = np.asarray(jax.random.normal(kmvn, (M, 3, Nmc), dtype))
        sel_idx = np.asarray(out["sel_idx"])
        z_global = np.empty_like(z_full)
        z_global[sel_idx] = z_full

        def gal_fn(dists, s):
            fe, la = feh[s], loga[s]
            if np.ndim(dists) == 2:
                fe, la = fe[:, None], la[:, None]
            return np.asarray(gal_lnprior(
                jnp.asarray(dists), jnp.asarray(coords[b]),
                feh=jnp.asarray(fe), loga=jnp.asarray(la)))

        def dust_fn(dists, avs):
            return oracle_dust_lnprior(dists, avs, dust_dist,
                                       dust_mean, dust_std)

        icov = np.asarray(icov_from_parts(res["icov_parts"]), float)
        results = (np.asarray(res["lnlike"], float), int(res["ndim"]),
                   np.asarray(res["chi2"], float),
                   np.asarray(res["scale"], float),
                   np.asarray(res["av"], float),
                   np.asarray(res["rv"], float), icov)
        (sel_o, _cov_o, lnp_o, dist_o, _red_o, _dred_o, logwt_o,
         levid_o) = oracle_lnpost(
            results, z_global, parallax=plx[b], parallax_err=plxe[b],
            lnprior=lnprior, gal_fn=gal_fn, dust_fn=dust_fn)

        if not np.isfinite(levid_o) or levid_o < -1e250:
            continue     # degenerate star: defined-output path only
        # PSD-clean tier: if any weight-bearing model's raw covariance
        # needed the escalating repair, the oracle's UNBOUNDED repair
        # loop and the jitted fixed-pass + terminal-fallback repair
        # legitimately diverge (documented chaos, README divergences)
        # — such stars get bounded-agreement checks only.
        with np.errstate(all="ignore"):
            raw_cov = np.linalg.inv(icov[sel_o])
            pre_psd = np.all(np.linalg.eigvalsh(raw_cov) > 0, axis=1)
        bearing = lnp_o > lnp_o.max() - 7.0
        clean = bool(np.all(pre_psd[bearing]))
        if not clean:
            # Repair-chaos tier: a few nats of absolute drift, plus
            # float64-level relative slack for catastrophically bad
            # fits (|levid| can reach ~1e11 when a real star matches
            # nothing on the grid).
            assert (abs(float(out["log_evidence"]) - levid_o)
                    < 5.0 + 1e-6 * abs(levid_o))
            continue
        n_checked += 1
        # Evidence parity to float64-injection accuracy.
        np.testing.assert_allclose(float(out["log_evidence"]), levid_o,
                                   rtol=1e-6, atol=1e-6)
        # Per-model posterior weights of every oracle survivor.
        slot_of = {int(g): k for k, g in enumerate(sel_idx)}
        slots = np.array([slot_of[int(g)] for g in sel_o])
        lnp_j = np.asarray(out["lnp_sel"])[slots]
        ok = (lnp_o > -1e250) & pre_psd
        np.testing.assert_allclose(lnp_j[ok], lnp_o[ok],
                                   rtol=1e-6, atol=1e-5)
        # Posterior-median distance: TPU draws vs the oracle's exact
        # joint weights (model weight x within-model draw weight).
        wk = np.exp(lnp_o - lnp_o.max())
        wk /= wk.sum()
        wmc = np.exp(logwt_o - logwt_o.max(axis=1, keepdims=True))
        wmc /= wmc.sum(axis=1, keepdims=True)
        wj = (wk[:, None] * wmc).ravel()
        order = np.argsort(dist_o.ravel())
        cdf = np.cumsum(wj[order])
        med_o = dist_o.ravel()[order][np.searchsorted(cdf, 0.5)]
        med_j = np.median(np.asarray(out["dist"]))
        assert abs(med_j - med_o) / med_o < 0.1, (b, med_j, med_o)
    # A quarter of the real stars verify at float64-golden precision
    # end to end; the rest have weight-bearing models whose precision
    # matrices are genuinely indefinite (the reference's own
    # construction artifact) and verify under the bounded
    # repair-chaos tier above instead.
    assert n_checked >= 12

    # Cross-engine agreement on the same real stars.
    from brutus_tpu.fitting import BruteForce
    ltype = np.dtype([("mini", float), ("feh", float), ("loga", float)])
    labels = np.zeros(M, dtype=ltype)
    labels["mini"] = rng.uniform(0.5, 2.0, M)
    labels["feh"] = feh
    labels["loga"] = loga
    kw = dict(save_file=None, data_coords=coords, parallax=plx,
              parallax_err=plxe, lnprior=lnprior, Nmc_prior=16,
              Ndraws=64, batch_size=16, n_sel_max=128, verbose=False,
              return_results=True, apply_agewt=False, apply_grad=False)
    bf = BruteForce(mc, labels)
    out_x = bf.fit(flux, fluxerr, mask, engine="xla", **kw)
    out_f = bf.fit(flux, fluxerr, mask, engine="fused", tile=64,
                   screen_k=128, **kw)
    # NO evidence-nat comparison here: real stars against a random
    # grid are uniformly terrible fits (chi2/n 10-1e9), where the two
    # engines' damped optimizers legitimately land in different local
    # basins and log-evidence differs by chi2-scale amounts.  Engine
    # agreement on PHYSICAL data is asserted by
    # test_pallas.py::test_bruteforce_* (worst 0.97 nats over 96
    # swept stars).  Here we assert the pipeline-level contract only:
    # both engines produce finite, defined outputs on every real star,
    # and the survey OUTPUT (median distance) agrees for most.
    for o in (out_x, out_f):
        assert np.isfinite(np.asarray(o["dist"])).all()
        assert np.isfinite(np.asarray(o["log_evidence"])).all()
    d_f = np.median(np.asarray(out_f["dist"]), axis=1)
    d_x = np.median(np.asarray(out_x["dist"]), axis=1)
    rel = np.abs(d_f - d_x) / np.maximum(d_x, 1e-10)
    assert np.median(rel) < 0.15, rel
    assert (rel < 0.5).mean() >= 0.85, rel
