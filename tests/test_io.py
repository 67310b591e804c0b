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
