"""Smoke tests for the plotting layer (Agg backend)."""

import matplotlib
matplotlib.use("Agg")

import numpy as np
import matplotlib.pyplot as plt

from brutus_tpu import plotting

rng = np.random.default_rng(31)


def test_cornerplot():
    samples = np.stack([rng.normal(0, 1, 2000),
                        rng.normal(5, 2, 2000),
                        rng.uniform(0, 1, 2000)])
    fig, axes = plotting.cornerplot(samples, labels=["a", "b", "c"],
                                    truths=[0.0, 5.0, None])
    assert axes.shape == (3, 3)
    plt.close(fig)


def test_hist2d():
    fig, ax = plt.subplots()
    plotting._hist2d(rng.normal(size=3000), rng.normal(size=3000), ax=ax)
    plt.close(fig)


def test_dist_vs_red():
    dists = np.abs(rng.normal(1.0, 0.1, (1, 400)))
    reds = np.abs(rng.normal(0.5, 0.1, (1, 400)))
    dreds = rng.uniform(2.5, 4.0, (1, 400))
    fig, ax = plt.subplots()
    ax, (pdf, xe, ye) = plotting.dist_vs_red((dists, reds, dreds), ax=ax,
                                             bins=(100, 60),
                                             parallax=1.0,
                                             parallax_err=0.1)
    assert pdf.shape == (100, 60)
    plt.close(fig)


def _posterior_inputs():
    n_model, n_filt, n_draw = 50, 6, 64
    models = np.stack([rng.uniform(8, 14, (n_model, n_filt)),
                       rng.uniform(0.4, 1.1, (n_model, n_filt)),
                       rng.uniform(0.05, 0.2, (n_model, n_filt))],
                      axis=-1)
    idxs = rng.integers(0, n_model, n_draw)
    reds = rng.uniform(0.1, 1.0, n_draw)
    dreds = rng.uniform(2.8, 3.8, n_draw)
    dists = rng.uniform(0.8, 1.4, n_draw)
    return models, idxs, reds, dreds, dists, n_filt


def test_posterior_predictive():
    models, idxs, reds, dreds, dists, nf = _posterior_inputs()
    data = 10 ** (-0.4 * models[idxs[0], :, 0])
    fig, ax = plt.subplots()
    plotting.posterior_predictive(models, idxs, reds, dreds, dists,
                                  data=data, data_err=data * 0.1,
                                  labels=[f"b{i}" for i in range(nf)],
                                  ax=ax)
    plt.close(fig)


def test_photometric_offsets_plots():
    models, idxs, reds, dreds, dists, nf = _posterior_inputs()
    n_obj = 30
    idxs = rng.integers(0, len(models), (n_obj, 16))
    reds = rng.uniform(0.1, 1.0, (n_obj, 16))
    dreds = rng.uniform(2.8, 3.8, (n_obj, 16))
    dists = rng.uniform(0.8, 1.4, (n_obj, 16))
    phot = 10 ** (-0.4 * models[idxs[:, 0], :, 0]) / dists[:, :1] ** 2
    err = phot * 0.05
    mask = np.ones_like(phot, bool)
    x = rng.uniform(10, 16, n_obj)
    fig, ax = plt.subplots()
    _, (centers, med) = plotting.photometric_offsets(
        phot, err, mask, models, idxs, reds, dreds, dists, x, bins=8,
        ax=ax)
    assert centers.shape == (8,)
    plt.close(fig)
    fig, ax = plt.subplots()
    plotting.photometric_offsets_2d(
        phot, err, mask, models, idxs, reds, dreds, dists, x,
        rng.uniform(0, 1, n_obj), bins=6, ax=ax)
    plt.close(fig)
