"""Shared synthetic fixtures for the examples.

The reference's demo notebooks (Overview 0-6) rely on ~GB-scale data
products from the Harvard Dataverse (model grids, BC neural networks,
the Bayestar dust map).  These examples are self-contained: they build
small schema-identical synthetic stand-ins so every pipeline runs end
to end out of the box.  Swap the paths for the real files (see
`brutus_tpu.io.DATAVERSE_DOIS`) to reproduce the reference demos.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import os
import tempfile

import numpy as np

from brutus_tpu.models.nn import write_nn_file
from brutus_tpu.models.tracks import write_tracks_file
from brutus_tpu.models.isochrone import write_isochrone_file
from brutus_tpu.dustmap import write_bayestar_file
from brutus_tpu import healpix

FILTERS = ["PS_g", "PS_r", "PS_i", "PS_z", "PS_y", "2MASS_J", "2MASS_H",
           "2MASS_Ks"]
NF = len(FILTERS)
rng = np.random.default_rng(42)


def analytic_physics(mini, eep, feh, afe):
    """Smooth synthetic stellar physics (monotone age along EEP)."""
    eep = np.asarray(eep, dtype=float)
    loga = 9.0 + 0.004 * (eep - 350.0) - 1.2 * np.log10(mini)
    logt = 3.75 - 0.2 * (eep - 350.0) / 600.0 + 0.03 * feh \
        + 0.1 * np.log10(mini)
    logl = 3.5 * np.log10(mini) + 0.0015 * (eep - 202.0)
    logg = 4.4 - 0.0012 * (eep - 202.0) - 0.05 * np.log10(mini)
    return {"log_age": loga, "log_Teff": logt, "log_L": logl,
            "log_g": logg, "[Fe/H]": feh - 0.05 + 0 * eep,
            "[a/Fe]": afe + 0 * eep, "star_mass": mini + 0 * eep,
            "log_R": 0.5 * logl - 2 * (logt - 3.76)}


def workdir():
    d = os.path.join(tempfile.gettempdir(), "brutus_tpu_examples")
    os.makedirs(d, exist_ok=True)
    return d


def make_data_files():
    """Write synthetic track/NN/isochrone/dust files; return paths."""
    d = workdir()
    paths = {"tracks": f"{d}/tracks.h5", "nn": f"{d}/nn.h5",
             "iso": f"{d}/iso.h5", "dust": f"{d}/dust.h5",
             "grid": f"{d}/grid.h5"}

    write_tracks_file(paths["tracks"], np.arange(0.5, 2.01, 0.1),
                      np.arange(202.0, 606.0, 8.0),
                      np.arange(-1.0, 0.55, 0.25), np.array([0.0]),
                      analytic_physics)

    h = 8
    xmin = np.array([2000.0, 0.0, -3.0, -0.3, 0.0, 1.0])
    xmax = np.array([20000.0, 6.0, 1.0, 0.7, 2.5, 6.0])
    # Weight scales chosen so the bolometric corrections vary by
    # ~1-2 mag across the label grid (like the real C3K networks):
    # with sigma ~0.5 the double sigmoid squashes the BCs to ~0.02 mag
    # of total color variation, leaving the likelihood unable to
    # discriminate models (every model fits every star — a flat,
    # physically absurd grid).
    write_nn_file(paths["nn"], FILTERS,
                  rng.normal(size=(NF, h, 6)) * 5.0,
                  rng.normal(size=(NF, h, 1)) * 1.0,
                  rng.normal(size=(NF, h, h)) * 1.5,
                  rng.normal(size=(NF, h, 1)) * 0.5,
                  rng.normal(size=(NF, 1, h)) * 6.0,
                  rng.normal(size=(NF, 1, 1)) * 0.3, xmin, xmax)

    feh_u = np.arange(-1.0, 0.55, 0.25)
    afe_u = np.array([0.0])
    loga_u = np.arange(8.5, 10.05, 0.25)
    eep_u = np.arange(202.0, 606.0, 6.0)
    labels = ["mini", "mass", "logl", "logt", "logr", "logg",
              "feh_surf", "afe_surf"]
    grid = np.full((len(feh_u), 1, len(loga_u), len(eep_u), len(labels)),
                   np.nan)
    for i, z in enumerate(feh_u):
        for k, la in enumerate(loga_u):
            mini = 10 ** ((9.0 + 0.004 * (eep_u - 350.0) - la) / 1.2)
            ok = (mini > 0.3) & (mini < 2.5)
            p = analytic_physics(mini, eep_u, z, 0.0)
            for j, (col, key) in enumerate(zip(
                    labels, ["star_mass", "star_mass", "log_L", "log_Teff",
                             "log_R", "log_g", None, None])):
                if col == "mini":
                    v = mini
                elif col == "feh_surf":
                    v = np.full_like(eep_u, z - 0.05)
                elif col == "afe_surf":
                    v = np.zeros_like(eep_u)
                else:
                    v = p[key]
                grid[i, 0, k, :, j] = np.where(ok, v, np.nan)
    write_isochrone_file(paths["iso"], feh_u, afe_u, loga_u, eep_u, grid,
                         labels)

    # Dust map covering the Orion sightline region.
    nside = 64
    ls = rng.uniform(200, 210, 200)
    bs = rng.uniform(-24, -14, 200)
    pix = np.unique(healpix.lb2pix(nside, ls, bs))
    dists = np.linspace(0.05, 5.0, 24)
    av_mean = np.tile(np.clip(np.linspace(0, 1.2, 24), 0, None),
                      (len(pix), 1))
    av_std = np.full((len(pix), 24), 0.2)
    write_bayestar_file(paths["dust"], np.full(len(pix), nside), pix,
                        dists, av_mean, av_std)
    return paths


def synth_catalog(models, n_star=64, seed=7, snr=60.0):
    """Noisy star catalog generated from grid models at random
    distances/extinctions, plus parallaxes and Orion-field coords."""
    r = np.random.default_rng(seed)
    M = len(models)
    idx = r.integers(0, M, n_star)
    av = r.uniform(0.1, 1.2, n_star)
    rv = r.uniform(2.9, 3.7, n_star)
    dist = r.uniform(0.3, 2.5, n_star)
    sed = (models[idx, :, 0] + av[:, None] *
           (models[idx, :, 1] + rv[:, None] * models[idx, :, 2]))
    flux = 10 ** (-0.4 * sed) / dist[:, None] ** 2
    err = flux / snr
    flux = flux + r.normal(size=flux.shape) * err
    parallax = 1.0 / dist + r.normal(size=n_star) * 0.02 / dist
    coords = np.c_[r.uniform(203, 206, n_star), r.uniform(-21, -17, n_star)]
    return dict(flux=flux, err=err, mask=np.ones_like(flux, bool),
                idx=idx, av=av, rv=rv, dist=dist, parallax=parallax,
                parallax_err=0.02 / dist, coords=coords)
