"""Photometric zero-point self-calibration (analog of 'Overview 6').

Injects a known 8% zero-point error into one band of a fitted catalog
and recovers it with the leave-one-band-out bootstrap calibration.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

from _synth import FILTERS, make_data_files, synth_catalog
from brutus_tpu.io import load_models
from brutus_tpu.offsets import photometric_offsets

paths = make_data_files()
models, labels, _ = load_models(paths["grid"], filters=FILTERS,
                                verbose=False)
good = np.isfinite(models).all(axis=(1, 2))
models = models[good]

rng = np.random.default_rng(5)
n_obj, n_samp = 60, 25
idxs = rng.integers(0, len(models), (n_obj, n_samp))
reds = rng.uniform(0.1, 0.9, (n_obj, n_samp))
dreds = rng.uniform(2.9, 3.7, (n_obj, n_samp))
dists = rng.uniform(0.6, 1.8, (n_obj, n_samp))

sed0 = (models[idxs[:, 0], :, 0]
        + reds[:, :1] * (models[idxs[:, 0], :, 1]
                         + dreds[:, :1] * models[idxs[:, 0], :, 2]))
phot = 10 ** (-0.4 * sed0) / dists[:, :1] ** 2
phot[:, 2] /= 1.08                      # inject 8% offset in band 2
err = np.abs(phot) * 0.05
mask = np.ones_like(phot, bool)

ratios, ratios_err, nratio = photometric_offsets(
    phot, err, mask, models, idxs, reds, dreds, dists, Nmc=80,
    verbose=False)
for f, r, e in zip(FILTERS, ratios, ratios_err):
    print(f"{f:10s} offset {r:.4f} +/- {e:.4f}")
print(f"\ninjected 1.080 in {FILTERS[2]}; recovered {ratios[2]:.3f}")
