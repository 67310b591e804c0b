"""Fit individual stars against a model grid (analog of 'Overview 3').

Loads the grid written by 01_generate_grid.py, synthesizes a noisy
catalog from it, runs the full `BruteForce` pipeline (parallax +
Galactic + 3-D dust priors, MC posterior integration, resampling) and
summarizes the recovered distances/reddenings.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import os

import numpy as np

from _synth import FILTERS, make_data_files, synth_catalog, workdir
from brutus_tpu.io import load_models, load_results
from brutus_tpu.fitting import BruteForce

paths = make_data_files()
if not os.path.exists(paths["grid"]):
    raise SystemExit("run 01_generate_grid.py first")

models, labels, lmask = load_models(paths["grid"], filters=FILTERS,
                                    verbose=False)
good = np.isfinite(models).all(axis=(1, 2))
models, labels = models[good], labels[good]
print(f"grid: {len(models)} usable models, {models.shape[1]} bands")

cat = synth_catalog(models, n_star=32)

bf = BruteForce(models, labels, lmask)
save = os.path.join(workdir(), "fit_results")
if os.path.exists(save + ".h5"):
    os.remove(save + ".h5")
bf.fit(cat["flux"], cat["err"], cat["mask"], save_file=save,
       parallax=cat["parallax"], parallax_err=cat["parallax_err"],
       data_coords=cat["coords"], dustfile=paths["dust"],
       Nmc_prior=50, Ndraws=250, batch_size=16, n_sel_max=512,
       verbose=True)

res = load_results(save)
d_med = np.median(res["samps_dist"], axis=1)
a_med = np.median(res["samps_red"], axis=1)
print("median |dist error|: "
      f"{np.median(np.abs(d_med - cat['dist']) / cat['dist']) * 100:.1f}%")
print(f"median |Av error|: {np.median(np.abs(a_med - cat['av'])):.3f} mag")
print(f"results file: {save}.h5 with datasets {sorted(res)}")
