"""Cluster isochrone fitting (analog of 'Overview 5' / NGC 2682 demo).

Generates a synthetic co-eval cluster from the Isochrone model and
profiles the joint likelihood over age and distance.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

from _synth import FILTERS, make_data_files
from brutus_tpu.models import Isochrone
from brutus_tpu.cluster import isochrone_loglike  # noqa: F401

paths = make_data_files()
iso = Isochrone(filters=FILTERS, nnfile=paths["nn"],
                mistfile=paths["iso"], verbose=False)

true = dict(feh=-0.25, loga=9.25, av=0.35, rv=3.3, dist=900.0)
rng = np.random.default_rng(3)
seds, p1, _ = iso.get_seds(eep=np.linspace(240, 460, 60), **true,
                           mini_bound=0.4)
seds = np.asarray(seds)
ok = np.isfinite(seds).all(axis=1)
phot = 10 ** (-0.4 * seds[ok][:25])
err = phot * 0.02
phot = phot + rng.normal(size=phot.shape) * err
print(f"synthetic cluster: {len(phot)} members, {phot.shape[1]} bands")

eep_grid = np.linspace(202.0, 600.0, 400)

def loglike(loga, dist):
    theta = np.array([true["feh"], loga, true["av"], true["rv"],
                      dist, 0.05])
    return isochrone_loglike(theta, iso, phot, err, smf_grid=np.array([0.0]),
                             eep_grid=eep_grid, mini_bound=0.4,
                             parallax=np.full(len(phot), 1e3 / true["dist"]),
                             parallax_err=np.full(len(phot), 0.05))

logas = np.arange(8.75, 9.80, 0.125)
dists = np.arange(700.0, 1150.0, 50.0)
grid = np.array([[loglike(a, d) for d in dists] for a in logas])
ia, idd = np.unravel_index(np.argmax(grid), grid.shape)
print(f"best loga={logas[ia]:.3f} (true {true['loga']}), "
      f"dist={dists[idd]:.0f} pc (true {true['dist']:.0f})")

# Full posterior sampling with the built-in TPU-native ensemble
# sampler (no external dynesty needed): free (feh, loga, av, dist),
# fixed rv / outlier fraction.
from brutus_tpu.cluster import fit_cluster

out = fit_cluster(
    iso, phot, err,
    parallax=np.full(len(phot), 1e3 / true["dist"]),
    parallax_err=np.full(len(phot), 0.05),
    cluster_params=[None, None, None, true["rv"], None, 0.05],
    smf_grid=np.array([0.0]), eep_grid=eep_grid, mini_bound=0.4,
    bounds=dict(av=(0.0, 2.0), dist=(600.0, 1500.0)),
    n_walkers=32, n_steps=1200, n_burn=800, seed=1)
med = np.median(out["samples"], axis=0)
print("fit_cluster medians:",
      {n: round(float(v), 3) for n, v in zip(out["names"], med)},
      f"acceptance={out['acceptance']:.2f}",
      f"max rhat={out['rhat'].max():.2f}")
