"""Line-of-sight extinction modeling (analog of 'Overview 4').

Uses per-star (distance, Av) posterior draws to fit an N-cloud
cumulative-extinction model along a sightline.  The reference drives
this with dynesty; here the built-in TPU-native ensemble sampler
(`los.fit_clouds`, fully jitted stretch-move MCMC) fits it directly —
a grid scan of the same jitted likelihood is shown first (any external
sampler can call it the same way).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

from brutus_tpu.los import (LOS_clouds_loglike_samples,
                            LOS_clouds_priortransform, fit_clouds)

rng = np.random.default_rng(1)

# Synthetic sightline: foreground Av=0.25 plus one cloud at dm=9.0
# adding dAv=1.0.
n_star, n_draw = 200, 25
dm_true = rng.uniform(4, 19, n_star)
av_true = 0.25 + 1.0 * (dm_true > 9.0)
dsamps = dm_true[:, None] + rng.normal(0, 0.4, (n_star, n_draw))
rsamps = av_true[:, None] + rng.normal(0, 0.1, (n_star, n_draw))

# Prior transform demo (what a nested sampler would call).
u = rng.uniform(0, 1, 6)
print("prior transform of", np.round(u, 2), "->",
      np.round(LOS_clouds_priortransform(u), 2))

# Grid scan over (cloud distance, cloud reddening).
best = (-np.inf, None, None)
for d0 in np.arange(5.0, 15.0, 0.25):
    for r0 in np.arange(0.5, 2.5, 0.1):
        theta = np.array([0.02, 0.02, 0.02, 0.25, d0, r0])
        ll = LOS_clouds_loglike_samples(theta, dsamps, rsamps,
                                        kernel="gauss")
        if ll > best[0]:
            best = (ll, d0, r0)
print(f"best cloud: distance_modulus={best[1]:.2f} (true 9.0), "
      f"Av={best[2]:.2f} (true 1.25), logl={best[0]:.1f}")

# Full posterior with the built-in TPU-native ensemble sampler.
out = fit_clouds(dsamps, rsamps, n_clouds=1, n_walkers=64,
                 n_steps=2000, n_burn=1000, seed=0)
s = out["samples"]
q = lambda i: np.percentile(s[:, i], [16, 50, 84])
print(f"fit_clouds: acceptance={out['acceptance']:.2f}; "
      f"cloud dm={q(4)[1]:.2f} (+{q(4)[2]-q(4)[1]:.2f}/-{q(4)[1]-q(4)[0]:.2f}, true 9.0), "
      f"Av={q(5)[1]:.2f} (true 1.25), fg={q(3)[1]:.2f} (true 0.25)")
