"""Smoke + parity: model-sharded funnel vs single-device funnel."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')

import numpy as np
import jax.numpy as jnp
from brutus_tpu.fitting import BruteForce
from brutus_tpu.parallel import make_mesh

rng = np.random.default_rng(42)
M, F, B = 4096, 8, 16
mc = np.stack([rng.uniform(8.0, 16.0, (M, F)),
               rng.uniform(0.4, 1.1, (M, F)),
               rng.uniform(0.05, 0.2, (M, F))], axis=-1).astype(np.float32)
idx = rng.integers(0, M, B)
av = rng.uniform(0.1, 1.2, B)
rv = rng.uniform(2.8, 3.8, B)
dist = rng.uniform(0.5, 2.0, B)
sed = mc[idx, :, 0] + av[:, None] * (mc[idx, :, 1] + rv[:, None] * mc[idx, :, 2])
flux = 10 ** (-0.4 * sed) / dist[:, None] ** 2
err = flux / 60.0
flux = (flux + rng.normal(size=flux.shape) * err).astype(np.float32)

ltype = np.dtype([("mini", float), ("feh", float), ("loga", float)])
labels = np.zeros(M, dtype=ltype)
labels["mini"] = rng.uniform(0.5, 2.0, M)
labels["feh"] = rng.uniform(-2.0, 0.3, M)
labels["loga"] = rng.uniform(8.0, 10.1, M)
mask = np.ones(flux.shape, bool)
coords = np.tile([204.7, -19.2], (B, 1))
kw = dict(save_file=None, data_coords=coords,
          parallax=1.0 / dist, parallax_err=0.05 / dist,
          Nmc_prior=16, Ndraws=64, n_sel_max=64,
          verbose=False, return_results=True)

mesh = make_mesh(n_data=2, n_model=4)
out_s = BruteForce(mc, labels).fit(flux, err.astype(np.float32), mask,
                                   batch_size=16, engine="fused",
                                   tile=128, screen_k=512, mesh=mesh,
                                   **kw)
print("sharded ok:", np.asarray(out_s["log_evidence"]).round(2))

out_1 = BruteForce(mc, labels).fit(flux, err.astype(np.float32), mask,
                                   batch_size=16, engine="fused",
                                   tile=128, screen_k=512, **kw)
print("single ok :", np.asarray(out_1["log_evidence"]).round(2))

e1 = np.asarray(out_1["log_evidence"])
es = np.asarray(out_s["log_evidence"])
d = np.abs(e1 - es)
print("max |d evid|:", d.max())
hit = (np.asarray(out_s["model_idx"]) == idx[:, None]).mean()
print("hit rate sharded:", hit)
gi1 = np.sort(np.asarray(out_1["sel_idx"]), axis=1)
gis = np.sort(np.asarray(out_s["sel_idx"]), axis=1)
print("sel_idx equal:", (gi1 == gis).mean())
