"""Verify drive (round 5, ADVICE fixes): end-to-end BruteForce.fit
recovery on a synthetic grid, exercising the pack_gidx_f32 paths and
the fit_cluster fixed-spec guard through the public API."""
import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')

import numpy as np
import brutus_tpu
from brutus_tpu.fitting import BruteForce

rng = np.random.default_rng(42)
M, F = 512, 8
mags = rng.uniform(8.0, 16.0, (M, F))
r0 = rng.uniform(0.4, 1.1, (M, F))
dr = rng.uniform(0.05, 0.2, (M, F))
mc = np.stack([mags, r0, dr], axis=-1)
ltype = np.dtype([("mini", float), ("feh", float), ("loga", float)])
labels = np.zeros(M, dtype=ltype)
labels["mini"] = rng.uniform(0.5, 2.0, M)
labels["feh"] = rng.uniform(-2.0, 0.3, M)
labels["loga"] = rng.uniform(8.0, 10.1, M)

true_idx, av, rv, dist = 137, 0.5, 3.2, 1.2
sed = mc[true_idx, :, 0] + av * (mc[true_idx, :, 1] + rv * mc[true_idx, :, 2])
flux = 10 ** (-0.4 * sed) / dist ** 2
err = flux / 100.0
n = 4
data = np.tile(flux, (n, 1)) + rng.normal(size=(n, F)) * err
errs = np.tile(err, (n, 1))
coords = np.tile([204.7, -19.2], (n, 1))

bf = BruteForce(mc, labels)
out = bf.fit(data, errs, np.ones((n, F), bool), data_coords=coords,
             parallax=np.full(n, 1.0 / dist),
             parallax_err=np.full(n, 0.02),
             Nmc_prior=32, Ndraws=100, batch_size=4, n_sel_max=64,
             verbose=False, return_results=True)
dmed = np.median(out["dist"], axis=1)
amed = np.median(out["red"], axis=1)
assert np.isfinite(out["log_evidence"]).all(), out["log_evidence"]
assert np.all(np.abs(dmed - dist) / dist < 0.15), dmed
assert np.all(np.abs(amed - av) < 0.35), amed
print("fit recovery ok: dist", dmed, "av", amed)

# pack_gidx_f32 auto-set came through (M < 2**24 -> packed path used)
# and the fallback path returns the same model indices (unit-tested);
# here just confirm the public knob exists and defaults sanely.
from brutus_tpu.config import PosteriorConfig
assert PosteriorConfig().pack_gidx_f32 is True

# fit_cluster guard: "fixed" cluster_params must raise, not NaN-sample.
from brutus_tpu.cluster import fit_cluster
try:
    fit_cluster(None, data, errs, cluster_params="fixed", offsets="free")
except ValueError as e:
    assert "cluster_params" in str(e)
    print("fit_cluster fixed-spec guard ok:", str(e)[:60])
else:
    raise AssertionError("fixed spec did not raise")
print("VERIFY OK")
