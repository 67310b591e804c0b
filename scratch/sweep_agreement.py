"""Sweep seeds for fused-vs-XLA log-evidence divergence (CPU,
interpret-mode kernels).  Usage: python scratch/sweep_agreement.py
[n_seeds] [kernel_flux_iters]"""
import os, sys
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
import jax
jax.config.update('jax_platforms', 'cpu')

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from brutus_tpu.fitting import BruteForce
import brutus_tpu.ops.pallas_loglike as pk


def problem(rng, n_model=300, n_filt=8, n_star=8):
    mc = np.stack([rng.uniform(8.0, 16.0, (n_model, n_filt)),
                   rng.uniform(0.4, 1.1, (n_model, n_filt)),
                   rng.uniform(0.05, 0.2, (n_model, n_filt))],
                  axis=-1).astype(np.float32)
    idx = rng.integers(0, n_model, n_star)
    av = rng.uniform(0.1, 1.2, n_star)
    rv = rng.uniform(2.8, 3.8, n_star)
    dist = rng.uniform(0.5, 2.0, n_star)
    sed = (mc[idx, :, 0] + av[:, None] * (mc[idx, :, 1]
                                          + rv[:, None] * mc[idx, :, 2]))
    flux = 10 ** (-0.4 * sed) / dist[:, None] ** 2
    err = flux / 60.0
    flux = flux + rng.normal(size=flux.shape) * err
    return (mc, flux.astype(np.float32), err.astype(np.float32), idx,
            dist)


def run(seed, flux_iters):
    rng = np.random.default_rng(seed)
    mc, flux, err, idx, dist = problem(rng)
    ltype = np.dtype([("mini", float), ("feh", float), ("loga", float)])
    labels = np.zeros(len(mc), dtype=ltype)
    labels["mini"] = rng.uniform(0.5, 2.0, len(mc))
    labels["feh"] = rng.uniform(-2.0, 0.3, len(mc))
    labels["loga"] = rng.uniform(8.0, 10.1, len(mc))
    mask = np.ones(flux.shape, bool)
    coords = np.tile([204.7, -19.2], (len(flux), 1))
    kw = dict(save_file=None, data_coords=coords,
              parallax=1.0 / dist,
              parallax_err=0.05 / dist,
              Nmc_prior=16, Ndraws=64, n_sel_max=64,
              verbose=False, return_results=True)
    import brutus_tpu.fitting as F
    from brutus_tpu.config import FitConfig as FC
    F.FitConfig = lambda **k: FC(kernel_flux_iters=flux_iters, **k)
    orig = pk.pl.pallas_call
    pk.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        out_f = BruteForce(mc, labels).fit(flux, err, mask, batch_size=8,
                                           engine="fused", tile=128, **kw)
    finally:
        pk.pl.pallas_call = orig
    out_x = BruteForce(mc, labels).fit(flux, err, mask, batch_size=8,
                                       engine="xla", **kw)
    d = np.abs(np.asarray(out_f["log_evidence"])
               - np.asarray(out_x["log_evidence"]))
    return d


if __name__ == "__main__":
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    fi = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    worst = 0.0
    for s in range(n_seeds):
        d = run(105 + s, fi)
        print(f"seed={105+s} flux_iters={fi} max|d|={d.max():.3f} "
              f"frac<0.5={np.mean(d < 0.5):.2f} d={np.round(d, 2)}",
              flush=True)
        worst = max(worst, d.max())
    print(f"WORST {worst:.3f}")
