"""Diagnose the seed-105 fused-vs-XLA evidence outlier: where does the
divergence enter — likelihood (kernel convergence) or posterior stage?"""
import os, sys
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
import jax
jax.config.update('jax_platforms', 'cpu')

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from scratch.sweep_agreement import problem
from brutus_tpu.config import FitConfig
from brutus_tpu.ops.optimize import loglike_grid
from brutus_tpu.ops.pallas_loglike import (loglike_grid_fused,
                                           prepare_coeffs)

rng = np.random.default_rng(105)
mc, flux, err, idx, dist = problem(rng)
star = 6
mask = np.ones(flux.shape, bool)

for fi in (6, 8, 12, 24):
    cfg = FitConfig(mag_direct_init=True, kernel_flux_iters=fi)
    ct, n_real = prepare_coeffs(mc, tile=128)
    fused = loglike_grid_fused(jnp.asarray(flux), jnp.asarray(err),
                               jnp.asarray(mask), ct, cfg=cfg,
                               tile=128, interpret=True, n_real=n_real)
    ref = jax.vmap(lambda f, e, m: loglike_grid(f, e, m, jnp.asarray(mc),
                                                cfg=cfg))(
        jnp.asarray(flux), jnp.asarray(err), jnp.asarray(mask))
    lf = np.asarray(fused["lnlike"], np.float64)[star, :n_real]
    lr = np.asarray(ref["lnlike"], np.float64)[star]
    top = np.argsort(-lr)[:12]
    print(f"flux_iters={fi}")
    print("  top models:", top)
    print("  lnl xla  :", np.round(lr[top], 3))
    print("  lnl fused:", np.round(lf[top], 3))
    print("  d lnl    :", np.round(lf[top] - lr[top], 3))
    print("  av x/f   :", np.round(np.asarray(ref['av'])[star, top], 3),
          np.round(np.asarray(fused['av'])[star, top], 3))
    print("  rv x/f   :", np.round(np.asarray(ref['rv'])[star, top], 3),
          np.round(np.asarray(fused['rv'])[star, top], 3))
    print("  scale x/f:", np.round(np.asarray(ref['scale'])[star, top], 6),
          np.round(np.asarray(fused['scale'])[star, top], 6))
    ni = np.asarray(ref.get('n_iter'))
    print("  xla n_iter (mag, flux):", ni[star] if ni is not None else "?")
