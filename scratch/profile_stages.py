"""Stage-level timing of the full fit pipeline on the real TPU.

Times (B=16, M=750k): loglike (xla), posterior total, and posterior
sub-stages (prior eval at MLE, top-k+gathers, MC integration incl.
dust/gal priors on draws, resampling) by building each as a separate
jitted function.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import build_problem
from brutus_tpu.config import FitConfig, PosteriorConfig
from brutus_tpu.ops.optimize import loglike_grid
from brutus_tpu.ops.posterior import lnpost_grid

M, F, B = 750_000, 8, 16
(mc, flux, err, idx, feh, loga, parallax, parallax_err) = build_problem(M, F, B)
coord = jnp.asarray([204.7, -19.2], jnp.float32)
dust_dist = jnp.linspace(0.05, 10.0, 120, dtype=jnp.float32)
dust_mean = jnp.linspace(0.0, 1.5, 120, dtype=jnp.float32)
dust_std = jnp.full(120, 0.2, jnp.float32)

fit_cfg = FitConfig(mag_direct_init=True)
post_cfg = PosteriorConfig(n_mc_prior=50, n_draws=250, n_sel_max=4096,
                           prefilter_k=8192)

mc_d = jnp.asarray(mc)
feh_d = jnp.asarray(feh, jnp.float32)
loga_d = jnp.asarray(loga, jnp.float32)
lnprior = jnp.zeros(M, jnp.float32)
fx, ex = jnp.asarray(flux), jnp.asarray(err)
px, pxe = jnp.asarray(parallax), jnp.asarray(parallax_err)
keys = jax.random.split(jax.random.PRNGKey(0), B)


def timeit(name, fn, *args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.1f} ms/batch-{B}  -> {B/dt:8.1f} stars/s")
    return out


# --- stage 1: loglike ---
ll = jax.jit(jax.vmap(
    lambda f, e, p, pe: loglike_grid(f, e, jnp.ones_like(f, bool), mc_d,
                                     parallax=p, parallax_err=pe, cfg=fit_cfg)))
res = timeit("loglike (xla, direct_init)", ll, fx, ex, px, pxe)

# --- stage 2: posterior ---
post = jax.jit(jax.vmap(
    lambda k, r, p, pe: lnpost_grid(k, r, lnprior, coord, parallax=p,
                                    parallax_err=pe, feh=feh_d, loga=loga_d,
                                    dust_profile=(dust_dist, dust_mean, dust_std),
                                    cfg=post_cfg)))
timeit("posterior (full)", post, keys, res, px, pxe)

# posterior without dust prior
post_nodust = jax.jit(jax.vmap(
    lambda k, r, p, pe: lnpost_grid(k, r, lnprior, coord, parallax=p,
                                    parallax_err=pe, feh=feh_d, loga=loga_d,
                                    dust_profile=None, cfg=post_cfg)))
timeit("posterior (no dust prior)", post_nodust, keys, res, px, pxe)

# posterior without feh/loga (gal mixture priors off)
post_nogal = jax.jit(jax.vmap(
    lambda k, r, p, pe: lnpost_grid(k, r, lnprior, coord, parallax=p,
                                    parallax_err=pe, feh=None, loga=None,
                                    dust_profile=(dust_dist, dust_mean, dust_std),
                                    cfg=post_cfg)))
timeit("posterior (no feh/loga mixtures)", post_nogal, keys, res, px, pxe)

# posterior with smaller prefilter
for pk in (4096, 16384):
    cfgp = PosteriorConfig(n_mc_prior=50, n_draws=250, n_sel_max=4096,
                           prefilter_k=pk)
    post_p = jax.jit(jax.vmap(
        lambda k, r, p, pe: lnpost_grid(k, r, lnprior, coord, parallax=p,
                                        parallax_err=pe, feh=feh_d, loga=loga_d,
                                        dust_profile=(dust_dist, dust_mean, dust_std),
                                        cfg=cfgp)))
    timeit(f"posterior (prefilter_k={pk})", post_p, keys, res, px, pxe)

# loglike without direct init
cfg2 = FitConfig(mag_direct_init=False)
ll2 = jax.jit(jax.vmap(
    lambda f, e, p, pe: loglike_grid(f, e, jnp.ones_like(f, bool), mc_d,
                                     parallax=p, parallax_err=pe, cfg=cfg2)))
timeit("loglike (no direct init)", ll2, fx, ex, px, pxe)
