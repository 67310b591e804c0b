"""Break down the posterior stage cost at B=64 on the real TPU."""

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

M, F, B = 750_000, 8, 64
(mc, flux, err, idx, feh, loga, parallax, parallax_err) = build_problem(M, F, B)
coord = jnp.asarray([204.7, -19.2], jnp.float32)
dust = (jnp.linspace(0.05, 10.0, 120, dtype=jnp.float32),
        jnp.linspace(0.0, 1.5, 120, dtype=jnp.float32),
        jnp.full(120, 0.2, jnp.float32))
mc_d = jnp.asarray(mc)
feh_d = jnp.asarray(feh, jnp.float32)
loga_d = jnp.asarray(loga, jnp.float32)
lnprior = jnp.zeros(M, jnp.float32)
fx, ex = jnp.asarray(flux), jnp.asarray(err)
px, pxe = jnp.asarray(parallax), jnp.asarray(parallax_err)
keys = jax.random.split(jax.random.PRNGKey(0), B)

res = jax.jit(jax.vmap(
    lambda f, e, p, pe: loglike_grid(f, e, jnp.ones_like(f, bool), mc_d,
                                     parallax=p, parallax_err=pe,
                                     cfg=FitConfig(mag_direct_init=True))))(
    fx, ex, px, pxe)
jax.block_until_ready(res)


def timeit(name, fn, *args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt*1e3:9.1f} ms/batch-{B}  -> {B/dt:8.1f} stars/s")
    return out


def post_fn(cfg):
    return jax.jit(jax.vmap(
        lambda k, r, p, pe: lnpost_grid(k, r, lnprior, coord, parallax=p,
                                        parallax_err=pe, feh=feh_d,
                                        loga=loga_d, dust_profile=dust,
                                        cfg=cfg)))


base = dict(n_mc_prior=50, n_draws=250, n_sel_max=4096, prefilter_k=8192)
timeit("posterior default", post_fn(PosteriorConfig(**base)), keys, res, px, pxe)
timeit("posterior nsel=1024", post_fn(PosteriorConfig(
    **{**base, "n_sel_max": 1024})), keys, res, px, pxe)
timeit("posterior prefilter=4096", post_fn(PosteriorConfig(
    **{**base, "prefilter_k": 4096})), keys, res, px, pxe)
timeit("posterior nmc=25", post_fn(PosteriorConfig(
    **{**base, "n_mc_prior": 25})), keys, res, px, pxe)
timeit("posterior psd passes=2", post_fn(PosteriorConfig(
    **{**base, "psd_max_passes": 2})), keys, res, px, pxe)
timeit("posterior no prefilter", post_fn(PosteriorConfig(
    **{**base, "prefilter_k": 0})), keys, res, px, pxe)
