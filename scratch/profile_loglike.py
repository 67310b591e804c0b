"""Sub-stage timing of the loglike pipeline on the real TPU."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import build_problem
from brutus_tpu.config import FitConfig
from brutus_tpu.ops.optimize import (loglike_grid, prepare_star_data,
                                     optimize_mag, sed_mle, _flux_polish)

M, F, B = 750_000, 8, 16
(mc, flux, err, idx, feh, loga, parallax, parallax_err) = build_problem(M, F, B)
mc_d = jnp.asarray(mc)
fx, ex = jnp.asarray(flux), jnp.asarray(err)
px, pxe = jnp.asarray(parallax), jnp.asarray(parallax_err)
cfg = FitConfig(mag_direct_init=True)


def timeit(name, fn, *args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.1f} ms/batch-{B}")
    return out


# full loglike with iteration counts
ll = jax.jit(jax.vmap(
    lambda f, e, p, pe: loglike_grid(f, e, jnp.ones_like(f, bool), mc_d,
                                     parallax=p, parallax_err=pe, cfg=cfg)))
res = timeit("loglike full", ll, fx, ex, px, pxe)
print("   iters (mag, flux) per star:", np.asarray(res["n_iter"]).T)

# stage: mag phase only
def mag_only(f, e):
    fl, wf, mg, wm, mk, nd, tv = prepare_star_data(f, e, jnp.ones_like(f, bool), cfg)
    av0 = jnp.full((M,), cfg.av0, mc_d.dtype)
    rv0 = jnp.full((M,), cfg.rv0, mc_d.dtype)
    return optimize_mag(mg, wm, mc_d, av0, rv0, cfg)

mag_fn = jax.jit(jax.vmap(mag_only))
timeit("mag phase (direct init + alternating)", mag_fn, fx, ex)

# stage: single sed_mle
def mle_only(f, e):
    fl, wf, mg, wm, mk, nd, tv = prepare_star_data(f, e, jnp.ones_like(f, bool), cfg)
    av, rv, _ = mag_only(f, e)
    return sed_mle(fl, wf, mc_d, av, rv, cfg)[3]

timeit("mag phase + 1x sed_mle", jax.jit(jax.vmap(mle_only)), fx, ex)

# direct init alone
def di_only(f, e):
    fl, wf, mg, wm, mk, nd, tv = prepare_star_data(f, e, jnp.ones_like(f, bool), cfg)
    from brutus_tpu.ops.optimize import direct_mag_init
    return direct_mag_init(mg, wm, mc_d, cfg)

timeit("direct 3x3 mag init alone", jax.jit(jax.vmap(di_only)), fx, ex)
