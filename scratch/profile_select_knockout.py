"""Select-stage cost attribution via IN-PIPELINE config knockouts.

Times the funnel prefix up to stop_after="select" (and the
stop_after="gather" prefix as the baseline) under variants that each
disable one component; deltas attribute the stage's cost.  The
synthetic-input profiler (profile_select.py) reads garbage through the
tunnel backend's execution cache; this one uses the real jitted
pipeline with varied staged batches, which measures sanely.
Run on TPU: python scratch/profile_select_knockout.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from brutus_tpu.config import FitConfig, PosteriorConfig
from brutus_tpu.ops.pallas_loglike import (loglike_grid_screened,
                                           prepare_screen)
from brutus_tpu.ops.posterior import lnpost_batch
from bench import build_problem, build_stars

M, F, B = 750_000, 8, 128
mc, flux, err, idx, feh, loga, plx, plxe = build_problem(M, F, B, seed=0)
fit_cfg = FitConfig()
tile = 512
coeffs_t, packed, aux_names, n_real, maskrow = prepare_screen(
    mc, aux=dict(lnprior=np.zeros(M, np.float32),
                 feh=feh.astype(np.float32),
                 loga=loga.astype(np.float32)), tile=tile,
    screen_block=fit_cfg.screen_block)

dust_dist = jnp.linspace(0.05, 10.0, 120, dtype=jnp.float32)
dust_mean = jnp.linspace(0.0, 1.5, 120, dtype=jnp.float32)
dust_std = jnp.full(120, 0.2, jnp.float32)
COORD = jnp.asarray([204.7, -19.2], jnp.float32)

ZEROG = lambda dist, coord, feh=None, loga=None: jnp.zeros_like(dist)
ZEROD = lambda dist, av, av_dist, av_mean, av_std: jnp.zeros_like(av)

variants = [
    ("gather_prefix (baseline)", dict(), True, None, None, "gather"),
    ("full select", dict(), True, None, None, "select"),
    ("no_dust", dict(), False, None, None, "select"),
    ("skip_gal (in-place)", dict(debug_skip="gal"), True, None, None,
     "select"),
    ("skip_gal_dust (in-place)", dict(debug_skip="gal,dust"), True,
     None, None, "select"),
    ("full through mc", dict(), True, None, None, "mc"),
]

for name, kw, use_dust, lgal, ldust, stop in variants:
    post_cfg = PosteriorConfig(**kw)

    def stepfn(ct, pk, mr, keys, f, e, p, pe):
        res = loglike_grid_screened(
            f, e, jnp.ones_like(f, bool), ct, pk, mr, n_real,
            parallax=p, parallax_err=pe, cfg=fit_cfg, tile=tile,
            screen_k=fit_cfg.screen_k,
            screen_block=fit_cfg.screen_block, aux_names=aux_names)
        gidx = res.pop("global_idx")
        aux = res.pop("aux")
        if stop == "gather":
            return res, gidx
        dp = (dust_dist, dust_mean, dust_std) if use_dust else None
        return lnpost_batch(keys, res, aux["lnprior"], COORD,
                            parallax=p, parallax_err=pe,
                            feh=aux["feh"], loga=aux["loga"],
                            dust_profile=dp, global_idx=gidx,
                            cfg=post_cfg, stop_after=stop,
                            lngalprior=lgal, lndustprior=ldust)

    jstep = jax.jit(stepfn)
    batches = []
    for i in range(8):
        f_i, e_i, _, p_i, pe_i = build_stars(mc, B, seed=1000 + i)
        batches.append((jax.random.split(jax.random.PRNGKey(i), B),)
                       + tuple(jnp.asarray(v)
                               for v in (f_i, e_i, p_i, pe_i)))
    jax.block_until_ready(batches)
    o = jstep(coeffs_t, packed, maskrow, *batches[0])
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [jstep(coeffs_t, packed, maskrow, *b) for b in batches]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(batches) * 1e3
    print(f"{name}: screen+gather+fit+select {dt:.2f} ms/batch",
          flush=True)
