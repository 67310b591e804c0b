"""Stage-level breakdown inside lnpost_grid at B=64, K=4096."""

import math
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

sys.path.insert(0, "/root/repo")
from bench import build_problem
from brutus_tpu.config import FitConfig, PosteriorConfig
from brutus_tpu.ops.optimize import loglike_grid
from brutus_tpu.ops.posterior import _psd_repair, NEG_BIG
from brutus_tpu.priors import (gal_lnprior, dust_lnprior,
                               parallax_lnprior, scale_parallax_lnprior)
from brutus_tpu.utils import inverse3_stable, cholesky3_stable, mvn3_transform
from brutus_tpu.ops.pallas_loglike import icov_from_parts

M, F, B = 750_000, 8, 64
(mc, flux, err, idx, feh, loga, parallax, parallax_err) = build_problem(M, F, B)
coord = jnp.asarray([204.7, -19.2], jnp.float32)
dust = (jnp.linspace(0.05, 10.0, 120, dtype=jnp.float32),
        jnp.linspace(0.0, 1.5, 120, dtype=jnp.float32),
        jnp.full(120, 0.2, jnp.float32))
mc_d = jnp.asarray(mc)
feh_d = jnp.asarray(feh, jnp.float32)
loga_d = jnp.asarray(loga, jnp.float32)
lnprior_d = jnp.zeros(M, jnp.float32)
fx, ex = jnp.asarray(flux), jnp.asarray(err)
px, pxe = jnp.asarray(parallax), jnp.asarray(parallax_err)
keys = jax.random.split(jax.random.PRNGKey(0), B)

res = jax.jit(jax.vmap(
    lambda f, e, p, pe: loglike_grid(f, e, jnp.ones_like(f, bool), mc_d,
                                     parallax=p, parallax_err=pe,
                                     cfg=FitConfig(mag_direct_init=True))))(
    fx, ex, px, pxe)
jax.block_until_ready(res)

cfg = PosteriorConfig()
gcfg = None


def staged(key, results, plx, plx_err, stage):
    from brutus_tpu.config import GalPriorConfig, DustPriorConfig
    gal_cfg, dust_cfg = GalPriorConfig(), DustPriorConfig()
    lnlike = results["lnlike"]
    chi2 = results["chi2"]
    scale, av, rv = results["scale"], results["av"], results["rv"]
    icov_parts = results["icov_parts"]
    ndim = results["ndim"]
    dtype = lnlike.dtype
    K = cfg.n_sel_max
    Nmc = cfg.n_mc_prior
    av_dist, av_mean, av_std = dust

    s_den0 = icov_parts[0]
    scale_err = 1.0 / jnp.sqrt(jnp.abs(s_den0))
    lnprob = lnlike + scale_parallax_lnprior(scale, scale_err, plx, plx_err)
    lnprob = jnp.where(jnp.isfinite(lnprob), lnprob, NEG_BIG)
    lnprob_max = jnp.max(lnprob)
    if stage == 0:
        return lnprob_max

    _, pre_idx = jax.lax.approx_max_k(lnprob, K, recall_target=0.95)
    if stage == 1:
        return pre_idx.sum()

    sub = lambda x: x[pre_idx]
    lnlike_s, scale_s, av_s = sub(lnlike), sub(scale), sub(av)
    lnprob_s = sub(lnprob)
    lnprior_s = sub(lnprior_d)
    feh_s, loga_s = sub(feh_d), sub(loga_d)
    if stage == 2:
        return lnlike_s.sum() + scale_s.sum() + av_s.sum() + \
            lnprob_s.sum() + lnprior_s.sum() + feh_s.sum() + loga_s.sum()

    mask1 = lnprob_s > lnprob_max + math.log(cfg.wt_thresh)
    dist = 1.0 / jnp.sqrt(jnp.maximum(scale_s, 1e-300))
    lnp_mle = lnlike_s + lnprior_s
    lnp_mle = lnp_mle + gal_lnprior(dist, coord, feh=feh_s, loga=loga_s)
    lnp_mle = lnp_mle + dust_lnprior(dist, av_s, av_dist, av_mean, av_std)
    lnp_mle = jnp.where(mask1 & jnp.isfinite(lnp_mle), lnp_mle, NEG_BIG)
    mask2 = (lnp_mle > jnp.max(lnp_mle) + math.log(cfg.wt_thresh)) & mask1
    lnp_sel = jnp.where(mask2, lnlike_s + lnprior_s, NEG_BIG)
    if stage == 3:
        return lnp_sel.sum()

    sel_idx = pre_idx
    valid = lnp_sel > NEG_BIG / 2
    take_g = lambda x: x[sel_idx]
    rv_k = take_g(rv)
    chi2_k = take_g(chi2)
    icov_k = icov_from_parts(tuple(take_g(p) for p in icov_parts))
    feh_k, loga_k = feh_s, loga_s
    scale_k, av_k = scale_s, av_s
    if stage == 4:
        return rv_k.sum() + chi2_k.sum() + icov_k.sum()

    cov_k = inverse3_stable(icov_k)
    icov_k, cov_k = _psd_repair(icov_k, cov_k, scale_k, valid, cfg)
    if stage == 5:
        return cov_k.sum()

    kmvn, kidx, kmc = jax.random.split(key, 3)
    mean = jnp.stack([scale_k, av_k, rv_k], axis=-1)
    L = cholesky3_stable(cov_k + cfg.mvn_eps * jnp.eye(3, dtype=dtype))
    z = jax.random.normal(kmvn, (K, 3, Nmc), dtype=dtype)
    samps = mvn3_transform(mean, L, z)
    s_mc, a_mc, r_mc = samps[:, 0], samps[:, 1], samps[:, 2]
    if stage == 6:
        return samps.sum()

    par_mc = jnp.sqrt(jnp.maximum(s_mc, 1e-300))
    dist_mc = 1.0 / par_mc
    lnp_mc = gal_lnprior(dist_mc, coord, feh=feh_k[:, None],
                         loga=loga_k[:, None])
    lnp_mc = lnp_mc + dust_lnprior(dist_mc, a_mc, av_dist, av_mean, av_std)
    lnp_mc = lnp_mc + parallax_lnprior(par_mc, plx, plx_err)
    inbounds = ((s_mc >= 1e-20) &
                (a_mc >= cfg.avlim[0]) & (a_mc <= cfg.avlim[1]) &
                (r_mc >= cfg.rvlim[0]) & (r_mc <= cfg.rvlim[1]))
    lnp_mc = jnp.where(inbounds & jnp.isfinite(lnp_mc), lnp_mc, NEG_BIG)
    n_eff = jnp.sum(inbounds, axis=1)
    lnp_sel = lnp_sel + logsumexp(lnp_mc, axis=1) - jnp.log(
        jnp.maximum(n_eff, 1))
    lnp_sel = jnp.where(valid & jnp.isfinite(lnp_sel) & (n_eff > 0),
                        lnp_sel, NEG_BIG)
    if stage == 7:
        return lnp_sel.sum()

    log_evid = logsumexp(lnp_sel)
    idxs = jax.random.categorical(kidx, lnp_sel, shape=(cfg.n_draws,))
    imc = jax.random.categorical(kmc, lnp_mc[idxs], axis=-1)
    return (log_evid + idxs.sum() + imc.sum() + dist_mc[idxs, imc].sum())


names = ["0 parallax prior + max", "1 +approx_max_k", "2 +subset gathers x7",
         "3 +MLE priors/culls", "4 +K gathers x8 + icov", "5 +inv+psd",
         "6 +chol+mvn draws", "7 +MC priors+integrate", "8 +resample"]
for st in range(9):
    fn = jax.jit(jax.vmap(partial(staged, stage=st)), static_argnames=())
    out = fn(keys, res, px, pxe)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(4):
        out = fn(keys, res, px, pxe)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 4
    print(f"{names[st]:32s} {dt*1e3:8.1f} ms")
