"""Honest posterior stage timing on funnel-shaped inputs (B=64, P=16k).

Varied inputs per rep + forced readback; stage N includes stages < N,
so the marginal cost of stage N is the difference to the previous line.
"""

import math
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

sys.path.insert(0, "/root/repo")
from bench import build_problem, build_stars
from brutus_tpu.config import (FitConfig, PosteriorConfig, GalPriorConfig,
                               DustPriorConfig)
from brutus_tpu.ops import pallas_loglike as PL
from brutus_tpu.ops.posterior import _psd_repair, _cull_mask, NEG_BIG
from brutus_tpu.priors import (gal_lnprior, dust_lnprior,
                               parallax_lnprior, scale_parallax_lnprior)
from brutus_tpu.utils import inverse3_stable, cholesky3_stable, mvn3_transform
from brutus_tpu.ops.pallas_loglike import icov_from_parts

M, F, B = 750_000, 8, 64
NREP = 6
(mc, _, _, _, feh, loga, _, _) = build_problem(M, F, B, seed=0)
cfg = PosteriorConfig()
gal_cfg, dust_cfg = GalPriorConfig(), DustPriorConfig()
fit_cfg = FitConfig(mag_direct_init=True)
coord = jnp.asarray([204.7, -19.2], jnp.float32)
dust = (jnp.linspace(0.05, 10.0, 120, dtype=jnp.float32),
        jnp.linspace(0.0, 1.5, 120, dtype=jnp.float32),
        jnp.full(120, 0.2, jnp.float32))

coeffs_t, packed, aux_names, n_real, maskrow = PL.prepare_screen(
    mc, aux=dict(lnprior=np.zeros(M, np.float32),
                 feh=feh.astype(np.float32),
                 loga=loga.astype(np.float32)), tile=512)

reps = []
for s in range(NREP):
    flux, err, idx, plx, plxe = build_stars(mc, B, seed=500 + s)
    res = PL.loglike_grid_screened(
        jnp.asarray(flux), jnp.asarray(err), jnp.ones((B, F), bool),
        coeffs_t, packed, maskrow, n_real, parallax=jnp.asarray(plx),
        parallax_err=jnp.asarray(plxe), cfg=fit_cfg, tile=512,
        screen_k=16384, aux_names=aux_names)
    gidx = res.pop("global_idx")
    aux = res.pop("aux")
    reps.append((res, gidx, aux, jnp.asarray(plx), jnp.asarray(plxe)))
jax.block_until_ready(reps)


def staged(key, results, gidx, lnprior_grid, feh_g, loga_g, plx, plx_err,
           stage):
    lnlike = results["lnlike"]
    chi2 = results["chi2"]
    scale, av, rv = results["scale"], results["av"], results["rv"]
    icov_parts = results["icov_parts"]
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

    fields = [lnlike, scale, av, lnprob, lnprior_grid, feh_g, loga_g]
    packed_f = jnp.stack(fields, axis=-1)[pre_idx]
    (lnlike_s, scale_s, av_s, lnprob_s, lnprior_s, feh_s,
     loga_s) = [packed_f[:, i] for i in range(7)]
    if stage == 2:
        return sum(x.sum() for x in (lnlike_s, scale_s, av_s, lnprob_s,
                                     lnprior_s, feh_s, loga_s))

    mask1 = lnprob_s > lnprob_max + math.log(cfg.wt_thresh)
    dist = 1.0 / jnp.sqrt(jnp.maximum(scale_s, 1e-300))
    lnp_mle = lnlike_s + lnprior_s
    lnp_mle = lnp_mle + gal_lnprior(dist, coord, feh=feh_s, loga=loga_s,
                                    cfg=gal_cfg)
    lnp_mle = lnp_mle + dust_lnprior(dist, av_s, av_dist, av_mean, av_std,
                                     dust_cfg)
    lnp_mle = jnp.where(mask1 & jnp.isfinite(lnp_mle), lnp_mle, NEG_BIG)
    mask2 = (lnp_mle > jnp.max(lnp_mle) + math.log(cfg.wt_thresh)) & mask1
    lnp_sel = jnp.where(mask2, lnlike_s + lnprior_s, NEG_BIG)
    if stage == 3:
        return lnp_sel.sum()

    sel_idx = pre_idx
    valid = lnp_sel > NEG_BIG / 2
    packed_k = jnp.stack((rv, chi2) + tuple(icov_parts), axis=-1)[sel_idx]
    rv_k, chi2_k = packed_k[:, 0], packed_k[:, 1]
    icov_k = icov_from_parts(tuple(packed_k[:, 2 + i] for i in range(6)))
    scale_k, av_k = scale_s, av_s
    feh_k, loga_k = feh_s, loga_s
    if stage == 4:
        return rv_k.sum() + chi2_k.sum() + icov_k.sum()

    cov_k = inverse3_stable(icov_k)
    if stage == 5:
        return cov_k.sum()
    icov_k, cov_k = _psd_repair(icov_k, cov_k, scale_k, valid, cfg)
    if stage == 6:
        return cov_k.sum()

    kmvn, kidx, kmc = jax.random.split(key, 3)
    mean = jnp.stack([scale_k, av_k, rv_k], axis=-1)
    L = cholesky3_stable(cov_k + cfg.mvn_eps * jnp.eye(3, dtype=dtype))
    z = jax.random.normal(kmvn, (K, 3, Nmc), dtype=dtype)
    samps = mvn3_transform(mean, L, z)
    s_mc, a_mc, r_mc = samps[:, 0], samps[:, 1], samps[:, 2]
    if stage == 7:
        return samps.sum()

    par_mc = jnp.sqrt(jnp.maximum(s_mc, 1e-300))
    dist_mc = 1.0 / par_mc
    lnp_mc = gal_lnprior(dist_mc, coord, feh=feh_k[:, None],
                         loga=loga_k[:, None], cfg=gal_cfg)
    if stage == 8:
        return lnp_mc.sum()
    lnp_mc = lnp_mc + dust_lnprior(dist_mc, a_mc, av_dist, av_mean,
                                   av_std, dust_cfg)
    if stage == 9:
        return lnp_mc.sum()
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
    if stage == 10:
        return lnp_sel.sum()

    log_evid = logsumexp(lnp_sel)
    idxs = jax.random.categorical(kidx, lnp_sel, shape=(cfg.n_draws,))
    imc = jax.random.categorical(kmc, lnp_mc[idxs], axis=-1)
    return log_evid + idxs.sum() + imc.sum() + dist_mc[idxs, imc].sum()


names = ["0 plx prior+max (B,P)", "1 +approx_max_k P->K",
         "2 +packed 7-field gather", "3 +MLE priors/culls",
         "4 +packed 8-field K gather", "5 +inverse3",
         "6 +psd repair x8", "7 +chol+mvn draws", "8 +gal prior MC",
         "9 +dust prior MC", "10 +plx/integrate", "11 +resample"]
prev = 0.0
for st in range(12):
    fn = jax.jit(jax.vmap(partial(staged, stage=st)))
    f = lambda rep, k: fn(jax.random.split(k, B), rep[0], rep[1],
                          rep[2]["lnprior"], rep[2]["feh"], rep[2]["loga"],
                          rep[3], rep[4])
    out = f(reps[0], jax.random.PRNGKey(99))
    np.asarray(out)
    t0 = time.perf_counter()
    for i in range(NREP):
        out = f(reps[i], jax.random.PRNGKey(i))
        np.asarray(out)
    dt = (time.perf_counter() - t0) / NREP * 1e3
    print(f"{names[st]:28s} {dt:8.2f} ms  (+{dt-prev:6.2f})")
    prev = dt
