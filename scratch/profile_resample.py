"""Isolate the post-MC resample/pack stage (`posterior._batch_fns.post`)
on TPU: stage real funnel+MC outputs once, then time post_v alone on
varied inputs — all within one process so tunnel drift cancels.

Run: python scratch/profile_resample.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import build_problem, build_stars  # noqa: E402

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from brutus_tpu.config import FitConfig, PosteriorConfig          # noqa
from brutus_tpu.ops.pallas_loglike import (prepare_screen,        # noqa
                                           loglike_grid_screened)
from brutus_tpu.ops import posterior as P                         # noqa

M, F, B = 750_000, 8, 128
NIT = 4
(mc, flux, err, idx, feh, loga, parallax, parallax_err) = \
    build_problem(M, F, B, seed=0)
coord = jnp.asarray([204.7, -19.2], jnp.float32)
dust_dist = jnp.linspace(0.05, 10.0, 120, dtype=jnp.float32)
dust_mean = jnp.linspace(0.0, 1.5, 120, dtype=jnp.float32)
dust_std = jnp.full(120, 0.2, jnp.float32)

fit_cfg = FitConfig(mag_direct_init=True)
post_cfg = PosteriorConfig()

coeffs_t, packed, aux_names, n_real, maskrow = prepare_screen(
    mc, aux=dict(lnprior=np.zeros(M, np.float32),
                 feh=feh.astype(np.float32),
                 loga=loga.astype(np.float32)), tile=512)


def upto_mc(ct, pk, mr, keys, f, e, plx, plx_err):
    res = loglike_grid_screened(
        f, e, jnp.ones_like(f, bool), ct, pk, mr, n_real,
        parallax=plx, parallax_err=plx_err, cfg=fit_cfg,
        tile=512, screen_k=8192, screen_block=256,
        aux_names=aux_names)
    gidx = res.pop("global_idx")
    aux = res.pop("aux")
    out = P.lnpost_batch(keys, res, aux["lnprior"], coord,
                         parallax=plx, parallax_err=plx_err,
                         feh=aux["feh"], loga=aux["loga"],
                         dust_profile=(dust_dist, dust_mean, dust_std),
                         global_idx=gidx, cfg=post_cfg, tile=256,
                         stop_after="mc")
    return out, gidx


jup = jax.jit(upto_mc)

staged = []
for i in range(NIT):
    f_i, e_i, _, p_i, pe_i = build_stars(mc, B, seed=1000 + i)
    keys = jax.random.split(jax.random.PRNGKey(i + 1), B)
    (sel_t, lnmc, dist_k, red_k, dred_k, agg), gidx = jup(
        coeffs_t, packed, maskrow, keys,
        jnp.asarray(f_i), jnp.asarray(e_i),
        jnp.asarray(p_i), jnp.asarray(pe_i))
    jax.block_until_ready(lnmc)
    staged.append((sel_t, lnmc, dist_k, red_k, dred_k, agg, gidx))
print(f"# staged {NIT} batches; lnmc {staged[0][1].shape} "
      f"K={staged[0][0]['lnp_sel'].shape}", file=sys.stderr)

_, post_v = P._batch_fns(post_cfg,
                         __import__('brutus_tpu.config',
                                    fromlist=['GalPriorConfig']
                                    ).GalPriorConfig(),
                         __import__('brutus_tpu.config',
                                    fromlist=['DustPriorConfig']
                                    ).DustPriorConfig(),
                         True, True, True, True, True,
                         bool(post_cfg.kernel_rng))


def timeit(fn, label, reps=3):
    outs = [fn(*s) for s in staged]          # compile+warm
    jax.block_until_ready(outs)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*s) for s in staged]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) * 1e3 / NIT)
    print(f"{label}: {best:.2f} ms/batch")
    return outs


timeit(lambda *s: post_v(*s[:6], s[6]), "post_v (current)")

# --- variant: no final pack, just the big dmr matmul path ---
import math                                    # noqa: E402
nmc = post_cfg.n_mc_prior
hi = jax.lax.Precision.HIGHEST


def dmr_only(sel, lnmc, dist_k, red_k, dred_k, agg, gidx):
    def one(sel, lnmc, dist_k, red_k, dred_k, agg, gidx):
        lnp_sel = sel["lnp_sel"]
        K = lnp_sel.shape[0]
        idxs = P._categorical_cdf(sel["kidx"], lnp_sel, post_cfg.n_draws)
        oh = (idxs[:, None] == jnp.arange(K, dtype=jnp.int32)[None, :]
              ).astype(jnp.bfloat16)
        dm = jnp.concatenate([lnmc[:nmc], dist_k[:nmc], red_k[:nmc],
                              dred_k[:nmc]], axis=0)
        dmr = jnp.matmul(dm, oh.T, precision=hi).T
        return dmr
    return jax.vmap(one)(sel, lnmc, dist_k, red_k, dred_k, agg, gidx)


timeit(jax.jit(dmr_only), "cdf+oh+concat+dmr only")


def dmr_split(sel, lnmc, dist_k, red_k, dred_k, agg, gidx):
    def one(sel, lnmc, dist_k, red_k, dred_k, agg, gidx):
        lnp_sel = sel["lnp_sel"]
        K = lnp_sel.shape[0]
        idxs = P._categorical_cdf(sel["kidx"], lnp_sel, post_cfg.n_draws)
        oh = (idxs[:, None] == jnp.arange(K, dtype=jnp.int32)[None, :]
              ).astype(jnp.bfloat16)
        dm = jnp.concatenate([lnmc[:nmc], dist_k[:nmc], red_k[:nmc],
                              dred_k[:nmc]], axis=0)
        h = dm.astype(jnp.bfloat16)
        r = dm - h.astype(dm.dtype)
        m = r.astype(jnp.bfloat16)
        l = (r - m.astype(dm.dtype)).astype(jnp.bfloat16)
        st = jnp.concatenate([h, m, l], axis=0)       # (3*4nmc, K) bf16
        out = jnp.matmul(st, oh.T,
                         preferred_element_type=jnp.float32)
        n = dm.shape[0]
        dmr = (out[:n] + out[n:2 * n] + out[2 * n:]).T
        return dmr
    return jax.vmap(one)(sel, lnmc, dist_k, red_k, dred_k, agg, gidx)


timeit(jax.jit(dmr_split), "cdf+oh+split3-bf16 dmr")


def cdf_only(sel, lnmc, dist_k, red_k, dred_k, agg, gidx):
    def one(sel, lnmc, dist_k, red_k, dred_k, agg, gidx):
        lnp_sel = sel["lnp_sel"]
        idxs = P._categorical_cdf(sel["kidx"], lnp_sel, post_cfg.n_draws)
        return idxs
    return jax.vmap(one)(sel, lnmc, dist_k, red_k, dred_k, agg, gidx)


timeit(jax.jit(cdf_only), "categorical cdf only")


# --- bisect _categorical_cdf ---
def sm_only(sel, lnmc, dist_k, red_k, dred_k, agg, gidx):
    def one(sel, *_):
        return jax.nn.softmax(sel["lnp_sel"])
    return jax.vmap(one)(sel, lnmc, dist_k, red_k, dred_k, agg, gidx)


timeit(jax.jit(sm_only), "softmax only")


def sm_cumsum(sel, lnmc, dist_k, red_k, dred_k, agg, gidx):
    def one(sel, *_):
        return jnp.cumsum(jax.nn.softmax(sel["lnp_sel"]))
    return jax.vmap(one)(sel, lnmc, dist_k, red_k, dred_k, agg, gidx)


timeit(jax.jit(sm_cumsum), "softmax+cumsum")


def cmp_count(sel, lnmc, dist_k, red_k, dred_k, agg, gidx):
    def one(sel, *_):
        cdf = jnp.cumsum(jax.nn.softmax(sel["lnp_sel"]))
        u = jax.random.uniform(sel["kidx"], (post_cfg.n_draws,),
                               cdf.dtype) * cdf[-1]
        return jnp.sum((cdf[None, :] < u[:, None]), axis=1)
    return jax.vmap(one)(sel, lnmc, dist_k, red_k, dred_k, agg, gidx)


timeit(jax.jit(cmp_count), "softmax+cumsum+compare-count")


def cmp_count_f32(sel, lnmc, dist_k, red_k, dred_k, agg, gidx):
    def one(sel, *_):
        cdf = jnp.cumsum(jax.nn.softmax(sel["lnp_sel"]))
        u = jax.random.uniform(sel["kidx"], (post_cfg.n_draws,),
                               cdf.dtype) * cdf[-1]
        return jnp.sum((cdf[None, :] < u[:, None]).astype(jnp.float32),
                       axis=1)
    return jax.vmap(one)(sel, lnmc, dist_k, red_k, dred_k, agg, gidx)


timeit(jax.jit(cmp_count_f32), "… count in f32")
