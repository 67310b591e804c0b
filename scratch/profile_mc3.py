"""Honest pipelined posterior-stage timing at B=128.

Every timed (executable, inputs) pair is FRESH (never executed before)
to defeat the backend's execution memoization; stages are timed over
NREP distinct inputs with one sync at the end.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import build_problem, build_stars
from brutus_tpu.config import (FitConfig, PosteriorConfig, GalPriorConfig,
                               DustPriorConfig)
from brutus_tpu.ops import pallas_loglike as PL
from brutus_tpu.ops import posterior as PO
from brutus_tpu.ops.pallas_mc import mc_integrate

M, F, B = 750_000, 8, 128
NREP = 6
cfg = FitConfig(mag_direct_init=True)
pcfg = PosteriorConfig()
gcfg, dcfg = GalPriorConfig(), DustPriorConfig()
(mc, _, _, _, feh, loga, _, _) = build_problem(M, F, B, seed=0)
coeffs_t, packed, aux_names, n_real, maskrow = PL.prepare_screen(
    mc, aux=dict(lnprior=np.zeros(M, np.float32),
                 feh=feh.astype(np.float32),
                 loga=loga.astype(np.float32)), tile=512)
coord = jnp.asarray([204.7, -19.2], jnp.float32)
dd = jnp.linspace(0.05, 10.0, 120, dtype=jnp.float32)
dm = jnp.linspace(0.0, 1.5, 120, dtype=jnp.float32)
ds = jnp.full(120, 0.2, jnp.float32)
coord_b = jnp.broadcast_to(coord, (B, 2))
dm_b = jnp.broadcast_to(dm, (B, 120))
ds_b = jnp.broadcast_to(ds, (B, 120))

pre_v, post_v = PO._batch_fns(pcfg, gcfg, dcfg, True, True, True, True,
                              True)


def fresh_reps(n, seed0):
    reps = []
    for s in range(n):
        fl, er, idx, plx, plxe = build_stars(mc, B, seed=seed0 + s)
        res = PL.loglike_grid_screened(
            jnp.asarray(fl), jnp.asarray(er), jnp.ones((B, F), bool),
            coeffs_t, packed, maskrow, n_real, parallax=jnp.asarray(plx),
            parallax_err=jnp.asarray(plxe), cfg=cfg, tile=512,
            screen_k=16384, aux_names=aux_names)
        gidx = res.pop("global_idx")
        aux = res.pop("aux")
        reps.append((res, gidx, aux, jnp.asarray(plx), jnp.asarray(plxe),
                     jax.random.split(jax.random.PRNGKey(9000 + s), B)))
    jax.block_until_ready(reps)
    return reps


def run_pre(rep):
    res, gidx, aux, plx, plxe, keys = rep
    return pre_v(keys, res, aux["lnprior"], coord_b, plx, plxe,
                 aux["feh"], aux["loga"], dm_b, ds_b, dd, gidx)


def run_kern(sel):
    return mc_integrate(sel["tab"], sel["scal"], sel["dusttab"],
                        sel["z"], pcfg.n_mc_prior, pcfg, gcfg, dcfg,
                        True, True, True)


# warm all executables on a throwaway rep
w = fresh_reps(1, 100)[0]
ws = run_pre(w)
wk = run_kern(ws)
wo = post_v(ws, *wk, w[1])
jax.block_until_ready(wo)

# --- time pre ---
reps = fresh_reps(NREP, 200)
t0 = time.perf_counter()
sels = [run_pre(r) for r in reps]
jax.block_until_ready(sels)
print(f"pre_v       {1e3*(time.perf_counter()-t0)/NREP:7.2f} ms/batch")

# --- time kernel ---
t0 = time.perf_counter()
kouts = [run_kern(s) for s in sels]
jax.block_until_ready(kouts)
print(f"mc kernel   {1e3*(time.perf_counter()-t0)/NREP:7.2f} ms/batch")

# --- time post ---
t0 = time.perf_counter()
outs = [post_v(sels[i], *kouts[i], reps[i][1]) for i in range(NREP)]
jax.block_until_ready(outs)
print(f"post_v      {1e3*(time.perf_counter()-t0)/NREP:7.2f} ms/batch")

# --- loglike funnel itself on fresh batches ---
batches = []
for s in range(NREP):
    fl, er, idx, plx, plxe = build_stars(mc, B, seed=400 + s)
    batches.append((jnp.asarray(fl), jnp.asarray(er),
                    jnp.asarray(plx), jnp.asarray(plxe)))
jax.block_until_ready(batches)
t0 = time.perf_counter()
lls = [PL.loglike_grid_screened(f, e, jnp.ones((B, F), bool), coeffs_t,
                                packed, maskrow, n_real, parallax=p,
                                parallax_err=pe, cfg=cfg, tile=512,
                                screen_k=16384, aux_names=aux_names)
       for f, e, p, pe in batches]
jax.block_until_ready(lls)
print(f"loglike     {1e3*(time.perf_counter()-t0)/NREP:7.2f} ms/batch")
