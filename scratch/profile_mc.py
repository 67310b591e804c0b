"""Time the fused MC kernel + pre/post halves honestly on TPU."""
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

M, F, B = 750_000, 8, 64
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

reps = []
for s in range(NREP):
    flux, err, idx, plx, plxe = build_stars(mc, B, seed=700 + s)
    res = PL.loglike_grid_screened(
        jnp.asarray(flux), jnp.asarray(err), jnp.ones((B, F), bool),
        coeffs_t, packed, maskrow, n_real, parallax=jnp.asarray(plx),
        parallax_err=jnp.asarray(plxe), cfg=cfg, tile=512,
        screen_k=16384, aux_names=aux_names)
    gidx = res.pop("global_idx")
    aux = res.pop("aux")
    reps.append((res, gidx, aux, jnp.asarray(plx), jnp.asarray(plxe),
                 jax.random.split(jax.random.PRNGKey(s), B)))
jax.block_until_ready(reps)

pre_v, post_v = PO._batch_fns(pcfg, gcfg, dcfg, True, True, True, True,
                              True)


def pre_of(rep):
    res, gidx, aux, plx, plxe, keys = rep
    coord_b = jnp.broadcast_to(coord, (B, 2))
    dm_b = jnp.broadcast_to(dm, (B, 120))
    ds_b = jnp.broadcast_to(ds, (B, 120))
    return pre_v(keys, res, aux["lnprior"], coord_b, plx, plxe,
                 aux["feh"], aux["loga"], dm_b, ds_b, dd, gidx)


def timeit(name, fn, readback):
    out = fn(reps[0])
    np.asarray(jax.tree.leaves(readback(out))[0])
    t0 = time.perf_counter()
    for i in range(NREP):
        out = fn(reps[i])
        np.asarray(jax.tree.leaves(readback(out))[0])
    dt = (time.perf_counter() - t0) / NREP * 1e3
    print(f"{name:28s} {dt:8.2f} ms")
    return out


sel = timeit("pre (select+chol+z+pack)", pre_of, lambda s: s["lnp_sel"][:, :1])

kouts = timeit("mc kernel", lambda rep: mc_integrate(
    sel["tab"], sel["scal"], sel["dusttab"], sel["z"], pcfg.n_mc_prior,
    pcfg, gcfg, dcfg, True, True, True), lambda o: o[4][:, :1, :1])

kouts_nd = timeit("mc kernel (no dust)", lambda rep: mc_integrate(
    sel["tab"], sel["scal"], sel["dusttab"], sel["z"], pcfg.n_mc_prior,
    pcfg, gcfg, dcfg, True, True, False), lambda o: o[4][:, :1, :1])

kouts_ng = timeit("mc kernel (dust only)", lambda rep: mc_integrate(
    sel["tab"], sel["scal"], sel["dusttab"], sel["z"], pcfg.n_mc_prior,
    pcfg, gcfg, dcfg, False, False, True, use_gal=False),
    lambda o: o[4][:, :1, :1])

gidx0 = reps[0][1]
post = timeit("post (evid+resample)", lambda rep: post_v(
    sel, *kouts, gidx0), lambda o: o["log_evidence"])

full = timeit("lnpost_batch total", lambda rep: PO.lnpost_batch(
    rep[5], rep[0], rep[2]["lnprior"], coord, parallax=rep[3],
    parallax_err=rep[4], feh=rep[2]["feh"], loga=rep[2]["loga"],
    dust_profile=(dd, dm, ds), global_idx=rep[1], cfg=pcfg),
    lambda o: o["log_evidence"])
