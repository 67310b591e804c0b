"""Pipelined per-stage timing of the MC posterior path."""
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
NREP = 8
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

pre_v, post_v = PO._batch_fns(pcfg, gcfg, dcfg, True, True, True, True, True)


def pre_of(rep):
    res, gidx, aux, plx, plxe, keys = rep
    coord_b = jnp.broadcast_to(coord, (B, 2))
    dm_b = jnp.broadcast_to(dm, (B, 120))
    ds_b = jnp.broadcast_to(ds, (B, 120))
    return pre_v(keys, res, aux["lnprior"], coord_b, plx, plxe,
                 aux["feh"], aux["loga"], dm_b, ds_b, dd, gidx)


def timeit(name, fn, readback):
    outs = [fn(reps[i % NREP]) for i in range(2)]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = []
    for i in range(NREP):
        outs.append(fn(reps[i]))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / NREP * 1e3
    print(f"{name:28s} {dt:8.2f} ms (pipelined)")
    return outs[0]


sels = [pre_of(r) for r in reps]
jax.block_until_ready(sels)

timeit("pre", pre_of, None)

kern = lambda sel: mc_integrate(sel["tab"], sel["scal"], sel["dusttab"],
                                sel["z"], pcfg.n_mc_prior, pcfg, gcfg,
                                dcfg, True, True, True)
i_box = [0]


def kern_i(rep):
    s = sels[i_box[0] % NREP]
    i_box[0] += 1
    return kern(s)


timeit("mc kernel", kern_i, None)

kouts = [kern(s) for s in sels]
jax.block_until_ready(kouts)
j_box = [0]


def post_i(rep):
    j = j_box[0] % NREP
    j_box[0] += 1
    return post_v(sels[j], *kouts[j], reps[j][1])


timeit("post", post_i, None)


def full_i(rep):
    return PO.lnpost_batch(rep[5], rep[0], rep[2]["lnprior"], coord,
                           parallax=rep[3], parallax_err=rep[4],
                           feh=rep[2]["feh"], loga=rep[2]["loga"],
                           dust_profile=(dd, dm, ds), global_idx=rep[1],
                           cfg=pcfg)


timeit("lnpost_batch total", full_i, None)

# XLA posterior for comparison
one = lambda k, r, gi, lp, fe, lo, p, pe: PO.lnpost_grid(
    k, r, lp, coord, parallax=p, parallax_err=pe, feh=fe, loga=lo,
    dust_profile=(dd, dm, ds), global_idx=gi, cfg=pcfg)
xla_post = jax.jit(jax.vmap(one))


def xla_i(rep):
    res, gidx, aux, plx, plxe, keys = rep
    return xla_post(keys, res, gidx, aux["lnprior"], aux["feh"],
                    aux["loga"], plx, plxe)


timeit("XLA lnpost (old path)", xla_i, None)
