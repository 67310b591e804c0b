"""Honest steady-state throughput: varied inputs + forced host readback."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import build_problem
from brutus_tpu.config import FitConfig, PosteriorConfig
from brutus_tpu.ops import pallas_loglike as PL
from brutus_tpu.ops.posterior import lnpost_grid

M, F, B = 750_000, 8, 64
TILE = 512
SCREEN = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
BLOCK = int(sys.argv[2]) if len(sys.argv) > 2 else 256
NREP = 8
cfg = FitConfig(mag_direct_init=True)
post_cfg = PosteriorConfig(n_mc_prior=50, n_draws=250, n_sel_max=4096,
                           prefilter_k=4096)

# NREP distinct star batches drawn from ONE grid, staged up front.
(mc0, _, _, _, feh0, loga0, _, _) = build_problem(M, F, B, seed=0)
probs = []
for s in range(NREP):
    rng = np.random.default_rng(1000 + s)
    idx = rng.integers(0, M, B)
    av = rng.uniform(0.1, 1.5, B)
    rv = rng.uniform(2.8, 3.8, B)
    dist = rng.uniform(0.3, 3.0, B)
    sed = (mc0[idx, :, 0] + av[:, None] * (mc0[idx, :, 1]
                                           + rv[:, None] * mc0[idx, :, 2]))
    flux = 10 ** (-0.4 * sed) / dist[:, None] ** 2
    err = flux / 60.0
    flux = (flux + rng.normal(size=flux.shape) * err).astype(np.float32)
    plx = (1.0 / dist + rng.normal(size=B) * 0.05 / dist).astype(np.float32)
    probs.append((jnp.asarray(flux), jnp.asarray(err.astype(np.float32)),
                  jnp.asarray(plx), jnp.asarray(0.1 * plx), idx))

coeffs_t, packed, aux_names, n_real, maskrow = PL.prepare_screen(
    mc0, aux=dict(lnprior=np.zeros(M, np.float32),
                  feh=feh0.astype(np.float32),
                  loga=loga0.astype(np.float32)), tile=TILE)
coord = jnp.asarray([204.7, -19.2], jnp.float32)
dust = (jnp.linspace(0.05, 10.0, 120, dtype=jnp.float32),
        jnp.linspace(0.0, 1.5, 120, dtype=jnp.float32),
        jnp.full(120, 0.2, jnp.float32))


def loglike(f, e, p, pe):
    return PL.loglike_grid_screened(
        f, e, jnp.ones_like(f, bool), coeffs_t, packed, maskrow, n_real,
        parallax=p, parallax_err=pe, cfg=cfg, tile=TILE, screen_k=SCREEN,
        screen_block=BLOCK, aux_names=aux_names)


def one(key, r, gidx, lnp_a, feh_a, loga_a, p, pe):
    return lnpost_grid(key, r, lnp_a, coord, parallax=p, parallax_err=pe,
                       feh=feh_a, loga=loga_a, dust_profile=dust,
                       global_idx=gidx, cfg=post_cfg)


batch_post = jax.jit(jax.vmap(one))


def full(key, f, e, p, pe):
    res = loglike(f, e, p, pe)
    gidx = res.pop("global_idx")
    aux = res.pop("aux")
    keys = jax.random.split(key, B)
    return batch_post(keys, res, gidx, aux["lnprior"], aux["feh"],
                      aux["loga"], p, pe)


def run(name, fn, readback, pipelined=False):
    # warm up on two distinct problems (compile + any caching)
    for s in (0, 1):
        f, e, p, pe, _ = probs[s]
        out = fn(jax.random.PRNGKey(100 + s), f, e, p, pe)
    np.asarray(readback(out))
    t0 = time.perf_counter()
    rbs = []
    for s in range(NREP):
        f, e, p, pe, idx = probs[s]
        out = fn(jax.random.PRNGKey(s), f, e, p, pe)
        rb = readback(out)
        if not pipelined:
            rb = np.asarray(rb)      # forced dependent readback
        rbs.append(rb)
    np.asarray(rbs[-1])
    dt = (time.perf_counter() - t0) / NREP
    mode = "pipelined " if pipelined else "serialized"
    print(f"{name:24s} {mode} {dt*1e3:8.2f} ms/batch  {B/dt:8.1f} stars/s")


run("loglike screened", lambda k, f, e, p, pe: loglike(f, e, p, pe),
    lambda o: o["lnlike"].max(1))
run("loglike screened", lambda k, f, e, p, pe: loglike(f, e, p, pe),
    lambda o: o["lnlike"].max(1), pipelined=True)
run("full fit", full, lambda o: o["log_evidence"])
run("full fit", full, lambda o: o["log_evidence"], pipelined=True)

# hit rate on the last problem
f, e, p, pe, idx = probs[-1]
out = full(jax.random.PRNGKey(0), f, e, p, pe)
hit = (np.asarray(out["model_idx"]) == idx[:, None]).mean()
print(f"true_model_hit_rate={hit:.3f}")

# dense fused for comparison
def dense(k, f, e, p, pe):
    return PL.loglike_grid_fused(f, e, jnp.ones_like(f, bool), coeffs_t,
                                 cfg=cfg, tile=TILE, n_real=n_real)


run("loglike dense fused", dense, lambda o: o["lnlike"].max(1))
