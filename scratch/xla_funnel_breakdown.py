"""Cumulative-stage breakdown of the plain-XLA funnel on TPU.

Round-5 finding to explain: porting the bf16 split screen into
`ops/screen_xla.py` did NOT move the XLA-funnel full fit
(1,610 -> 1,582 stars/s, i.e. ~80 ms/batch) — so the screen was not
the bottleneck.  Suspects, in order: the vmapped XLA posterior
(`lnpost_grid`; its dust-hat path cost 40-60 ms/batch before the
fused MC kernel replaced it on the TPU engine), the vmapped
while-loop stage-2 fit (straggler-coupled across the whole batch),
the block select + slab gather.

Methodology: value-fetch timing (see screen_xla_timing.py) — one jit
per CUMULATIVE stage returning a scalar that depends on every output,
N distinct staged batches, t(16)-t(4) differencing cancels the fixed
tunnel round trip.  Stage deltas are then honest device+dispatch
costs per batch.

Run on TPU:  python scratch/xla_funnel_breakdown.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("BD_CPU"):        # correctness smoke test on CPU
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from brutus_tpu.config import FitConfig, PosteriorConfig
from brutus_tpu.ops.screen_xla import (prepare_screen_xla,
                                       _screen_block_scores,
                                       loglike_grid_screened_xla)
from brutus_tpu.ops.optimize import prepare_star_data
from brutus_tpu.ops.pallas_loglike import (_screen_parallax,
                                           _select_blocks)
from brutus_tpu.ops.posterior import lnpost_grid
from bench import build_problem, build_stars

M = int(os.environ.get("BD_M", 750_000))
F = int(os.environ.get("BD_F", 8))
B = int(os.environ.get("BD_B", 128))
BLOCK = 256
mc, flux, err, idx, feh, loga, plx, plxe = build_problem(M, F, B, seed=0)
cfg = FitConfig()
post_cfg = PosteriorConfig()
SCREEN_K = cfg.screen_k
tabw, tabc, packed_b, names, n_real = prepare_screen_xla(
    mc, aux=dict(lnprior=np.zeros(M, np.float32),
                 feh=feh.astype(np.float32),
                 loga=loga.astype(np.float32)), block=BLOCK)
print(f"tabw {tabw.shape} {tabw.dtype} packed {packed_b.shape} "
      f"screen_k={SCREEN_K}", flush=True)
dust_dist = jnp.linspace(0.05, 10.0, 120, dtype=jnp.float32)
dust_mean = jnp.linspace(0.0, 1.5, 120, dtype=jnp.float32)
dust_std = jnp.full(120, 0.2, jnp.float32)
COORD = jnp.asarray([204.7, -19.2], jnp.float32)


def _screen_only(tw, tc, pb, keys, f, e, p, pe):
    (_fp, _wf, mags, wtm, _m, _nd, _tv) = prepare_star_data(
        f, e, jnp.ones_like(f, bool), cfg)
    plx_, plxw_ = _screen_parallax(p, pe)
    bs = _screen_block_scores(mags, wtm, plx_, plxw_, tw, tc, n_real,
                              cfg, BLOCK)
    return bs.sum()


def _gather_only(tw, tc, pb, keys, f, e, p, pe):
    (_fp, _wf, mags, wtm, _m, _nd, _tv) = prepare_star_data(
        f, e, jnp.ones_like(f, bool), cfg)
    plx_, plxw_ = _screen_parallax(p, pe)
    bs = _screen_block_scores(mags, wtm, plx_, plxw_, tw, tc, n_real,
                              cfg, BLOCK)
    nb = SCREEN_K // BLOCK
    bidx, idx_ = _select_blocks(bs, nb, BLOCK)
    slabs = pb[bidx]
    return slabs.sum() + idx_.sum()


def _fit_only(tw, tc, pb, keys, f, e, p, pe):
    res = loglike_grid_screened_xla(
        f, e, jnp.ones_like(f, bool), tw, tc, pb, n_real,
        parallax=p, parallax_err=pe, cfg=cfg, screen_k=SCREEN_K,
        aux_names=names)
    return (res["lnlike"].sum() + res["chi2"].sum()
            + res["scale"].sum() + res["global_idx"].sum())


def _full_step(tw, tc, pb, keys, f, e, p, pe):
    res = loglike_grid_screened_xla(
        f, e, jnp.ones_like(f, bool), tw, tc, pb, n_real,
        parallax=p, parallax_err=pe, cfg=cfg, screen_k=SCREEN_K,
        aux_names=names)
    gidx = res.pop("global_idx")
    aux = res.pop("aux")

    def star_post(key, r, lnp_g, gix, feh_s, loga_s, p1, pe1):
        return lnpost_grid(key, r, lnp_g, COORD, parallax=p1,
                           parallax_err=pe1, feh=feh_s, loga=loga_s,
                           dust_profile=(dust_dist, dust_mean,
                                         dust_std),
                           global_idx=gix, cfg=post_cfg)

    out = jax.vmap(star_post)(keys, res, aux["lnprior"], gidx,
                              aux["feh"], aux["loga"], p, pe)
    return sum(jnp.sum(v) for v in jax.tree.leaves(out)
               if jnp.issubdtype(v.dtype, jnp.floating))


STAGES = [("screen", _screen_only), ("select+gather", _gather_only),
          ("+fit", _fit_only), ("+posterior(full)", _full_step)]
JIT = {name: jax.jit(fn) for name, fn in STAGES}


def stage_batches(n, seed0):
    out = []
    for i in range(n):
        f_i, e_i, _, p_i, pe_i = build_stars(mc, B, seed=seed0 + i)
        k_i = jax.random.split(jax.random.PRNGKey(seed0 + i), B)
        out.append((k_i,) + tuple(jnp.asarray(v)
                                  for v in (f_i, e_i, p_i, pe_i)))
    jax.block_until_ready(out)
    return out


def run(fn, n, seed0):
    batches = stage_batches(n, seed0)
    t0 = time.perf_counter()
    vals = [fn(tabw, tabc, packed_b, *b) for b in batches]
    v = float(jnp.stack(vals).sum())
    return time.perf_counter() - t0, v


prev = 0.0
for name, _ in STAGES:
    fn = JIT[name]
    run(fn, 2, 5000)            # compile + warm
    run(fn, 6, 5100)
    ts = []
    for r in range(3):
        t2, _ = run(fn, 2, 6000 + 100 * r)
        t6, _ = run(fn, 6, 7000 + 100 * r)
        ts.append((t6 - t2) / 4)
    ms = float(np.median(ts)) * 1e3
    print(f"{name:>18s}: {ms:8.2f} ms/batch  (delta "
          f"{ms - prev:+8.2f})", flush=True)
    prev = ms
print("done", flush=True)
