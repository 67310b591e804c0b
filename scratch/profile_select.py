"""DEPRECATED — DO NOT TRUST: synthetic-input timing through the
tunnel backend reads garbage (pure-XLA executions are deferred/served
from caches even under block_until_ready; measured a 0.19 ms "full
stage" smaller than its own parts).  Use
scratch/profile_select_knockout.py (in-pipeline config knockouts) or
value-fetch timing (scratch/screen_xla_timing.py) instead.

Original docstring: Attribute the posterior select stage cost on TPU.

Stages synthetic funnel fit-stage outputs (B, P) on device (the select
stage's cost depends only on shapes) and times the full pre-stage plus
isolated pieces: approx_max_k, pack1 (7-field stack + prefilter
gather), gal prior, dust prior, pack2 (8-field stack + final gather).

Run:  python scratch/profile_select.py [B] [P]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from brutus_tpu.config import (PosteriorConfig, GalPriorConfig,
                               DustPriorConfig)
from brutus_tpu.ops.posterior import _batch_fns, _select_stage
from brutus_tpu.priors import gal_lnprior, dust_lnprior

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
P = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
N = 8

cfg = PosteriorConfig()
gal_cfg = GalPriorConfig()
dust_cfg = DustPriorConfig()
K1 = cfg.prefilter_k
K = cfg.n_sel_max
print(f"B={B} P={P} prefilter_k={K1} n_sel_max={K} "
      f"nmc={cfg.n_mc_prior}", flush=True)

key = jax.random.PRNGKey(0)


def stage_inputs(seed):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 16)
    mk = lambda i, lo, hi: jax.random.uniform(ks[i], (B, P), jnp.float32,
                                              lo, hi)
    res = dict(
        lnlike=mk(0, -200.0, -5.0),
        chi2=mk(1, 5.0, 200.0),
        scale=mk(2, 0.05, 4.0),
        av=mk(3, 0.0, 1.5),
        rv=mk(4, 2.8, 4.2),
        icov_parts=tuple(mk(5 + i, 0.5, 30.0) for i in range(3))
        + tuple(mk(8 + i, -0.2, 0.2) for i in range(3)),
        ndim=jnp.full((B,), 8.0),
    )
    lnprior_grid = mk(14, -10.0, 0.0)
    gidx = jax.random.randint(ks[15], (B, P), 0, 750000, jnp.int32)
    return res, lnprior_grid, gidx


coord = jnp.broadcast_to(jnp.asarray([204.7, -19.2], jnp.float32), (B, 2))
plx = jnp.full((B,), 1.0, jnp.float32)
plxe = jnp.full((B,), 0.1, jnp.float32)
feh = jax.random.uniform(key, (B, P), jnp.float32, -2.0, 0.3)
loga = jax.random.uniform(key, (B, P), jnp.float32, 8.0, 10.1)
av_dist = jnp.linspace(0.05, 10.0, 120, dtype=jnp.float32)
av_mean = jnp.broadcast_to(jnp.linspace(0.0, 1.5, 120,
                                        dtype=jnp.float32), (B, 120))
av_std = jnp.full((B, 120), 0.2, jnp.float32)
keys = jax.random.split(key, B)

inputs = [stage_inputs(s) for s in range(N + 1)]
jax.block_until_ready(inputs)


def bench(name, fn, args_list):
    """Serialized-chain timing: one DISTINCT input per iteration
    (repeated (executable, inputs) pairs can be served from backend
    caches) and a data dependency of each call on the previous
    output (a 0-valued scalar folded into the next lnlike), so
    executions cannot overlap or be acknowledged optimistically."""
    @jax.jit
    def chained(c, r, lp, gi):
        # fold the carry into EVERY field (fns consume different
        # subsets; an unused chain edge would be DCE'd)
        r2 = jax.tree.map(lambda v: v + c.astype(v.dtype), r)
        out = fn(r2, lp, gi)
        leaf = jax.tree.leaves(out)[0]
        return leaf.ravel()[0].astype(jnp.float32) * 0.0, out

    carry = jnp.zeros((), jnp.float32)
    carry, out = chained(carry, *args_list[-1])
    jax.block_until_ready((carry, out))
    t0 = time.perf_counter()
    for i in range(N):
        carry, out = chained(carry, *args_list[i])
    jax.block_until_ready((carry, out))
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"  {name:42s} {dt:7.3f} ms/batch", flush=True)
    return dt


pre_v, post_v = _batch_fns(cfg, gal_cfg, dust_cfg, True, True, True,
                           True, True, use_krng=True)

bench("FULL pre stage (select + tab staging)", lambda r, lp, gi: pre_v(
    keys, r, lp, coord, plx, plxe, feh, loga, av_mean, av_std,
    av_dist, gi), inputs)

# Unchained control (the old methodology) for comparison:
_o = pre_v(keys, inputs[-1][0], inputs[-1][1], coord, plx, plxe, feh,
           loga, av_mean, av_std, av_dist, inputs[-1][2])
jax.block_until_ready(_o)
_t0 = time.perf_counter()
_os = []
for _i in range(N):
    _os.append(pre_v(keys, inputs[_i][0], inputs[_i][1], coord, plx,
                     plxe, feh, loga, av_mean, av_std, av_dist,
                     inputs[_i][2]))
jax.block_until_ready(_os)
print(f"  {'(unchained pre stage, old methodology)':42s} "
      f"{(time.perf_counter() - _t0) / N * 1e3:7.3f} ms/batch",
      flush=True)


@jax.jit
def amk_only(r, lp, gi):
    return jax.vmap(lambda l: jax.lax.approx_max_k(l, K1,
                                                   recall_target=0.95))(
        r["lnlike"])


bench("approx_max_k (B, P)->K1 alone", amk_only, inputs)


@jax.jit
def pack1(r, lp, gi):
    def one(lnlike, scale, av, lnp_g, feh_s, loga_s):
        _, pre_idx = jax.lax.approx_max_k(lnlike, K1, recall_target=0.95)
        fields = [lnlike, scale, av, lnlike, lnp_g, feh_s, loga_s]
        return jnp.stack(fields, axis=-1)[pre_idx]
    return jax.vmap(one)(r["lnlike"], r["scale"], r["av"], lp, feh, loga)


bench("pack1: amk + 7-field stack + gather K1", pack1, inputs)


@jax.jit
def galprior(r, lp, gi):
    def one(scale, co, feh_s, loga_s):
        dist = 1.0 / jnp.sqrt(jnp.maximum(scale[:K1], 1e-30))
        return gal_lnprior(dist, co, feh=feh_s[:K1], loga=loga_s[:K1],
                           cfg=gal_cfg)
    return jax.vmap(one)(r["scale"], coord, feh, loga)


bench("gal prior on (B, K1)", galprior, inputs)


@jax.jit
def dustprior(r, lp, gi):
    def one(scale, av, am, asd):
        dist = 1.0 / jnp.sqrt(jnp.maximum(scale[:K1], 1e-30))
        return dust_lnprior(dist, av[:K1], av_dist, am, asd, dust_cfg)
    return jax.vmap(one)(r["scale"], r["av"], av_mean, av_std)


bench("dust prior on (B, K1)", dustprior, inputs)


@jax.jit
def pack2(r, lp, gi):
    def one(rv, chi2, parts, lnlike):
        _, pre_idx = jax.lax.approx_max_k(lnlike, K1, recall_target=0.95)
        packed = jnp.stack((rv, chi2) + parts, axis=-1)[pre_idx]
        return packed
    return jax.vmap(one)(r["rv"], r["chi2"], r["icov_parts"],
                         r["lnlike"])


bench("pack2: 8-field stack + gather (excl amk)", pack2, inputs)


@jax.jit
def sel_only(r, lp, gi):
    def one(res, lp_g, co, px, pe, feh_s, loga_s, am, asd):
        return _select_stage(res, lp_g, co, px, pe, feh_s, loga_s,
                             (av_dist, am, asd), cfg, gal_cfg,
                             dust_cfg, True)
    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0))(
        r, lp, coord, plx, plxe, feh, loga, av_mean, av_std)


bench("_select_stage alone (no tab staging)", sel_only, inputs)
