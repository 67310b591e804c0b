"""Fetch the TPU-optimized HLO of one funnel full-fit step (via
`compile().as_text()` — the axon backend compiles remotely, so
`--xla_dump_to` writes nothing locally) and print the producer/consumer
window around the residual `copy.612` f32[3,8,128,12288] layout copy.

Disables the persistent compilation cache so the compile is fresh.

Run:  python scratch/dump_step_hlo.py [out=/tmp/step_tpu.hlo]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_tpu.hlo"

import numpy as np
import jax
import jax.numpy as jnp

from brutus_tpu.config import FitConfig, PosteriorConfig
from brutus_tpu.ops.pallas_loglike import (loglike_grid_screened,
                                           prepare_screen)
from brutus_tpu.ops.posterior import lnpost_batch
from bench import build_problem

M, F, B = 750_000, 8, 128
mc, flux, err, idx, feh, loga, plx, plxe = build_problem(M, F, B, seed=0)
fit_cfg = FitConfig()
post_cfg = PosteriorConfig()
tile = 512
ct, pk, names, n_real, mr = prepare_screen(
    mc, aux=dict(lnprior=np.zeros(M, np.float32),
                 feh=feh.astype(np.float32),
                 loga=loga.astype(np.float32)), tile=tile,
    screen_block=fit_cfg.screen_block)
dust_dist = jnp.linspace(0.05, 10.0, 120, dtype=jnp.float32)
dust_mean = jnp.linspace(0.0, 1.5, 120, dtype=jnp.float32)
dust_std = jnp.full(120, 0.2, jnp.float32)
COORD = jnp.asarray([204.7, -19.2], jnp.float32)


def step(ct, pk, mr, keys, f, e, p, pe):
    res = loglike_grid_screened(
        f, e, jnp.ones_like(f, bool), ct, pk, mr, n_real,
        parallax=p, parallax_err=pe, cfg=fit_cfg, tile=tile,
        screen_k=fit_cfg.screen_k, screen_block=fit_cfg.screen_block,
        aux_names=names)
    gidx = res.pop("global_idx")
    aux = res.pop("aux")
    return lnpost_batch(keys, res, aux["lnprior"], COORD,
                        parallax=p, parallax_err=pe,
                        feh=aux["feh"], loga=aux["loga"],
                        dust_profile=(dust_dist, dust_mean, dust_std),
                        global_idx=gidx, cfg=post_cfg)


sds = jax.ShapeDtypeStruct
args = (
    jax.tree_util.tree_map(lambda x: sds(x.shape, x.dtype), ct),
    sds(pk.shape, pk.dtype), sds(mr.shape, mr.dtype),
    sds((B, 2), jnp.uint32), sds((B, F), jnp.float32),
    sds((B, F), jnp.float32), sds((B,), jnp.float32),
    sds((B,), jnp.float32),
)
print("lower+compile...", flush=True)
hlo = jax.jit(step).lower(*args).compile().as_text()
with open(out_path, "w") as fh:
    fh.write(hlo)
lines = hlo.splitlines()
print(f"{len(lines)} HLO lines -> {out_path}", flush=True)

hits = [i for i, ln in enumerate(lines) if "3,8,128,12288" in ln]
print(f"{len(hits)} lines mention 3,8,128,12288:")
for i in hits:
    print(f"L{i}: {lines[i].strip()[:380]}")

# also show who consumes the copy / produces its operand
import re
for i in hits:
    m = re.search(r"%(\S+?) = ", lines[i].strip())
    if not m:
        continue
    name = m.group(1)
    users = [j for j, ln in enumerate(lines)
             if f"%{name}" in ln and j != i][:4]
    for j in users:
        print(f"  user/ref of %{name} L{j}: {lines[j].strip()[:300]}")
