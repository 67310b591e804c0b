"""Find the producer/consumer of the residual f32[3,8,128,12288]
layout copy in the funnel step's optimized HLO (CPU lowering — layout
decisions may differ from TPU, but the logical op chain is the same).

Run: python scratch/hlo_copy_hunt.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from brutus_tpu.config import FitConfig, PosteriorConfig
from brutus_tpu.ops.pallas_loglike import (loglike_grid_screened,
                                           prepare_screen)
from brutus_tpu.ops.posterior import lnpost_batch

M, F, B = 750_000, 8, 128
fit_cfg = FitConfig()
post_cfg = PosteriorConfig()
tile = 512
rng = np.random.default_rng(0)
mc = rng.normal(size=(M, F, 3)).astype(np.float32)
feh = rng.normal(size=M).astype(np.float32)
loga = rng.normal(size=M).astype(np.float32)
ct, pk, names, n_real, mr = prepare_screen(
    mc, aux=dict(lnprior=np.zeros(M, np.float32), feh=feh, loga=loga),
    tile=tile, screen_block=fit_cfg.screen_block)
dust_dist = jnp.linspace(0.05, 10.0, 120, dtype=jnp.float32)
dust_mean = jnp.linspace(0.0, 1.5, 120, dtype=jnp.float32)
dust_std = jnp.full(120, 0.2, jnp.float32)
COORD = jnp.asarray([204.7, -19.2], jnp.float32)


def step(ct, pk, mr, keys, f, e, p, pe):
    res = loglike_grid_screened(
        f, e, jnp.ones_like(f, bool), ct, pk, mr, n_real,
        parallax=p, parallax_err=pe, cfg=fit_cfg, tile=tile,
        screen_k=fit_cfg.screen_k, screen_block=fit_cfg.screen_block,
        aux_names=names, interpret=True)
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
lowered = jax.jit(step).lower(*args)
hlo = lowered.compile().as_text()
lines = hlo.splitlines()
hits = [i for i, ln in enumerate(lines)
        if "3,8,128,12288" in ln or "24,128,12288" in ln]
print(f"{len(hits)} HLO lines mention the coeff shortlist shape:")
for i in hits:
    print(f"L{i}: {lines[i][:300]}")
