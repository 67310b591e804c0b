"""Trace the SCANNED bench step (scan-batches=4) on the real TPU.

The unscanned-step trace reads ~13.0 ms/batch device time but the
scan4 bench wall is ~15.7 ms/batch; scan8 does NOT amortize the gap,
so ~2.7 ms/batch must be device idle or staging serialization INSIDE
the scanned executable.  This captures it.

Run:  python scratch/trace_scan.py
"""
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from brutus_tpu.config import FitConfig, PosteriorConfig
from brutus_tpu.ops.pallas_loglike import (loglike_grid_screened,
                                           pack_row_names,
                                           prepare_screen)
from brutus_tpu.ops.posterior import lnpost_batch
from bench import build_problem, build_stars

M, F = 750_000, 8
B = int(os.environ.get("TRACE_B", "128"))
NSCAN = int(os.environ.get("TRACE_NSCAN", "4"))
LOGDIR = os.environ.get("TRACE_LOGDIR", "/tmp/jax_trace_scan")
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


def one(ct, pk, mr, keys, f, e, p, pe):
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
                        global_idx=gidx, cfg=post_cfg,
                        pack_names=pack_row_names(names))


@jax.jit
def scan_step(ct, pk, mr, keys_s, f_s, e_s, p_s, pe_s):
    def body(_, xs):
        k, f, e, p, pe = xs
        return None, one(ct, pk, mr, k, f, e, p, pe)
    return jax.lax.scan(body, None, (keys_s, f_s, e_s, p_s, pe_s))[1]


def group(seed0):
    ks, fs, es, ps, pes = [], [], [], [], []
    for s in range(seed0, seed0 + NSCAN):
        f, e, _, p, pe = build_stars(mc, B, seed=s)
        ks.append(jax.random.split(jax.random.PRNGKey(s), B))
        fs.append(jnp.asarray(f)); es.append(jnp.asarray(e))
        ps.append(jnp.asarray(p)); pes.append(jnp.asarray(pe))
    return tuple(jnp.stack(x) for x in (ks, fs, es, ps, pes))


g1, g2, g3 = group(1), group(11), group(21)
jax.block_until_ready(scan_step(ct, pk, mr, *g1))     # compile + warm

import time
for gi, g in ((2, g2), (3, g3)):
    t0 = time.perf_counter()
    jax.block_until_ready(scan_step(ct, pk, mr, *g))
    print(f"group {gi}: wall {(time.perf_counter()-t0)*1e3/NSCAN:.2f} "
          f"ms/batch", flush=True)

logdir = LOGDIR
os.makedirs(logdir, exist_ok=True)
jax.profiler.start_trace(logdir)
jax.block_until_ready(scan_step(ct, pk, mr, *g2))
jax.block_until_ready(scan_step(ct, pk, mr, *g3))
jax.profiler.stop_trace()
files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                  recursive=True)
print("trace files:", files, flush=True)
