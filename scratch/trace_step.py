"""Capture a jax.profiler device trace of one funnel full-fit step on
the real TPU (if the axon tunnel supports tracing), then list the
heaviest device ops from the .xplane protobuf.

Run:  python scratch/trace_step.py
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
                                           prepare_screen)
from brutus_tpu.ops.posterior import lnpost_batch
from bench import build_problem, build_stars

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


@jax.jit
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


def run(seed):
    f, e, _, p, pe = build_stars(mc, B, seed=seed)
    o = step(ct, pk, mr, jax.random.split(jax.random.PRNGKey(seed), B),
             jnp.asarray(f), jnp.asarray(e), jnp.asarray(p),
             jnp.asarray(pe))
    jax.block_until_ready(o)


run(1)    # compile + warm
logdir = "/tmp/jax_trace"
os.makedirs(logdir, exist_ok=True)
try:
    jax.profiler.start_trace(logdir)
    for s in range(2, 5):
        run(s)
    jax.profiler.stop_trace()
except Exception as exc:  # noqa: BLE001
    print(f"tracing unsupported here: {exc!r}")
    sys.exit(0)

files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                  recursive=True)
print("trace files:", files, flush=True)
if not files:
    sys.exit(0)
# Summarize heaviest device ops without tensorboard: parse via the
# profiler's python reader if available.
try:
    from tensorflow.python.profiler import profiler_client  # noqa
except Exception:
    pass
try:
    import xprof  # noqa: F401
except Exception:
    pass
# Fallback: raw scan of the protobuf for op names + durations needs
# the xplane schema; just report file sizes so the artifact can be
# pulled and inspected offline.
for fn in files:
    print(f"  {fn}: {os.path.getsize(fn)/1e6:.1f} MB")
