"""Screen-stage timing vs tile width (varied inputs, end-sync)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from brutus_tpu.config import FitConfig
from brutus_tpu.ops.pallas_loglike import (loglike_grid_screened,
                                           prepare_screen)

from bench import build_problem, build_stars  # noqa: E402

M, F, B = 750_000, 8, 128
mc, flux, err, idx, feh, loga, plx, plxe = build_problem(M, F, B, seed=0)
cfg = FitConfig()

for tile in (512, 1024, 2048):
    coeffs_t, packed, aux_names, n_real, maskrow = prepare_screen(
        mc, aux=dict(lnprior=np.zeros(M, np.float32)), tile=tile)

    # Tables as jit ARGUMENTS (closure capture embeds them as XLA
    # constants -> remote-compile HTTP 413).
    def step(ct, pk, mr, f, e, p, pe):
        return loglike_grid_screened(
            f, e, jnp.ones_like(f, bool), ct, pk, mr,
            n_real, parallax=p, parallax_err=pe, cfg=cfg, tile=tile,
            stop_after="screen")

    jstep = jax.jit(step, static_argnames=())
    batches = []
    for i in range(4):
        f_i, e_i, _, p_i, pe_i = build_stars(mc, B, seed=1000 + i)
        batches.append(tuple(jnp.asarray(v)
                             for v in (f_i, e_i, p_i, pe_i)))
    jax.block_until_ready(batches)
    o = jstep(coeffs_t, packed, maskrow, *batches[0])
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [jstep(coeffs_t, packed, maskrow, *b) for b in batches]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(batches) * 1e3
    print(f"tile={tile}: screen {dt:.2f} ms/batch", flush=True)
