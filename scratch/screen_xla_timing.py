"""Time the plain-XLA screen (`_screen_block_scores`) over the full
750k grid on TPU — does XLA's matmul beat the Pallas kernel's ~1
output-column/cycle by splitting columns across MXUs?

In-pipeline methodology (the only kind that measures sanely through
the tunnel): one jit, big tables as ARGUMENTS, N distinct staged star
batches, loop without syncs, block once.  Output per call is small
((B, Mp//block)), so no readback contamination.

Run on TPU:  python scratch/screen_xla_timing.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from brutus_tpu.config import FitConfig
from brutus_tpu.ops.screen_xla import (prepare_screen_xla,
                                       _screen_block_scores)
from brutus_tpu.ops.optimize import prepare_star_data
from brutus_tpu.ops.pallas_loglike import _screen_parallax
from bench import build_problem, build_stars

M, F, B, BLOCK = 750_000, 8, 128, 256
mc, flux, err, idx, feh, loga, plx, plxe = build_problem(M, F, B, seed=0)
cfg = FitConfig()
tabw, tabc, packed_b, names, n_real = prepare_screen_xla(
    mc, aux=dict(lnprior=np.zeros(M, np.float32)), block=BLOCK)
print(f"tabw {tabw.shape} {tabw.dtype} tabc {tabc.shape}", flush=True)


@jax.jit
def score_fn(tw, tc, f, e, p, pe):
    fp, wtf, mags, wtm, mask, ndim, tv = prepare_star_data(
        f, e, jnp.ones_like(f, bool), cfg)
    plx_, plxw_ = _screen_parallax(p, pe)
    return _screen_block_scores(mags, wtm, plx_, plxw_, tw, tc,
                                n_real, cfg, BLOCK)


@jax.jit
def reduce_all(outs):
    return jnp.stack([o.sum() for o in outs]).sum()


def run(n, seed0):
    """VALUE-FETCH timing: pure-XLA executables defer through the
    tunnel even under block_until_ready (measured 0.03 ms for a
    full-grid screen); fetching a scalar that depends on every output
    forces real execution.  Cost = one tunnel round trip, measured
    separately and subtracted."""
    batches = []
    for i in range(n):
        f_i, e_i, _, p_i, pe_i = build_stars(mc, B, seed=seed0 + i)
        batches.append(tuple(jnp.asarray(v)
                             for v in (f_i, e_i, p_i, pe_i)))
    jax.block_until_ready(batches)
    t0 = time.perf_counter()
    outs = [score_fn(tabw, tabc, *b) for b in batches]
    val = float(reduce_all(outs))
    return time.perf_counter() - t0, val


# Warm compiles for BOTH scan lengths (reduce_all recompiles per n).
run(4, 5000)
run(16, 5100)
rt = []
for r in range(3):
    t4, _ = run(4, 6000 + 100 * r)
    t16, _ = run(16, 7000 + 100 * r)
    dt = (t16 - t4) / 12
    rt.append(dt)
    print(f"  round {r}: t(4)={t4*1e3:.1f} ms t(16)={t16*1e3:.1f} ms "
          f"-> {dt*1e3:.2f} ms/batch "
          f"({9 * M / dt / 1e9:.2f} Gcol/s equivalent)", flush=True)
print(f"XLA screen (highest precision): median "
      f"{np.median(rt)*1e3:.2f} ms/batch", flush=True)
