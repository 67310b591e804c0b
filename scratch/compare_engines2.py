"""Posterior-relevant fused-vs-XLA agreement on the real TPU."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import build_problem
from brutus_tpu.config import FitConfig
from brutus_tpu.ops.optimize import loglike_grid
from brutus_tpu.ops.pallas_loglike import loglike_grid_fused, prepare_coeffs

M, F, B = 750_000, 8, 16
(mc, flux, err, idx, feh, loga, parallax, parallax_err) = build_problem(M, F, B)
fx, ex = jnp.asarray(flux), jnp.asarray(err)
mc_d = jnp.asarray(mc)

coeffs_t, n_real = prepare_coeffs(mc, tile=1024)


def run_xla(cfg):
    out = jax.jit(jax.vmap(
        lambda f, e: loglike_grid(f, e, jnp.ones_like(f, bool), mc_d,
                                  cfg=cfg)))(fx, ex)
    jax.block_until_ready(out)
    return out


def report(tag, c1, c2, a1, a2, r1, r2):
    print(f"--- {tag} ---")
    print("nan counts:", int(np.isnan(c1).sum()), int(np.isnan(c2).sum()))
    print("argmin agreement:", (np.nanargmin(c1, 1) == np.nanargmin(c2, 1)).mean())
    stats = []
    for b in range(B):
        rel = np.flatnonzero(c1[b] < np.nanmin(c1[b]) + 14.0)  # cull-surviving
        dchi = c2[b, rel] - c1[b, rel]
        stats.append((len(rel), np.abs(dchi).max(), np.median(dchi),
                      np.abs(a1[b, rel] - a2[b, rel]).max(),
                      np.abs(r1[b, rel] - r2[b, rel]).max()))
    n, mx, md, da, dr = map(np.asarray, zip(*stats))
    print(f"relevant models/star: min={n.min()} max={n.max()}")
    print(f"|dchi2| max={mx.max():.4f}; median signed dchi2 (fus-xla): "
          f"[{md.min():.4f}, {md.max():.4f}]")
    print(f"|dav| max={da.max():.4f}  |drv| max={dr.max():.4f}")


cfg = FitConfig(mag_direct_init=True)
xla = run_xla(cfg)
fus = loglike_grid_fused(fx, ex, jnp.ones_like(fx, bool), coeffs_t,
                         cfg=cfg, tile=1024, n_real=n_real)
jax.block_until_ready(fus)

c1 = np.asarray(xla["chi2"]); c2 = np.asarray(fus["chi2"])[:, :M]
a1, a2 = np.asarray(xla["av"]), np.asarray(fus["av"])[:, :M]
r1, r2 = np.asarray(xla["rv"]), np.asarray(fus["rv"])[:, :M]
report("fused vs xla (default, init cull ON)", c1, c2, a1, a2, r1, r2)

xla2 = run_xla(FitConfig(mag_direct_init=True, apply_init_cull=False))
c1b = np.asarray(xla2["chi2"])
a1b, r1b = np.asarray(xla2["av"]), np.asarray(xla2["rv"])
report("fused vs xla (polish everything)", c1b, c2, a1b, a2, r1b, r2)
