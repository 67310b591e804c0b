"""Detailed fused-vs-XLA agreement diagnostics on the real TPU."""

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
cfg = FitConfig(mag_direct_init=True)
fx, ex = jnp.asarray(flux), jnp.asarray(err)

mc_d = jnp.asarray(mc)
xla = jax.jit(jax.vmap(
    lambda f, e: loglike_grid(f, e, jnp.ones_like(f, bool), mc_d, cfg=cfg)))(fx, ex)
jax.block_until_ready(xla)

coeffs_t, n_real = prepare_coeffs(mc, tile=1024)
fus = loglike_grid_fused(fx, ex, jnp.ones_like(fx, bool), coeffs_t,
                         cfg=cfg, tile=1024, n_real=n_real)
jax.block_until_ready(fus)

c1 = np.asarray(xla["chi2"])          # (B, M)
c2 = np.asarray(fus["chi2"])[:, :M]
a1, a2 = np.asarray(xla["av"]), np.asarray(fus["av"])[:, :M]
r1, r2 = np.asarray(xla["rv"]), np.asarray(fus["rv"])[:, :M]
s1, s2 = np.asarray(xla["scale"]), np.asarray(fus["scale"])[:, :M]

print("chi2 min per star (xla):", c1.min(1)[:4])
print("chi2 min per star (fus):", c2.min(1)[:4])
print("argmin agreement:", (c1.argmin(1) == c2.argmin(1)).mean())

# focus on the models that matter: the xla top-1024 by lnlike
for b in range(4):
    top = np.argsort(c1[b])[:1024]
    dchi = np.abs(c1[b, top] - c2[b, top])
    dav = np.abs(a1[b, top] - a2[b, top])
    drv = np.abs(r1[b, top] - r2[b, top])
    ds = np.abs((s1[b, top] - s2[b, top]) / s1[b, top])
    print(f"star {b}: top-1024 |dchi2| max={dchi.max():.4f} "
          f"p99={np.percentile(dchi, 99):.4f} med={np.median(dchi):.5f}; "
          f"|dav| max={dav.max():.4f}; |drv| max={drv.max():.4f}; "
          f"|ds/s| max={ds.max():.4f}")

# where is the worst global delta?
d = np.abs(c1 - c2)
bworst, mworst = np.unravel_index(np.argmax(d), d.shape)
print(f"worst |dchi2|={d.max():.3f} at star {bworst}, model {mworst}; "
      f"chi2 xla={c1[bworst, mworst]:.3f} fus={c2[bworst, mworst]:.3f}; "
      f"rank in xla order: {int((c1[bworst] < c1[bworst, mworst]).sum())}")
