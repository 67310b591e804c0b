"""Why do fused/xla posterior dist medians differ? Inspect worst star."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import build_problem
from brutus_tpu.config import FitConfig, PosteriorConfig
from brutus_tpu.ops.optimize import loglike_grid
from brutus_tpu.ops.pallas_loglike import (loglike_grid_fused,
                                           prepare_coeffs, icov_from_parts)
from brutus_tpu.ops.posterior import lnpost_grid

M, F, B = 750_000, 8, 64
(mc, flux, err, idx, feh, loga, parallax, parallax_err) = build_problem(M, F, B)
fx, ex = jnp.asarray(flux), jnp.asarray(err)
px, pxe = jnp.asarray(parallax), jnp.asarray(parallax_err)
coord = jnp.asarray([204.7, -19.2], jnp.float32)
dust = (jnp.linspace(0.05, 10.0, 120, dtype=jnp.float32),
        jnp.linspace(0.0, 1.5, 120, dtype=jnp.float32),
        jnp.full(120, 0.2, jnp.float32))
cfg = FitConfig(mag_direct_init=True)
post_cfg = PosteriorConfig(n_mc_prior=50, n_draws=250, n_sel_max=4096,
                           prefilter_k=8192)
keys = jax.random.split(jax.random.PRNGKey(0), B)

mc_d = jnp.asarray(mc)
feh_d = jnp.asarray(feh, jnp.float32)
loga_d = jnp.asarray(loga, jnp.float32)
lnprior = jnp.zeros(M, jnp.float32)

xla_ll = jax.jit(jax.vmap(
    lambda f, e, p, pe: loglike_grid(f, e, jnp.ones_like(f, bool), mc_d,
                                     parallax=p, parallax_err=pe, cfg=cfg)))(
    fx, ex, px, pxe)
xla_post = jax.jit(jax.vmap(
    lambda k, r, p, pe: lnpost_grid(k, r, lnprior, coord, parallax=p,
                                    parallax_err=pe, feh=feh_d, loga=loga_d,
                                    dust_profile=dust, cfg=post_cfg)))(
    keys, xla_ll, px, pxe)
jax.block_until_ready(xla_post)

coeffs_t, n_real = prepare_coeffs(mc, tile=1024)
Mp = coeffs_t.shape[-1]
lnprior_p = jnp.zeros(Mp, jnp.float32)
feh_p = jnp.concatenate([feh_d, jnp.zeros(Mp - M, jnp.float32)])
loga_p = jnp.concatenate([loga_d, jnp.full(Mp - M, 9.0, jnp.float32)])
fus_ll = loglike_grid_fused(fx, ex, jnp.ones_like(fx, bool), coeffs_t,
                            cfg=cfg, tile=1024, n_real=n_real)
fus_post = jax.jit(jax.vmap(
    lambda k, r, p, pe: lnpost_grid(k, r, lnprior_p, coord, parallax=p,
                                    parallax_err=pe, feh=feh_p, loga=loga_p,
                                    dust_profile=dust, cfg=post_cfg)))(
    keys, fus_ll, px, pxe)
jax.block_until_ready(fus_post)

d1 = np.median(np.asarray(xla_post["dist"]), axis=1)
d2 = np.median(np.asarray(fus_post["dist"]), axis=1)
rel = np.abs(d1 - d2) / d1
b = int(np.argmax(rel))
print(f"worst star {b}: median dist xla={d1[b]:.4f} fus={d2[b]:.4f} "
      f"rel={rel[b]:.3f}; true dist={1.0:.3f}")
print("rel delta percentiles:", np.percentile(rel, [50, 90, 100]).round(4))

for tag, post, ll in (("xla", xla_post, xla_ll), ("fus", fus_post, fus_ll)):
    lnp = np.asarray(post["lnp_sel"][b])
    valid = np.asarray(post["valid_sel"][b])
    sel = np.asarray(post["sel_idx"][b])
    w = np.exp(lnp - lnp.max())
    w /= w.sum()
    eff = 1.0 / np.sum(w ** 2)
    top = np.argsort(-w)[:5]
    print(f"{tag}: n_valid={valid.sum()}, eff_models={eff:.1f}, "
          f"top5 idx={sel[top]} w={w[top].round(3)}")
    print(f"   evid={float(post['log_evidence'][b]):.3f} "
          f"dist draws mean={np.asarray(post['dist'][b]).mean():.4f} "
          f"std={np.asarray(post['dist'][b]).std():.4f}")
    s = np.asarray(ll["scale"][b])
    print(f"   scale at true idx {idx[b]}: {s[idx[b]]:.6f}")
