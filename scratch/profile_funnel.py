"""Stage timing of the funnel loglike path on TPU (min + mean)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import build_problem
from brutus_tpu.config import FitConfig
from brutus_tpu.ops import pallas_loglike as PL

M, F, B = 750_000, 8, 64
TILE = 512
SCREEN = 16384
BLOCK = 256
(mc, flux, err, idx, feh, loga, parallax, parallax_err) = build_problem(M, F, B)
cfg = FitConfig(mag_direct_init=True)

coeffs_t, packed, aux_names, n_real, maskrow = PL.prepare_screen(
    mc, aux=dict(lnprior=np.zeros(M, np.float32),
                 feh=feh.astype(np.float32), loga=loga.astype(np.float32)),
    tile=TILE)
Mp = coeffs_t.shape[-1]
fx, ex = jnp.asarray(flux), jnp.asarray(err)
mask = jnp.ones_like(fx, bool)
px, pxe = jnp.asarray(parallax), jnp.asarray(parallax_err)

dtype = coeffs_t.dtype
Bp = B
flux_p, wt_flux, mags, wt_mag, maskp, ndim, tot_var = PL._prep(
    fx.astype(dtype), ex.astype(dtype), mask, cfg)
plx, plxw = PL._screen_parallax(px, pxe)

grp = lambda x: x.reshape(Bp // PL.GROUP, PL.GROUP, F).swapaxes(1, 2)
vec = lambda x: x.reshape(Bp // PL.GROUP, PL.GROUP, 1)
g_mags, g_wtm = grp(mags), grp(wt_mag)
g_flux, g_wtf = grp(flux_p), grp(wt_flux)
v_plx, v_plxw = vec(plx), vec(plxw)

screen = PL._make_screen_call(cfg, Bp, F, Mp, TILE, str(dtype), False)

nb = SCREEN // BLOCK
P = nb * BLOCK


def timeit(name, fn, n=16):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts) * 1e3
    print(f"{name:34s} min {ts.min():8.2f}  med {np.median(ts):8.2f} "
          f" mean {ts.mean():8.2f} ms")
    return out


score = timeit("screen kernel", lambda: screen(
    g_mags, g_wtm, v_plx, v_plxw, maskrow, coeffs_t))

sel = timeit("select blocks", lambda: PL._select_blocks(score, nb, BLOCK))
bidx, gidx = sel

gather = PL._make_gather_call(packed.shape[0], Mp, Bp, nb, BLOCK, False)
out = timeit("DMA slab gather", lambda: gather(bidx, packed))

unp = timeit("unpack", lambda: PL._unpack_gather(out, 3 * F, Bp))
coeffs2 = unp[0]

call2 = PL._make_call(cfg, Bp, F, P, TILE, str(dtype), False, True)
outs = timeit("stage-2 kernel (64,16384)", lambda: call2(
    g_flux, g_wtf, g_mags, g_wtm, coeffs2))

post = timeit("_post", lambda: PL._post(
    tuple(outs), maskp, ndim, tot_var, cfg, n_real=None,
    bad=(gidx >= n_real)))

full = timeit("loglike_grid_screened total", lambda: PL.loglike_grid_screened(
    fx, ex, mask, coeffs_t, packed, maskrow, n_real,
    parallax=px, parallax_err=pxe, cfg=cfg, tile=TILE, screen_k=SCREEN,
    screen_block=BLOCK, aux_names=aux_names))
