"""
N-dimensional multilinear interpolation on rectilinear grids (JAX).

Device-side replacement for `scipy.interpolate.RegularGridInterpolator`
(method='linear', bounds_error=False, fill_value=nan), which the
reference uses for the MIST track and isochrone interpolators
(`brutus/seds.py:258-261`, `brutus/seds.py:1204-1208`).  Implemented as
a 2^ndim corner gather + blend, fully batched, so millions of stellar
models interpolate in one fused XLA program.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("fill_nan",))
def interpn(points, values, xi, fill_nan=True):
    """Multilinear interpolation of `values` on the rectilinear grid
    `points`, evaluated at `xi`.

    Parameters
    ----------
    points : tuple of (n_k,) 1-D ascending grid vectors, length `ndim`.
    values : (n_0, ..., n_{ndim-1}, ...) grid values; trailing axes are
        interpolated together (vector-valued output).
    xi : (..., ndim) query points.

    Returns
    -------
    (..., <trailing value axes>) interpolated values; NaN outside the
    grid when `fill_nan` (matching scipy's `fill_value=nan`).
    """
    ndim = len(points)
    idxs, ts, oob = [], [], None
    for k in range(ndim):
        g = jnp.asarray(points[k])
        x = xi[..., k]
        i = jnp.clip(jnp.searchsorted(g, x, side="right") - 1,
                     0, g.shape[0] - 2)
        t = (x - g[i]) / (g[i + 1] - g[i])
        out = (x < g[0]) | (x > g[-1]) | ~jnp.isfinite(x)
        idxs.append(i)
        ts.append(t)
        oob = out if oob is None else (oob | out)

    out = None
    for corner in range(1 << ndim):
        w = None
        gather = []
        for k in range(ndim):
            hi = (corner >> k) & 1
            wk = ts[k] if hi else (1.0 - ts[k])
            w = wk if w is None else w * wk
            gather.append(idxs[k] + hi)
        v = values[tuple(gather)]
        contrib = v * w[(...,) + (None,) * (v.ndim - w.ndim)]
        out = contrib if out is None else out + contrib

    if fill_nan:
        mask = oob[(...,) + (None,) * (out.ndim - oob.ndim)]
        out = jnp.where(mask, jnp.nan, out)
    return out


def interp1d_monotone_bisect(f, lo, hi, n_iter=50):
    """Vectorized bisection root-find of a monotone-increasing function.

    Used to invert `loga(eep)` when age-matching unresolved binary
    secondaries — the TPU-native replacement for the reference's
    per-model `scipy.optimize.minimize` (`brutus/seds.py:601-655`).

    Parameters
    ----------
    f : callable mapping (...,) -> (...,), monotone increasing, may
        return NaN outside the valid domain.
    lo, hi : (...,) bracket arrays.

    Returns
    -------
    x : (...,) root estimates (bisection midpoints after `n_iter`).
    """
    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        fm = f(mid)
        # NaN regions sit at the late-EEP (large-f) end of MIST tracks;
        # treat NaN as "too high" so bisection walks back into validity.
        go_low = (fm > 0) | jnp.isnan(fm)
        hi = jnp.where(go_low, mid, hi)
        lo = jnp.where(go_low, lo, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    return 0.5 * (lo + hi)


__all__ = ["interpn", "interp1d_monotone_bisect"]
