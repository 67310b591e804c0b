"""
SED grid generation (the offline producer of the `(Nmodel, Nfilt, 3)`
coefficient grids consumed by `fitting.BruteForce`).

Parity: reference `brutus/seds.py:387-857` (`SEDmaker`): for every
label tuple `(mini, eep, feh, afe, smf)`, predict stellar parameters
from the MIST tracks, evaluate band photometry through the BC neural
nets over a weighted `(Av, Rv)` lattice, and fit the linear reddening
coefficients `(mag, dAv, dRv)` per band.

TPU-first redesign: the reference loops 818,620 models through Python
at ~18.5 ms/model (~4.2 h; demos/Overview 2).  Here the whole grid is
evaluated in chunked batched XLA programs — N-D interpolation, a
vectorized bisection for binary age-matching (replacing per-model
`scipy.optimize.minimize`, reference seds.py:601-655), one large MXU
matmul for all NN evaluations, and closed-form weighted least squares
for the reddening coefficients (replacing per-model `np.polyfit`).
"""

import sys
import time
from itertools import product

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import add_mag
from ..ops.interp import interp1d_monotone_bisect
from .tracks import MISTtracks
from .nn import FastNNPredictor


def _wls_line(x, y, w):
    """Weighted straight-line fit `y ~ intercept + slope * x` along the
    x-axis of `y`'s second-to-last dim... fitted along axis `-2` of y.

    Matches `np.polyfit(x, y, 1, w=w)`: minimizes sum (w*(y - p(x)))^2,
    i.e. effective weights w^2.

    x, w : (N,); y : (..., N, B)  ->  slope, intercept : (..., B)
    """
    W = (w * w)[:, None]
    x_ = x[:, None]
    sw = jnp.sum(W, axis=-2)
    swx = jnp.sum(W * x_, axis=-2)
    swxx = jnp.sum(W * x_ * x_, axis=-2)
    swy = jnp.sum(W * y, axis=-2)
    swxy = jnp.sum(W * x_ * y, axis=-2)
    denom = sw * swxx - swx * swx
    slope = (sw * swxy - swx * swy) / denom
    intercept = (swy * swxx - swx * swxy) / denom
    return slope, intercept


class SEDmaker(MISTtracks):
    """Generate SED coefficient grids from MIST tracks + BC networks.

    Parity: reference `brutus/seds.py:387-443`.
    """

    def __init__(self, filters=None, nnfile=None, mistfile=None,
                 predictions=None, ageweight=True, verbose=True):
        from ..filters import FILTERS
        if filters is None:
            filters = list(FILTERS)
        self.filters = list(filters)
        if verbose:
            sys.stderr.write(f"Filters: {filters}\n")
        super().__init__(mistfile=mistfile, predictions=predictions,
                         ageweight=ageweight, verbose=verbose)
        self.FNNP = FastNNPredictor(filters=filters, nnfile=nnfile,
                                    verbose=verbose)

    # -- binary age-matching ----------------------------------------------

    def get_eep(self, loga, mini=1.0, eep=350.0, feh=0.0, afe=0.0,
                smf=1.0, tol=1e-3):
        """EEP of a secondary of mass `mini*smf` with the same age.

        Vectorized monotone bisection on `loga(eep)` (the reference
        solves this per model with `scipy.optimize.minimize`,
        seds.py:601-655).  All arguments broadcast.
        """
        loga, mini, eep, feh, afe, smf = jnp.broadcast_arrays(
            *[jnp.asarray(v, float) for v in
              (loga, mini, eep, feh, afe, smf)])
        eep_lo = jnp.full_like(loga, self.gridpoints["eep"][0])
        eep_hi = jnp.full_like(loga, self.gridpoints["eep"][-1])
        mini2 = mini * smf

        def f(e):
            labels = jnp.stack([mini2, e, feh, afe], axis=-1)
            return self.get_predictions(labels,
                                        apply_corr=False)[..., self._ageidx] \
                - loga

        eep2 = interp1d_monotone_bisect(f, eep_lo, eep_hi)
        resid = f(eep2)
        return jnp.where(resid ** 2 < tol, eep2, jnp.nan)

    # -- single-model API (parity: reference seds.py:445-599) -------------

    def get_sed(self, mini=1.0, eep=350.0, feh=0.0, afe=0.0, av=0.0,
                rv=3.3, smf=0.0, dist=1000.0, loga_max=10.14,
                eep_binary_max=480.0, tol=1e-3, mini_bound=0.5,
                apply_corr=True, corr_params=None, eep2=None,
                return_eep2=False, return_dict=True, **kwargs):
        """SED + parameters for one model (thin wrapper over the batched
        path; returns NaNs exactly where the reference does)."""
        sed, params, params2, eep2_out = self._seds_batch(
            np.atleast_1d(mini), np.atleast_1d(eep), np.atleast_1d(feh),
            np.atleast_1d(afe), np.atleast_1d(smf),
            av=np.atleast_1d(av), rv=np.atleast_1d(rv), dist=dist,
            loga_max=loga_max, eep_binary_max=eep_binary_max,
            mini_bound=mini_bound, apply_corr=apply_corr,
            corr_params=corr_params, tol=tol,
            eep2=None if eep2 is None else np.atleast_1d(eep2))
        sed = np.asarray(sed[0, 0])
        p1 = np.asarray(params[0])
        p2 = np.asarray(params2[0])
        if return_dict:
            p1 = dict(zip(self.predictions, p1))
            p2 = dict(zip(self.predictions, p2))
        if return_eep2:
            return sed, p1, p2, float(eep2_out[0])
        return sed, p1, p2

    def _seds_batch(self, mini, eep, feh, afe, smf, av, rv, dist=1000.0,
                    loga_max=10.14, eep_binary_max=480.0, mini_bound=0.5,
                    apply_corr=True, corr_params=None, tol=1e-3,
                    eep2=None):
        """Batched SEDs at per-model `(av, rv)`.

        Shapes: all label args (N,); av/rv broadcastable to (N,) or
        (N, L) for an extinction lattice.  Returns
        `(seds (N[,L],F), params (N,npred), params2, eep2 (N,))`.
        """
        labels = jnp.stack([jnp.asarray(v, float)
                            for v in (mini, eep, feh, afe)], axis=-1)
        params = self.get_predictions(labels, apply_corr=apply_corr,
                                      corr_params=corr_params)
        loga = params[..., self._ageidx]
        mini = jnp.asarray(mini, float)
        eep = jnp.asarray(eep, float)
        smf = jnp.asarray(smf, float)
        mini_min = max(self.mini_bound, mini_bound)

        def nn_sed(p):
            return self.FNNP.sed(
                logt=p[..., self.logt_idx, None] + 0 * jnp.asarray(av),
                logg=p[..., self.logg_idx, None] + 0 * jnp.asarray(av),
                feh_surf=p[..., self.predictions.index("feh_surf"),
                           None] + 0 * jnp.asarray(av),
                afe=p[..., self.predictions.index("afe_surf"),
                      None] + 0 * jnp.asarray(av),
                logl=p[..., self.logl_idx, None] + 0 * jnp.asarray(av),
                av=jnp.asarray(av), rv=jnp.asarray(rv), dist=dist)

        # Primary SED; age gate (reference seds.py:556-564).
        sed = nn_sed(params)
        lat_shape = sed.shape[:-1]
        ok_age = (loga <= loga_max) & jnp.isfinite(loga)
        sed = jnp.where(_expand(ok_age, sed), sed, jnp.nan)

        # Unresolved binary companion (reference seds.py:565-590).
        is_bin = smf > 0.0
        bin_ok = is_bin & (eep <= eep_binary_max) & (mini * smf >= mini_min)
        if eep2 is None:
            eep2 = jnp.where(
                bin_ok,
                self.get_eep(loga, mini=mini, eep=eep,
                             feh=labels[..., 2], afe=labels[..., 3],
                             smf=smf, tol=tol),
                jnp.nan)
        else:
            eep2 = jnp.asarray(eep2, float)
        labels2 = jnp.stack([mini * smf, eep2, labels[..., 2],
                             labels[..., 3]], axis=-1)
        params2 = self.get_predictions(labels2, apply_corr=apply_corr,
                                       corr_params=corr_params)
        sed2 = nn_sed(params2)
        combined = add_mag(sed, sed2)
        sed = jnp.where(_expand(bin_ok, sed), combined,
                        jnp.where(_expand(is_bin, sed), jnp.nan, sed))
        params2 = jnp.where(bin_ok[..., None], params2, jnp.nan)
        return sed, params, params2, eep2

    # -- grid generation (parity: reference seds.py:657-857) --------------

    def make_grid(self, mini_grid=None, eep_grid=None, feh_grid=None,
                  afe_grid=None, smf_grid=None, av_grid=None, av_wt=None,
                  rv_grid=None, rv_wt=None, dist=1000.0, loga_max=10.14,
                  eep_binary_max=480.0, mini_bound=0.5, apply_corr=True,
                  corr_params=None, chunk=8192, verbose=True, **kwargs):
        """Generate `(mag, dAv, dRv)` coefficients over the label grid.

        Default grids reproduce the reference's 818,620-model layout
        (seds.py:754-776): mini 0.5..2.0 step 0.025; adaptive EEP and
        [Fe/H] grids; afe -0.2..0.6 step 0.2; single stars only.
        """
        if mini_grid is None:
            mini_grid = np.arange(0.5, 2.0 + 1e-5, 0.025)
        if eep_grid is None:
            eep_grid = np.concatenate([np.arange(202.0, 454.0, 6.0),
                                       np.arange(454.0, 808.0 + 1e-5, 2.0)])
        if feh_grid is None:
            feh_grid = np.concatenate([np.arange(-3.0, -2.0, 0.1),
                                       np.arange(-2.0, 0.5 + 1e-5, 0.05)])
        if afe_grid is None:
            afe_grid = np.arange(-0.2, 0.6 + 1e-5, 0.2)
        if smf_grid is None:
            smf_grid = np.array([0.0])
        if av_grid is None:
            av_grid = np.arange(0.0, 1.5 + 1e-5, 0.3)
            av_grid[-1] -= 1e-5
        if av_wt is None:
            av_wt = (1e-5 + av_grid) ** -1.0   # pivot through Av=0
        if rv_grid is None:
            rv_grid = np.arange(2.4, 4.2 + 1e-5, 0.3)
        if rv_wt is None:
            rv_wt = np.exp(-np.abs(rv_grid - 3.3) / 0.5)

        label_names = ["mini", "eep", "feh", "afe", "smf"]
        ltype = np.dtype([(n, float) for n in label_names])
        grid_label = np.array(list(product(mini_grid, eep_grid, feh_grid,
                                           afe_grid, smf_grid)),
                              dtype=ltype)
        n_grid = len(grid_label)

        ptype = np.dtype([(n, float) for n in self.predictions])
        stype = np.dtype([(n, float, 3) for n in self.filters])
        self.grid_label = grid_label
        self.grid_param = np.full(n_grid, np.nan, dtype=ptype)
        self.grid_sed = np.full(n_grid, np.nan, dtype=stype)
        self.grid_sel = np.zeros(n_grid, dtype=bool)

        # Extinction lattice, flattened to (L,) with L = Nrv * Nav.
        avl = jnp.asarray(np.tile(av_grid, len(rv_grid)))
        rvl = jnp.asarray(np.repeat(rv_grid, len(av_grid)))
        av_grid_j = jnp.asarray(av_grid)
        rv_grid_j = jnp.asarray(rv_grid)
        av_wt_j = jnp.asarray(av_wt)
        rv_wt_j = jnp.asarray(rv_wt)
        n_av, n_rv = len(av_grid), len(rv_grid)

        @jax.jit
        def chunk_step(mini, eep, feh, afe, smf):
            # SEDs over the lattice (C, L, F) + intrinsic SED (C, F).
            seds, params, params2, eep2 = self._seds_batch(
                mini, eep, feh, afe, smf, av=avl, rv=rvl, dist=dist,
                loga_max=loga_max, eep_binary_max=eep_binary_max,
                mini_bound=mini_bound, apply_corr=apply_corr,
                corr_params=corr_params)
            sed0, _, _, _ = self._seds_batch(
                mini, eep, feh, afe, smf,
                av=jnp.zeros_like(mini)[:, None],
                rv=jnp.full_like(mini, 3.3)[:, None], dist=dist,
                loga_max=loga_max, eep_binary_max=eep_binary_max,
                mini_bound=mini_bound, apply_corr=apply_corr,
                corr_params=corr_params, eep2=eep2)
            sed0 = sed0[:, 0]
            nf = sed0.shape[-1]
            lat = seds.reshape(seds.shape[0], n_rv, n_av, nf)
            # Av fit at fixed Rv (slope per rv), then the slope's own
            # linear trend in Rv (reference seds.py:828-832).
            av_slope, _ = _wls_line(av_grid_j, lat, av_wt_j)  # (C,Nrv,F)
            sedr, seda = _wls_line(rv_grid_j, av_slope, rv_wt_j)  # (C,F)
            good = (jnp.all(jnp.isfinite(sed0), axis=-1)
                    & jnp.all(jnp.isfinite(params), axis=-1))
            # One packed output: the device->host link pays a round
            # trip per fetched array, so the five results travel as a
            # single (C, 3F + Npred + 1) matrix.
            return jnp.concatenate(
                [sed0, seda, sedr, params,
                 good[:, None].astype(sed0.dtype)], axis=1)

        nf = len(self.filters)
        npred = len(self.predictions)

        def consume(lo, hi, flat):
            flat = np.asarray(flat)
            sed0 = flat[:, :nf]
            seda = flat[:, nf:2 * nf]
            sedr = flat[:, 2 * nf:3 * nf]
            params = flat[:, 3 * nf:3 * nf + npred]
            good = flat[:, -1] > 0.5
            coeffs = np.stack([sed0, seda, sedr], axis=-1)  # (C, F, 3)
            coeffs[~good] = np.nan
            for i, name in enumerate(self.filters):
                self.grid_sed[name][lo:hi] = coeffs[:, i, :]
            for i, name in enumerate(self.predictions):
                self.grid_param[name][lo:hi] = params[:, i]
            self.grid_sel[lo:hi] = good

        t0 = time.time()
        pending = None    # one chunk of device lookahead
        for lo in range(0, n_grid, chunk):
            hi = min(lo + chunk, n_grid)
            g = grid_label[lo:hi]
            flat = chunk_step(
                jnp.asarray(g["mini"]), jnp.asarray(g["eep"]),
                jnp.asarray(g["feh"]), jnp.asarray(g["afe"]),
                jnp.asarray(g["smf"]))
            if hasattr(flat, "copy_to_host_async"):
                flat.copy_to_host_async()
            if pending is not None:
                consume(*pending)
            pending = (lo, hi, flat)
            if verbose:
                rate = (time.time() - t0) / hi
                sys.stderr.write(
                    f"\rConstructing grid {100.0 * hi / n_grid:6.3f}% "
                    f"({hi}/{n_grid}) (t/obj: {rate * 1e3:.3f} ms, "
                    f"est. remaining: {rate * (n_grid - hi):.1f} s)   ")
                sys.stderr.flush()
        if pending is not None:
            consume(*pending)
        if verbose:
            sys.stderr.write("\n")

    def to_hdf5(self, filepath):
        """Dump the generated grid in the schema `io.load_models` reads."""
        from ..io import save_models
        coeffs = np.stack([self.grid_sed[name] for name in self.filters],
                          axis=1)
        save_models(filepath, coeffs, self.grid_label, self.filters,
                    parameters=self.grid_param)


def _expand(mask, ref):
    """Broadcast a (N,) mask against (N[,L],F) arrays."""
    extra = ref.ndim - mask.ndim
    return mask[(...,) + (None,) * extra]


__all__ = ["SEDmaker"]
