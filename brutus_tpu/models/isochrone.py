"""
MIST isochrone interpolator + co-eval population SED generator.

Parity: reference `brutus/seds.py:1081-1502` (`Isochrone`): interpolate
the MIST isochrone tables over `(feh, afe, loga, eep)` with EEP
hole-filling, apply the empirical Teff/radius corrections, and generate
the SED of a full co-eval population (every EEP along the isochrone),
including unresolved binaries parameterized by secondary mass fraction.
"""

import sys
from collections import namedtuple

import numpy as np
import h5py
import jax.numpy as jnp

from ..utils import add_mag
from ..ops.interp import interpn
from .nn import FastNNPredictor, sed_params
from .tracks import empirical_corrections

DEFAULT_PREDICTIONS = ["mini", "mass", "logl", "logt", "logr", "logg",
                       "feh_surf", "afe_surf"]

# Static prediction-column indices threaded through the jitted
# pure-function path (hashable, so it can ride static_argnames).
IsoIdx = namedtuple("IsoIdx", ["logt", "logl", "logg", "feh_surf",
                               "afe_surf", "mini"])


def iso_predictions(xgrid, ygrid, idx, eep, feh, afe, loga,
                    corr_params=None, apply_corr=True):
    """Pure-function isochrone predictions (jit-friendly: the grid
    tables ride as *arguments*, never closure constants).

    Parameters
    ----------
    xgrid : tuple of 4 grid vectors `(feh, afe, loga, eep)`.
    ygrid : (..., Neep_grid, Npred) prediction table.
    idx : `IsoIdx` static column indices.
    eep : (...,) query EEPs; `feh/afe/loga` broadcast against it.

    Returns `(..., Npred)` predictions with the empirical Teff/radius
    corrections applied (reference `brutus/seds.py:1218-1358`).
    """
    eep = jnp.asarray(eep, float)
    feh_v = jnp.broadcast_to(jnp.asarray(feh, float), eep.shape)
    afe_v = jnp.broadcast_to(jnp.asarray(afe, float), eep.shape)
    loga_v = jnp.broadcast_to(jnp.asarray(loga, float), eep.shape)
    labels = jnp.stack([feh_v, afe_v, loga_v, eep], axis=-1)
    preds = interpn(xgrid, ygrid, labels)
    if apply_corr:
        mini = preds[..., idx.mini]
        dlogt, dlogr = empirical_corrections(mini, eep, feh_v, corr_params)
        preds = preds.at[..., idx.logt].add(dlogt)
        preds = preds.at[..., idx.logl].add(2.0 * dlogr)
        preds = preds.at[..., idx.logg].add(-2.0 * dlogr)
    return preds


def _nn_sed(nn_params, idx, preds, av, rv, dist, mini_bound):
    """SED from a prediction vector via the BC networks; NaN below the
    `mini_bound` mass cut."""
    sed = sed_params(nn_params,
                     logt=preds[..., idx.logt], logg=preds[..., idx.logg],
                     feh_surf=preds[..., idx.feh_surf],
                     afe=preds[..., idx.afe_surf],
                     logl=preds[..., idx.logl], av=av, rv=rv, dist=dist)
    ok = preds[..., idx.mini] >= mini_bound
    return jnp.where(ok[..., None], sed, jnp.nan)


def population_seds_multi(xgrid, ygrid, nn_params, idx, eep, feh, afe,
                          loga, av, rv, dist, smf_vals, mini_bound,
                          eep_binary_max, corr_params=None):
    """Co-eval population SEDs at every EEP for EVERY secondary mass
    fraction in `smf_vals` — one device program.

    The reference regenerates the isochrone per smf in a Python loop
    (`brutus/cluster.py:336-344`); here the primary is interpolated and
    NN-evaluated once, and all binary smf values share one batched
    secondary pass (`(Nsmf_bin, Neep)` stacked interpolation + NN), so
    a jitted cluster-likelihood evaluation is a single XLA program.

    Parameters
    ----------
    smf_vals : static tuple of floats (0 = single star, 1 = equal-mass
        doubling on the main sequence, else mass-fraction binaries —
        reference `brutus/seds.py:1464-1496`).

    Returns
    -------
    seds : (Nsmf, Neep, Nfilt) apparent magnitudes (NaN = invalid).
    mini : (Neep,) primary initial masses (the IMF-measure axis).
    """
    eep = jnp.asarray(eep, float)
    params = iso_predictions(xgrid, ygrid, idx, eep, feh, afe, loga,
                             corr_params)
    mini = params[:, idx.mini]
    sed1 = _nn_sed(nn_params, idx, params, av, rv, dist, mini_bound)

    bin_smfs = tuple(s for s in smf_vals if 0.0 < s < 1.0)
    seds_bin = None
    if bin_smfs:
        # Invert the monotone mini(eep) relation once; all binary smf
        # values query it together (reference seds.py:1467-1478).
        good = jnp.isfinite(mini)
        mini_sorted = jnp.where(good, mini, jnp.inf)
        order = jnp.argsort(mini_sorted)
        mg, eg = mini_sorted[order], eep[order]
        smf_arr = jnp.asarray(bin_smfs, float)[:, None]    # (Nb, 1)
        eep2 = jnp.interp(mini[None] * smf_arr, mg, eg,
                          left=jnp.nan, right=jnp.nan)     # (Nb, Neep)
        eep2 = jnp.where((eep2 > eep_binary_max)
                         | (eep[None] > eep_binary_max), jnp.nan, eep2)
        params2 = iso_predictions(xgrid, ygrid, idx, eep2, feh, afe,
                                  loga, corr_params)
        sed2 = _nn_sed(nn_params, idx, params2, av, rv, dist, mini_bound)
        seds_bin = add_mag(sed1[None], sed2)               # (Nb, Neep, F)

    out, k = [], 0
    for smf in smf_vals:
        if smf == 0.0:
            out.append(sed1)
        elif smf == 1.0:
            boost = jnp.where((eep <= eep_binary_max)[:, None],
                              2.5 * jnp.log10(2.0), 0.0)
            out.append(sed1 - boost)
        else:
            out.append(seds_bin[k])
            k += 1
    return jnp.stack(out), mini


class Isochrone:
    """Isochrone SED generator over the `(feh, afe, loga, eep)` grid."""

    def __init__(self, filters=None, nnfile=None, mistfile=None,
                 predictions=None, verbose=True):
        from ..filters import FILTERS
        if filters is None:
            filters = list(FILTERS)
        self.filters = list(filters)
        if verbose:
            sys.stderr.write(f"Filters: {filters}\n")
        if mistfile is None:
            mistfile = "data/DATAFILES/MIST_1.2_iso_vvcrit0.0.h5"

        if verbose:
            sys.stderr.write("Constructing MIST isochrones...")
        with h5py.File(mistfile, "r") as f:
            feh_grid = f["feh"][:]
            afe_grid = f["afe"][:]
            loga_grid = f["loga"][:]
            eep_grid = f["eep"][:]
            pred_grid = np.asarray(f["predictions"][:], dtype=float)
            self.pred_labels = [
                s.decode() if isinstance(s, bytes) else str(s)
                for s in f["predictions"].attrs["labels"]]
        # Column order follows the file's own label attribute.
        self.predictions = list(predictions) if predictions is not None \
            else self.pred_labels

        self.feh_u = np.unique(feh_grid)
        self.afe_u = np.unique(afe_grid)
        self.loga_u = np.unique(loga_grid)
        self.eep_u = np.unique(eep_grid)

        # Fill EEP "holes" by linear interpolation along each isochrone
        # (reference brutus/seds.py:1172-1187).
        for i in range(len(self.feh_u)):
            for j in range(len(self.afe_u)):
                for k in range(len(self.loga_u)):
                    sel = np.all(np.isfinite(pred_grid[i, j, k]), axis=1)
                    if 2 <= sel.sum() < len(self.eep_u):
                        for p in range(pred_grid.shape[-1]):
                            pred_grid[i, j, k, :, p] = np.interp(
                                self.eep_u, self.eep_u[sel],
                                pred_grid[i, j, k, sel, p],
                                left=np.nan, right=np.nan)

        # Pad singleton afe axis (reference seds.py:1189-1201).
        xgrid = [self.feh_u.astype(float), self.afe_u.astype(float),
                 self.loga_u.astype(float), self.eep_u.astype(float)]
        if len(xgrid[1]) == 1:
            v = xgrid[1][0]
            xgrid[1] = np.array([v - 1e-5, v + 1e-5])
            pred_grid = np.concatenate([pred_grid, pred_grid], axis=1)

        self.xgrid = tuple(jnp.asarray(g) for g in xgrid)
        self.ygrid = jnp.asarray(pred_grid)
        if verbose:
            sys.stderr.write("done!\n")

        for name in ("logt", "logl", "logg", "feh_surf", "mini"):
            setattr(self, f"{name}_idx", self.predictions.index(name))
        self.afe_surf_idx = self.predictions.index("afe_surf")

        self.FNNP = FastNNPredictor(filters=filters, nnfile=nnfile,
                                    verbose=verbose)

    @property
    def iso_idx(self):
        """Static `IsoIdx` for the pure-function path
        (`iso_predictions` / `population_seds_multi`)."""
        return IsoIdx(self.logt_idx, self.logl_idx, self.logg_idx,
                      self.feh_surf_idx, self.afe_surf_idx, self.mini_idx)

    @property
    def tables(self):
        """Device tables `(xgrid, ygrid, nn_params)` for jitted callers
        (pass as jit *arguments*, never closure constants)."""
        return (self.xgrid, self.ygrid, self.FNNP.params)

    # -- predictions (parity: reference seds.py:1218-1358) -----------------

    def get_predictions(self, feh=0.0, afe=0.0, loga=8.5, eep=None,
                        apply_corr=True, corr_params=None):
        """Predictions along the isochrone at the given EEP grid.

        Returns (Neep, Npred).
        """
        if eep is None:
            eep = self.eep_u
        return iso_predictions(self.xgrid, self.ygrid, self.iso_idx,
                               eep, feh, afe, loga, corr_params,
                               apply_corr=apply_corr)

    def get_corrections(self, mini=1.0, feh=0.0, eep=350.0,
                        corr_params=None):
        return empirical_corrections(mini, eep, feh, corr_params)

    # -- population SEDs (parity: reference seds.py:1360-1502) -------------

    def get_seds(self, feh=0.0, afe=0.0, loga=8.5, eep=None, av=0.0,
                 rv=3.3, smf=0.0, dist=1000.0, mini_bound=0.5,
                 eep_binary_max=480.0, apply_corr=True, corr_params=None,
                 return_dict=True, **kwargs):
        """SEDs of the full co-eval population at every EEP.

        Returns `(seds (Neep, Nfilt), params, params2)`; binaries with
        `0 < smf < 1` have their secondary EEP located by interpolating
        the monotone `mini(eep)` relation along the isochrone, and
        `smf == 1` doubles the flux on the main sequence (reference
        seds.py:1464-1496).
        """
        if eep is None:
            eep = self.eep_u
        eep = jnp.asarray(eep, float)
        params = self.get_predictions(feh=feh, afe=afe, loga=loga, eep=eep,
                                      apply_corr=apply_corr,
                                      corr_params=corr_params)
        mini = params[:, self.mini_idx]

        def nn(p, ok):
            sed = self.FNNP.sed(
                logt=p[:, self.logt_idx], logg=p[:, self.logg_idx],
                feh_surf=p[:, self.feh_surf_idx],
                afe=p[:, self.afe_surf_idx], logl=p[:, self.logl_idx],
                av=av, rv=rv, dist=dist)
            return jnp.where(ok[:, None], sed, jnp.nan)

        seds = nn(params, mini >= mini_bound)
        params2 = jnp.full_like(params, jnp.nan)

        if 0.0 < smf < 1.0:
            mini2 = mini * smf
            # Invert the monotone mini(eep) relation by interpolation
            # (reference seds.py:1467-1478).
            good = jnp.isfinite(mini)
            mini_sorted = jnp.where(good, mini, jnp.inf)
            order = jnp.argsort(mini_sorted)
            mg, eg = mini_sorted[order], eep[order]
            eep2 = jnp.interp(mini2, mg, eg, left=jnp.nan, right=jnp.nan)
            eep2 = jnp.where((eep2 > eep_binary_max)
                             | (eep > eep_binary_max), jnp.nan, eep2)
            labels2 = jnp.stack([jnp.full_like(eep2, feh),
                                 jnp.full_like(eep2, afe),
                                 jnp.full_like(eep2, loga), eep2], axis=-1)
            params2 = interpn(self.xgrid, self.ygrid, labels2)
            if apply_corr:
                m2 = params2[..., self.mini_idx]
                dlogt, dlogr = empirical_corrections(
                    m2, eep2, jnp.full_like(eep2, feh), corr_params)
                params2 = params2.at[..., self.logt_idx].add(dlogt)
                params2 = params2.at[..., self.logl_idx].add(2.0 * dlogr)
                params2 = params2.at[..., self.logg_idx].add(-2.0 * dlogr)
            seds2 = nn(params2, params2[:, self.mini_idx] >= mini_bound)
            seds = add_mag(seds, seds2)
        elif smf == 1.0:
            boost = jnp.where((eep <= eep_binary_max)[:, None],
                              2.5 * jnp.log10(2.0), 0.0)
            seds = seds - boost
            params2 = params

        if return_dict:
            p1 = {n: np.asarray(params[:, i])
                  for i, n in enumerate(self.predictions)}
            p2 = {n: np.asarray(params2[:, i])
                  for i, n in enumerate(self.predictions)}
            return seds, p1, p2
        return seds, params, params2


def write_isochrone_file(path, feh_grid, afe_grid, loga_grid, eep_grid,
                         pred_grid, pred_labels):
    """Write an isochrone-schema HDF5 (test fixtures)."""
    with h5py.File(path, "w") as f:
        f.create_dataset("feh", data=feh_grid)
        f.create_dataset("afe", data=afe_grid)
        f.create_dataset("loga", data=loga_grid)
        f.create_dataset("eep", data=eep_grid)
        d = f.create_dataset("predictions", data=pred_grid)
        d.attrs["labels"] = [np.bytes_(s) for s in pred_labels]


__all__ = ["Isochrone", "write_isochrone_file", "DEFAULT_PREDICTIONS",
           "IsoIdx", "iso_predictions", "population_seds_multi"]
