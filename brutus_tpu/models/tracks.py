"""
MIST stellar evolution track interpolator.

Parity: reference `brutus/seds.py:49-384` (`MISTtracks`): loads the
MIST v1.2 EEP-track HDF5 library, arranges it on the rectilinear
`(mini, eep, feh, afe)` label grid, attaches d(age)/d(EEP) "age
weights", and serves multilinear predictions of
`[loga, logl, logt, logg, feh_surf, afe_surf(, agewt)]` with optional
empirical corrections to Teff/radius below 1 Msun.

Host-side numpy handles the one-time library restructuring; predictions
run on device through `brutus_tpu.ops.interp.interpn` so the entire
~800k-model grid evaluates in one batched XLA program.
"""

import sys

import numpy as np
import h5py
import jax.numpy as jnp

from ..ops.interp import interpn

# HDF5 column names for each public label/prediction
# (reference `brutus/seds.py:32-43`).
RENAME = {"mini": "initial_mass", "eep": "EEP", "feh": "initial_[Fe/H]",
          "afe": "initial_[a/Fe]", "mass": "star_mass",
          "feh_surf": "[Fe/H]", "afe_surf": "[a/Fe]", "loga": "log_age",
          "logt": "log_Teff", "logg": "log_g", "logl": "log_L",
          "logr": "log_R"}

DEFAULT_PREDICTIONS = ["loga", "logl", "logt", "logg",
                       "feh_surf", "afe_surf"]
DEFAULT_CORR_PARAMS = (0.09, -0.09, 30.0, 0.5)


def empirical_corrections(mini, eep, feh, corr_params=None):
    """Empirical (dlogt, dlogr) corrections vs mass/EEP/metallicity.

    Parity: reference `brutus/seds.py:314-384` — corrections vanish at
    and above 1 Msun, decay exponentially past the MSTO (eep=454), and
    scale as exp(feh_scale * feh).
    """
    dtdm, drdm, msto_smooth, feh_scale = (corr_params or
                                          DEFAULT_CORR_PARAMS)
    mini = jnp.asarray(mini)
    dlogt = jnp.log10(1.0 + (mini - 1.0) * dtdm)
    dlogr = jnp.log10(1.0 + (mini - 1.0) * drdm)
    ecorr = 1.0 - 1.0 / (1.0 + jnp.exp(-(jnp.asarray(eep) - 454.0)
                                       / msto_smooth))
    fcorr = jnp.exp(feh_scale * jnp.asarray(feh))
    on = mini < 1.0
    dlogt = jnp.where(on, dlogt * ecorr * fcorr, 0.0)
    dlogr = jnp.where(on, dlogr * ecorr * fcorr, 0.0)
    return dlogt, dlogr


def apply_corrections(preds, dlogt, dlogr, logt_idx, logl_idx, logg_idx):
    """Fold (dlogt, dlogr) into the prediction vector:
    logt += dlogt, logl += 2 dlogr, logg -= 2 dlogr
    (reference `brutus/seds.py:299-311`)."""
    preds = preds.at[..., logt_idx].add(dlogt)
    preds = preds.at[..., logl_idx].add(2.0 * dlogr)
    preds = preds.at[..., logg_idx].add(-2.0 * dlogr)
    return preds


class MISTtracks:
    """Multilinear interpolator over the MIST EEP-track library."""

    def __init__(self, mistfile=None, predictions=None, ageweight=True,
                 verbose=True):
        self.labels = ["mini", "eep", "feh", "afe"]
        self.predictions = list(predictions or DEFAULT_PREDICTIONS)
        if mistfile is None:
            mistfile = "data/DATAFILES/MIST_1.2_EEPtrk.h5"
        self.mistfile = mistfile

        self._ageidx = self.predictions.index("loga")
        if verbose:
            sys.stderr.write("Constructing MIST library...")
        libparams, output = self._read_library(mistfile)
        if verbose:
            sys.stderr.write("done!\n")

        # Rectilinear grid points per label.
        self.gridpoints = {p: np.unique(libparams[p]) for p in self.labels}
        self.mini_bound = self.gridpoints["mini"].min()

        # Scatter library rows onto the dense grid (NaN where absent).
        dims = [len(self.gridpoints[p]) for p in self.labels]
        idx = tuple(
            np.searchsorted(self.gridpoints[p], libparams[p])
            for p in self.labels)
        ygrid = np.full(dims + [output.shape[1]], np.nan)
        ygrid[idx] = output

        if ageweight:
            ygrid = self._add_age_weights(ygrid)
            self.predictions = self.predictions + ["agewt"]

        # Pad a singleton afe axis so multilinear interpolation works
        # (reference brutus/seds.py:243-255).
        xgrid = [self.gridpoints[p].astype(float) for p in self.labels]
        if len(xgrid[3]) == 1:
            v = xgrid[3][0]
            xgrid[3] = np.array([v - 1e-5, v + 1e-5])
            ygrid = np.concatenate([ygrid, ygrid], axis=3)

        self.xgrid = tuple(jnp.asarray(g) for g in xgrid)
        self.ygrid = jnp.asarray(ygrid)
        self.logt_idx = self.predictions.index("logt")
        self.logl_idx = self.predictions.index("logl")
        self.logg_idx = self.predictions.index("logg")
        self.ndim, self.npred = len(self.labels), len(self.predictions)

    def _read_library(self, mistfile):
        """Concatenate all tracks listed under the file's `index`
        (reference `brutus/seds.py:113-152` schema)."""
        with h5py.File(mistfile, "r") as f:
            names = [z for z in f["index"]]
            lab_cols = [RENAME[p] for p in self.labels]
            pred_cols = [RENAME[p] for p in self.predictions]
            lib = []
            out = []
            for z in names:
                arr = f[z][:]
                lib.append(np.stack([arr[c] for c in lab_cols], axis=-1))
                row = []
                for c in pred_cols:
                    if c in arr.dtype.names:
                        row.append(arr[c])
                    elif c == RENAME["afe_surf"]:
                        # afe_surf missing: zero-fill (seds.py:143-152)
                        row.append(np.zeros(len(arr)))
                    else:
                        raise KeyError(c)
                out.append(np.stack(row, axis=-1))
        lib = np.concatenate(lib)
        libparams = {p: lib[:, i] for i, p in enumerate(self.labels)}
        return libparams, np.concatenate(out)

    def _add_age_weights(self, ygrid):
        """d(age)/d(EEP) along each track (reference seds.py:179-223)."""
        age = 10.0 ** ygrid[..., self._ageidx]       # (mini, eep, feh, afe)
        agewt = np.full(age.shape, np.nan)
        n_eep = age.shape[1]
        # np.gradient over the contiguous valid stretch of each track.
        flat = age.transpose(0, 2, 3, 1).reshape(-1, n_eep)
        wflat = np.full_like(flat, np.nan)
        for i in range(flat.shape[0]):
            good = np.isfinite(flat[i])
            if good.sum() >= 2:
                wflat[i, good] = np.gradient(flat[i, good])
        agewt = wflat.reshape(age.shape[0], age.shape[2], age.shape[3],
                              n_eep).transpose(0, 3, 1, 2)
        return np.concatenate([ygrid, agewt[..., None]], axis=-1)

    # -- prediction API ----------------------------------------------------

    def get_predictions(self, labels, apply_corr=True, corr_params=None):
        """Interpolated predictions at `labels` of shape (..., 4) in the
        order (mini, eep, feh, afe).

        Parity: reference `brutus/seds.py:263-312` (the reference's
        1-D/2-D special-casing collapses into broadcasting).
        """
        labels = jnp.asarray(labels, dtype=jnp.result_type(float))
        single = labels.ndim == 1
        preds = interpn(self.xgrid, self.ygrid, labels)
        if apply_corr:
            dlogt, dlogr = empirical_corrections(
                labels[..., 0], labels[..., 1], labels[..., 2], corr_params)
            preds = apply_corrections(preds, dlogt, dlogr, self.logt_idx,
                                      self.logl_idx, self.logg_idx)
        return preds[0] if single and preds.ndim > 1 else preds

    def get_corrections(self, labels, corr_params=None):
        labels = jnp.asarray(labels, dtype=jnp.result_type(float))
        return empirical_corrections(labels[..., 0], labels[..., 1],
                                     labels[..., 2], corr_params)


def write_tracks_file(path, mini_grid, eep_grid, feh_grid, afe_grid,
                      predict_fn):
    """Write a MIST-EEP-track-schema HDF5 from an analytic generator
    (test fixtures).  `predict_fn(mini, eep, feh, afe)` returns a dict
    of prediction columns."""
    cols = ["initial_mass", "EEP", "initial_[Fe/H]", "initial_[a/Fe]",
            "star_mass", "[Fe/H]", "[a/Fe]", "log_age", "log_Teff",
            "log_g", "log_L", "log_R"]
    dt = np.dtype([(c, float) for c in cols])
    with h5py.File(path, "w") as f:
        names = []
        for m in mini_grid:
            for z in feh_grid:
                for a in afe_grid:
                    name = f"m{m:.3f}_z{z:+.2f}_a{a:+.2f}"
                    names.append(name)
                    arr = np.zeros(len(eep_grid), dtype=dt)
                    arr["initial_mass"] = m
                    arr["EEP"] = eep_grid
                    arr["initial_[Fe/H]"] = z
                    arr["initial_[a/Fe]"] = a
                    preds = predict_fn(m, np.asarray(eep_grid), z, a)
                    for k, v in preds.items():
                        arr[k] = v
                    f.create_dataset(name, data=arr)
        f.create_dataset("index",
                         data=np.array(names, dtype=h5py.string_dtype()))


__all__ = ["MISTtracks", "empirical_corrections", "apply_corrections",
           "write_tracks_file", "DEFAULT_PREDICTIONS"]
