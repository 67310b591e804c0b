"""
Host-side I/O: model-grid loading, photometric offsets, results files,
and the remote-data registry.

Parity targets:
  * `load_models`  — reference `brutus/utils.py:520-662` (grid HDF5 with
    per-filter `mag_coeffs`, `labels` + `parameters` structured arrays,
    MS/post-MS cut at `eep = 454`, binary cut on `smf`).
  * `load_offsets` — reference `brutus/utils.py:665-715`.
  * results schema — reference `brutus/fitting.py:1632-1662` (13
    datasets); this is the de-facto checkpoint format, and
    `BruteForce.fit` resumes from partially-written files.
  * data registry — reference `brutus/data.py` (pooch + Harvard
    Dataverse).  pooch is not a hard dependency here; fetching is
    gated behind an informative error when it is unavailable.
"""

import os
import sys

import numpy as np
import h5py

from .filters import FILTERS

DEFAULT_LABELS = ["mini", "feh", "eep", "smf",
                  "loga", "logl", "logt", "logg",
                  "Mr", "agewt"]

# Dataverse registry (reference brutus/data.py:7-44): file name -> DOI.
DATAVERSE_DOIS = {
    "MIST_1.2_iso_vvcrit0.0.h5": "10.7910/DVN/KFBVMS",
    "MIST_1.2_iso_vvcrit0.4.h5": "10.7910/DVN/4ZTWNM",
    "MIST_1.2_EEPtrk.h5": "10.7910/DVN/A5QMVT",
    "bayestar2019_v1.h5": "10.7910/DVN/F7KTTW",
    "grid_mist_v8.h5": "10.7910/DVN/FZUC3X",
    "grid_mist_v9.h5": "10.7910/DVN/5YOVFP",
    "grid_bayestar_v5.h5": "10.7910/DVN/4V8EN1",
    "offsets_mist_v8.txt": "10.7910/DVN/5GCPCV",
    "offsets_mist_v9.txt": "10.7910/DVN/RMPVVZ",
    "offsets_bs_v9.txt": "10.7910/DVN/27Y5Y1",
    "nn_c3k.h5": "10.7910/DVN/WUSZLL",
}

DATA_DIR_ENV = "ASTRO_BRUTUS_DATA_DIR"


def data_dir():
    """Local data directory (env-overridable, reference brutus/data.py:38)."""
    return os.environ.get(DATA_DIR_ENV,
                          os.path.join(os.path.expanduser("~"),
                                       ".brutus_tpu_data"))


def fetch(name, target_dir=None):
    """Fetch a registered data file (requires network + pooch)."""
    if name not in DATAVERSE_DOIS:
        raise KeyError(f"unknown data file {name!r}; known: "
                       f"{sorted(DATAVERSE_DOIS)}")
    try:
        import pooch  # noqa: F401
    except ImportError as err:
        raise RuntimeError(
            "Remote data fetching requires `pooch`, which is not installed "
            "in this environment. Download "
            f"doi:{DATAVERSE_DOIS[name]} ({name}) manually into "
            f"{target_dir or data_dir()}.") from err
    raise NotImplementedError("network fetching is disabled in this build")


def _fetch_group(names, target_dir=None):
    for name in names:
        fetch(name, target_dir=target_dir)


def fetch_isos(target_dir=None):
    """Fetch the MIST isochrone files (reference `utils.py:363-387`)."""
    _fetch_group(["MIST_1.2_iso_vvcrit0.0.h5", "MIST_1.2_iso_vvcrit0.4.h5"],
                 target_dir)


def fetch_tracks(target_dir=None):
    """Fetch the MIST EEP track file (reference `utils.py:390-410`)."""
    _fetch_group(["MIST_1.2_EEPtrk.h5"], target_dir)


def fetch_dustmaps(target_dir=None):
    """Fetch the Bayestar19 3-D dust map (reference `utils.py:413-433`)."""
    _fetch_group(["bayestar2019_v1.h5"], target_dir)


def fetch_grids(target_dir=None, versions=("v9",)):
    """Fetch pre-computed model grids (reference `utils.py:436-463`)."""
    names = {"v8": "grid_mist_v8.h5", "v9": "grid_mist_v9.h5",
             "bayestar": "grid_bayestar_v5.h5"}
    _fetch_group([names[v] for v in versions], target_dir)


def fetch_offsets(target_dir=None):
    """Fetch photometric offset tables (reference `utils.py:466-493`)."""
    _fetch_group(["offsets_mist_v8.txt", "offsets_mist_v9.txt",
                  "offsets_bs_v9.txt"], target_dir)


def fetch_nns(target_dir=None):
    """Fetch the BC neural-network file (reference `utils.py:496-517`)."""
    _fetch_group(["nn_c3k.h5"], target_dir)


def load_models(filepath, filters=None, labels=None,
                include_ms=True, include_postms=True, include_binaries=False,
                dtype=np.float32, verbose=True):
    """Load a model grid into `(Nmodel, Nfilt, 3)` coefficients + labels.

    Parity: reference `brutus/utils.py:520-662`, including the
    main-sequence/post-main-sequence split at `eep = 454` and the
    single-star cut `smf == 0` when binaries are excluded.

    Returns
    -------
    models : (Nmodel, Nfilt, 3) float array of `(mag, r0, dr)` coeffs.
    labels : structured array of per-model labels.
    label_mask : structured array marking grid inputs vs derived params.
    """
    if filters is None:
        filters = FILTERS
    if labels is None:
        labels = list(DEFAULT_LABELS)

    try:
        f = h5py.File(filepath, "r", libver="latest", swmr=True)
    except (OSError, ValueError):
        f = h5py.File(filepath, "r")

    with f:
        mag_coeffs = f["mag_coeffs"]
        n_models = len(mag_coeffs)
        avail = [f_ for f_ in filters if f_ in mag_coeffs.dtype.names]
        n_coef = len(mag_coeffs[avail[0]][0]) if avail else 3
        models = np.zeros((n_models, len(filters), n_coef), dtype=dtype)
        loaded = np.zeros(len(filters), dtype=bool)
        for i, filt in enumerate(filters):
            if filt in mag_coeffs.dtype.names:
                models[:, i] = mag_coeffs[filt]
                loaded[i] = True
                if verbose:
                    sys.stderr.write(f"\rReading filter {filt}          ")
                    sys.stderr.flush()
        if verbose:
            sys.stderr.write("\n")
        models = models[:, loaded, :]

        combined = np.full(n_models, np.nan,
                           dtype=np.dtype([(n, float) for n in labels]))
        label_mask = np.zeros(1, dtype=np.dtype([(n, bool) for n in labels]))
        if "labels" in f:
            flabels = f["labels"][:]
            for n in flabels.dtype.names:
                if n in labels:
                    combined[n] = flabels[n]
                    label_mask[n] = True
        if "parameters" in f:
            fparams = f["parameters"][:]
            for n in fparams.dtype.names:
                if n in labels:
                    combined[n] = fparams[n]

    present = [n for n in labels if not np.isnan(combined[n][0])]

    sel = np.ones(n_models, dtype=bool)
    if not include_ms and not include_postms:
        raise ValueError("cannot exclude both the MS and post-MS models")
    if include_postms and not include_ms and "eep" in present:
        sel = combined["eep"] > 454.0
    elif include_ms and not include_postms and "eep" in present:
        sel = combined["eep"] <= 454.0
    if not include_binaries and "smf" in present:
        sel &= combined["smf"] == 0.0
        present = [n for n in present if n != "smf"]

    return models[sel], combined[present][sel], label_mask[present]


def save_models(filepath, models, labels, filters, parameters=None):
    """Write a model grid with the same schema `load_models` reads.

    This is the grid "checkpoint" format produced by
    `models.sedmaker.SEDmaker.make_grid`.
    """
    stype = np.dtype([(f, np.float32, (models.shape[2],)) for f in filters])
    mc = np.zeros(len(models), dtype=stype)
    for i, filt in enumerate(filters):
        mc[filt] = models[:, i, :]
    with h5py.File(filepath, "w") as f:
        f.create_dataset("mag_coeffs", data=mc)
        f.create_dataset("labels", data=labels)
        if parameters is not None:
            f.create_dataset("parameters", data=parameters)


def load_offsets(filepath, filters=None, verbose=True):
    """Multiplicative per-band flux zero-points from a text table.

    Parity: reference `brutus/utils.py:665-715` (absent filters default
    to 1; duplicate rows are an error).
    """
    if filters is None:
        filters = FILTERS
    filts, vals = np.loadtxt(filepath, dtype=str).T
    vals = vals.astype(float)
    offsets = np.full(len(filters), np.nan)
    for i, filt in enumerate(filters):
        where = np.flatnonzero(filts == filt)
        if len(where) == 1:
            offsets[i] = vals[where[0]]
        elif len(where) == 0:
            offsets[i] = 1.0
        else:
            raise ValueError(f"duplicate offsets for filter {filt!r}")
    if verbose:
        for filt, zp in zip(filters, offsets):
            sys.stderr.write(f"{filt} ({100 * (zp - 1.0):3.2}%)\n")
    return offsets


RESULTS_DATASETS = [
    # (name, per-draw?, dtype, extra shape)
    ("model_idx", True, "int32", ()),
    ("ml_scale", True, "float32", ()),
    ("ml_av", True, "float32", ()),
    ("ml_rv", True, "float32", ()),
    ("ml_cov_sar", True, "float32", (3, 3)),
    ("obj_log_post", True, "float32", ()),
    ("obj_log_evid", False, "float32", ()),
    ("obj_chi2min", False, "float32", ()),
    ("obj_Nbands", False, "int16", ()),
]
DRAW_DATASETS = [
    ("samps_dist", True, "float32", ()),
    ("samps_red", True, "float32", ()),
    ("samps_dred", True, "float32", ()),
    ("samps_logp", True, "float32", ()),
]


class ResultsWriter:
    """Incremental writer for the 13-dataset results HDF5 schema.

    Parity: reference `brutus/fitting.py:1632-1662`.  `model_idx` rows
    are initialized to -99 (the reference's unfitted-row marker,
    fitting.py:1635), which doubles as the resume cursor.
    """

    def __init__(self, path, n_data, n_draws, labels=None,
                 save_dar_draws=True, resume=False):
        self.path = path if path.endswith(".h5") else f"{path}.h5"
        self.n_data = n_data
        self.n_draws = n_draws
        self.save_dar_draws = save_dar_draws
        mode = "r+" if (resume and os.path.exists(self.path)) else "w-"
        self.file = h5py.File(self.path, mode)
        if mode == "w-":
            if labels is not None:
                self.file.create_dataset("labels", data=labels)
            specs = RESULTS_DATASETS + (DRAW_DATASETS if save_dar_draws
                                        else [])
            for name, per_draw, dtype, extra in specs:
                shape = ((n_data, n_draws) + extra if per_draw
                         else (n_data,) + extra)
                fill = -99 if name == "model_idx" else 0
                self.file.create_dataset(
                    name, shape=shape, dtype=dtype,
                    data=np.full(shape, fill, dtype=dtype))

    @property
    def cursor(self):
        """First row not yet written (for idempotent restart)."""
        done = self.file["model_idx"][:, 0] != -99
        idx = np.flatnonzero(~done)
        return int(idx[0]) if len(idx) else self.n_data

    def write_batch(self, start, out, n_valid=None):
        """Write a batch of per-star outputs starting at row `start`.

        `out` maps dataset-logical names to arrays with leading batch dim.
        """
        n = n_valid if n_valid is not None else len(out["model_idx"])
        end = start + n
        sl = slice(start, end)
        self.file["model_idx"][sl] = out["model_idx"][:n]
        self.file["ml_scale"][sl] = out["scale"][:n]
        self.file["ml_av"][sl] = out["av"][:n]
        self.file["ml_rv"][sl] = out["rv"][:n]
        self.file["ml_cov_sar"][sl] = out["cov_sar"][:n]
        self.file["obj_log_post"][sl] = out["lnprob"][:n]
        self.file["obj_log_evid"][sl] = out["log_evidence"][:n]
        self.file["obj_chi2min"][sl] = out["chi2min"][:n]
        self.file["obj_Nbands"][sl] = out["ndim"][:n]
        if self.save_dar_draws:
            self.file["samps_dist"][sl] = out["dist"][:n]
            self.file["samps_red"][sl] = out["red"][:n]
            self.file["samps_dred"][sl] = out["dred"][:n]
            self.file["samps_logp"][sl] = out["logwt"][:n]
        self.file.flush()

    def close(self):
        self.file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def load_results(path):
    """Read a results file back as a dict of numpy arrays."""
    out = {}
    with h5py.File(path if path.endswith(".h5") else f"{path}.h5", "r") as f:
        for k in f:
            out[k] = f[k][:]
    return out


__all__ = ["load_models", "save_models", "load_offsets", "fetch",
           "fetch_isos", "fetch_tracks", "fetch_dustmaps", "fetch_grids",
           "fetch_offsets", "fetch_nns",
           "data_dir", "ResultsWriter", "load_results",
           "DATAVERSE_DOIS", "DEFAULT_LABELS"]
