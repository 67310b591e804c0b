"""
Batch brute-force fitter.

Parity: reference `brutus/fitting.py:1110-2065` (`BruteForce`), with the
serial per-star generator loop (fitting.py:1685, 1980) replaced by a
jitted, vmapped star-batch program:

    stars  (batch axis)  -> vmap, shardable over the mesh 'data' axis
    models (grid axis)   -> dense, shardable over the mesh 'model' axis
    draws/posterior      -> fixed-size top-k + categorical resampling

Host responsibilities (setup, dust-map lookup, HDF5 output, progress,
resume) stay in numpy; everything per-star x per-model runs on device.
"""

import sys
import time
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from .config import (FitConfig, PosteriorConfig, GalPriorConfig,
                     DustPriorConfig)
from .io import ResultsWriter
from .ops.optimize import loglike_grid
from .ops.posterior import lnpost_grid
from .priors import imf_lnprior, ps1_MrLF_lnprior
from .utils import magnitude
from .dustmap import Bayestar

# Re-exported functional API (parity with reference `loglike`/`lnpost`).
loglike = loglike_grid
lnpost = lnpost_grid


def default_grid_lnprior(models_labels, labels_mask=None,
                         apply_agewt=True, apply_grad=True):
    """Static per-model grid log-prior.

    Parity: reference `brutus/fitting.py:1334-1359`:
      * Kroupa IMF over `mini` (MIST grids) else PS1 M_r luminosity
        function (Bayestar grids),
      * d(age)/d(EEP) reweighting via the `agewt` label,
      * grid-spacing (trapezoidal measure) reweighting per input label.
    """
    names = models_labels.dtype.names
    if "mini" in names:
        lnprior = np.asarray(imf_lnprior(models_labels["mini"]))
    elif "Mr" in names:
        lnprior = np.asarray(ps1_MrLF_lnprior(models_labels["Mr"]))
    else:
        lnprior = np.zeros(len(models_labels))

    if apply_agewt and "agewt" in names:
        with np.errstate(divide="ignore"):
            lnprior = lnprior + np.log(np.abs(models_labels["agewt"]))

    if apply_grad:
        # The spacing reweighting applies only to grid *input* labels
        # (reference fitting.py:1351-1359 gates on `labels_mask`); when
        # no mask is available, fall back to the canonical input set so
        # derived parameters (logt, Mr, agewt, ...) are never counted.
        grid_inputs = {"mini", "eep", "feh", "afe", "smf", "Mr"}
        for name in names:
            if labels_mask is not None:
                if name not in labels_mask.dtype.names \
                        or not labels_mask[name][0]:
                    continue
            elif name not in grid_inputs:
                continue
            vals = models_labels[name]
            uvals = np.unique(vals)
            if len(uvals) > 1:
                lngrad = np.log(np.gradient(uvals))
                lnprior = lnprior + np.interp(vals, uvals, lngrad)
    return lnprior


from functools import lru_cache


@jax.jit
def _pack_rows(arrs):
    """Concatenate per-star-flattened arrays into one (B, X) matrix.

    The device->host link pays a full round trip PER ARRAY fetched
    (~40 ms on the tunnel backend), so the ~17 step outputs are packed
    into two transfers (floats + ints) and split on the host."""
    return jnp.concatenate([a.reshape(a.shape[0], -1) for a in arrs],
                           axis=1)


def _pack_outputs(out, skip=()):
    """-> (fpack, ipack, layout) device matrices + host split recipe."""
    groups = {"f": [], "i": []}
    layout = []
    for k in sorted(out):
        if k in skip:
            continue
        v = out[k]
        kind = "f" if v.dtype.kind == "f" else "i"
        shape = v.shape[1:]
        n = int(np.prod(shape)) if shape else 1
        layout.append((k, kind, shape, n, str(v.dtype)))
        groups[kind].append(v.astype(jnp.float32) if kind == "f"
                            else v.astype(jnp.int32))
    fpack = _pack_rows(groups["f"]) if groups["f"] else None
    ipack = _pack_rows(groups["i"]) if groups["i"] else None
    return fpack, ipack, layout


def _unpack_outputs(fpack, ipack, layout):
    fpack = np.asarray(fpack) if fpack is not None else None
    ipack = np.asarray(ipack) if ipack is not None else None
    pos = {"f": 0, "i": 0}
    buf = {"f": fpack, "i": ipack}
    out = {}
    for k, kind, shape, n, dtype in layout:
        b = buf[kind]
        v = b[:, pos[kind]:pos[kind] + n].reshape((b.shape[0],) + shape)
        pos[kind] += n
        out[k] = v.astype(dtype) if str(v.dtype) != dtype else v
    return out


@lru_cache(maxsize=16)
def _screened_step(fit_cfg, post_cfg, gal_cfg, dust_cfg, apply_av_prior,
                   aux_names, n_real, tile, mesh=None,
                   lngalprior=None, lndustprior=None):
    """ONE jitted executable for the funnel fit step: screening kernel
    + DMA slab gather + shortlist fit (`loglike_grid_screened`) + the
    fused MC-integration kernel (`lnpost_batch`) + all glue.  Per-batch
    dispatch latency collapses to a single call, and the lru_cache
    keeps repeated `BruteForce.fit` calls from re-tracing.

    The big tables (coeffs, packed columns, mask row) are jit
    ARGUMENTS: closing over them would embed them as XLA constants and
    inflate compilation ~100x (measured 709 s vs 6.5 s).

    With a `mesh` whose 'model' axis is >1, the whole step runs under
    `shard_map`: the grid tables are sharded along the model axis
    (grids beyond per-chip HBM), stars along 'data', and the funnel's
    shortlist merge rides ICI collectives (see
    `loglike_grid_screened`'s sharded mode).
    """
    from .ops.pallas_loglike import loglike_grid_screened, pack_row_names
    from .ops.posterior import lnpost_batch

    n_ms = mesh.shape.get("model", 1) if mesh is not None else 1
    model_axis = "model" if n_ms > 1 else None
    pnames = pack_row_names(aux_names)

    def step_fn(ct, pk, mr, keys, flux, err, mask, plx, plx_err,
                coord, dust_mean, dust_std, dust_dist, ext_lnl):
        res = loglike_grid_screened(
            flux, err, mask, ct, pk, mr, n_real,
            parallax=plx, parallax_err=plx_err, cfg=fit_cfg,
            tile=tile, screen_k=fit_cfg.screen_k,
            screen_block=fit_cfg.screen_block, aux_names=aux_names,
            model_axis=model_axis, n_model_shards=n_ms)
        gidx = res.pop("global_idx")
        aux = res.pop("aux")
        if ext_lnl is not None:
            # (B, M) external label priors, gathered onto the
            # shortlists (element gather; only paid when `lnprior_ext`
            # is in use).  The kernel-packed rows hold the UNmodified
            # lnlike — drop them so the posterior re-stacks from the
            # adjusted field.
            res.pop("pack_rows", None)
            res["lnlike"] = res["lnlike"] + jnp.take_along_axis(
                ext_lnl, gidx, axis=1)
        profile = ((dust_dist, dust_mean, dust_std)
                   if dust_mean is not None else None)
        return lnpost_batch(
            keys, res, aux["lnprior"], coord,
            parallax=plx, parallax_err=plx_err,
            feh=aux.get("feh"), loga=aux.get("loga"),
            dust_profile=profile, global_idx=gidx,
            pack_names=pnames,
            cfg=post_cfg, gal_cfg=gal_cfg, dust_cfg=dust_cfg,
            apply_av_prior=apply_av_prior,
            lngalprior=lngalprior, lndustprior=lndustprior)

    if model_axis is None:
        return jax.jit(step_fn)

    try:
        from jax import shard_map
    except ImportError:            # older jax
        from jax.experimental.shard_map import shard_map
    import inspect
    _sm_params = inspect.signature(shard_map).parameters
    # jax >= 0.9 renamed check_rep -> check_vma.
    _sm_kw = {("check_vma" if "check_vma" in _sm_params
               else "check_rep"): False}
    from jax.sharding import PartitionSpec as P
    # Screen tables are the PAIR ((n_g, 48, 6*Mp), (n_g, 96, 3*Mp)):
    # model-tile columns LAST on both.
    cspec = (P(None, None, "model"), P(None, None, "model"))
    mspec = P(None, "model")
    d = P("data")
    r = P()

    def make(has_dust, pk_bm):
        # Block-major gather tables ((Mp // gb) * C, gb) carry the
        # model axis in ROWS; column-major (C, Mp) in columns.
        pkspec = P("model", None) if pk_bm else mspec
        if has_dust:
            def body(ct, pk, mr, keys, f, e, m, px, pe, co, dm, ds, dd):
                return step_fn(ct, pk, mr, keys, f, e, m, px, pe, co,
                               dm, ds, dd, None)
            ins = (cspec, pkspec, mspec, d, d, d, d, d, d, d, d, d, r)
        else:
            def body(ct, pk, mr, keys, f, e, m, px, pe, co):
                return step_fn(ct, pk, mr, keys, f, e, m, px, pe, co,
                               None, None, None, None)
            ins = (cspec, pkspec, mspec, d, d, d, d, d, d, d)
        return jax.jit(shard_map(body, mesh=mesh, in_specs=ins,
                                 out_specs=d, **_sm_kw))

    cache = {}

    def step(ct, pk, mr, keys, f, e, m, px, pe, co, dm, ds, dd,
             ext_lnl):
        if ext_lnl is not None:
            raise NotImplementedError(
                "lnprior_ext is not supported with a model-sharded "
                "mesh (the (B, M) prior table would need model-axis "
                "sharding + a distributed gather)")
        has_dust = dm is not None
        key = (has_dust, pk.shape[1] != mr.shape[1])
        if key not in cache:
            cache[key] = make(*key)
        if has_dust:
            return cache[key](ct, pk, mr, keys, f, e, m, px, pe,
                              co, dm, ds, dd)
        return cache[key](ct, pk, mr, keys, f, e, m, px, pe, co)

    return step


@lru_cache(maxsize=16)
def _screened_step_xla(fit_cfg, post_cfg, gal_cfg, dust_cfg,
                       apply_av_prior, aux_names, n_real, mesh=None,
                       lngalprior=None, lndustprior=None):
    """ONE jitted executable for the plain-XLA funnel step: batched
    screen (`ops.screen_xla`) + block gather + vmapped dense fit +
    vmapped XLA posterior.  No Pallas anywhere — the production path
    for non-TPU backends and for model-sharded grids beyond per-chip
    HBM.  Tables are jit ARGUMENTS (closure capture would embed them
    as XLA constants, ~100x compile blowup).

    With a `mesh` whose 'model' axis is >1 the step runs under
    `shard_map`, mirroring `_screened_step`'s sharded mode: each shard
    screens its own slice, block shortlists merge over ICI, and the
    shortlist fit + posterior run shard-redundantly.
    """
    from .ops.screen_xla import loglike_grid_screened_xla
    from .ops.posterior import lnpost_grid

    n_ms = mesh.shape.get("model", 1) if mesh is not None else 1
    model_axis = "model" if n_ms > 1 else None

    def step_fn(tabw, tabc, packed_b, keys, flux, err, mask, plx,
                plx_err, coord, dust_mean, dust_std, dust_dist,
                ext_lnl):
        res = loglike_grid_screened_xla(
            flux, err, mask, tabw, tabc, packed_b, n_real,
            parallax=plx, parallax_err=plx_err, cfg=fit_cfg,
            screen_k=fit_cfg.screen_k, aux_names=aux_names,
            model_axis=model_axis, n_model_shards=n_ms)
        gidx = res.pop("global_idx")
        aux = res.pop("aux")
        if ext_lnl is not None:
            res["lnlike"] = res["lnlike"] + jnp.take_along_axis(
                ext_lnl, gidx, axis=1)

        def star_post(key, r, lnp_g, gix, plx_s, pe_s, coord_s, dm, ds,
                      feh_s, loga_s):
            profile = ((dust_dist, dm, ds) if dm is not None else None)
            return lnpost_grid(key, r, lnp_g, coord_s,
                               parallax=plx_s, parallax_err=pe_s,
                               feh=feh_s, loga=loga_s,
                               dust_profile=profile, global_idx=gix,
                               cfg=post_cfg, gal_cfg=gal_cfg,
                               dust_cfg=dust_cfg,
                               apply_av_prior=apply_av_prior,
                               lngalprior=lngalprior,
                               lndustprior=lndustprior)

        axes = (0, 0, 0, 0, 0, 0, 0,
                0 if dust_mean is not None else None,
                0 if dust_std is not None else None,
                0 if "feh" in aux_names else None,
                0 if "loga" in aux_names else None)
        return jax.vmap(star_post, in_axes=axes)(
            keys, res, aux["lnprior"], gidx, plx, plx_err, coord,
            dust_mean, dust_std, aux.get("feh"), aux.get("loga"))

    if model_axis is None:
        return jax.jit(step_fn)

    try:
        from jax import shard_map
    except ImportError:            # older jax
        from jax.experimental.shard_map import shard_map
    import inspect
    _sm_params = inspect.signature(shard_map).parameters
    _sm_kw = {("check_vma" if "check_vma" in _sm_params
               else "check_rep"): False}
    from jax.sharding import PartitionSpec as P
    tspec = P(None, None, "model")       # tabw/tabc: model columns last
    pspec = P("model", None, None)       # packed blocks: blocks first
    d = P("data")
    r = P()

    def make(has_dust):
        if has_dust:
            def body(tw, tc, pb, keys, f, e, m, px, pe, co, dm, ds, dd):
                return step_fn(tw, tc, pb, keys, f, e, m, px, pe, co,
                               dm, ds, dd, None)
            ins = (tspec, tspec, pspec, d, d, d, d, d, d, d, d, d, r)
        else:
            def body(tw, tc, pb, keys, f, e, m, px, pe, co):
                return step_fn(tw, tc, pb, keys, f, e, m, px, pe, co,
                               None, None, None, None)
            ins = (tspec, tspec, pspec, d, d, d, d, d, d, d)
        return jax.jit(shard_map(body, mesh=mesh, in_specs=ins,
                                 out_specs=d, **_sm_kw))

    cache = {}

    def step(tw, tc, pb, keys, f, e, m, px, pe, co, dm, ds, dd,
             ext_lnl):
        if ext_lnl is not None:
            raise NotImplementedError(
                "lnprior_ext is not supported with a model-sharded "
                "mesh (the (B, M) prior table would need model-axis "
                "sharding + a distributed gather)")
        has_dust = dm is not None
        if has_dust not in cache:
            cache[has_dust] = make(has_dust)
        if has_dust:
            return cache[has_dust](tw, tc, pb, keys, f, e, m, px, pe,
                                   co, dm, ds, dd)
        return cache[has_dust](tw, tc, pb, keys, f, e, m, px, pe, co)

    return step


@lru_cache(maxsize=32)
def _jscan_factory(jstep, n_tab, has_dust, has_ext):
    """Jitted `lax.scan` of `jstep` over a leading batch-group axis.

    `jstep(*tables, keys, flux, err, mask, plx, plx_err, coord,
    dust_mean, dust_std, dust_dist, ext_lnl)` is the single-batch
    compiled step; the scanned variant takes the same arguments with
    the per-batch ones stacked `(S, B, ...)` (the shared `dust_dist`
    ladder stays unstacked) and runs S batches in ONE dispatch,
    amortizing the per-call host/tunnel latency that dominated slow
    phases (bench `--scan-batches`: 6434 stars/s scanned vs 363
    unscanned in the same phase).  Outputs are flattened to
    `(S * B, ...)` so the streaming writer is unchanged."""

    @jax.jit
    def jscan(*args):
        tabs, dd, xs = args[:n_tab], args[n_tab], args[n_tab + 1:]

        def body(c, x):
            keys, f, e, m, px, pe, co = x[:7]
            i = 7
            dm = ds = el = None
            if has_dust:
                dm, ds = x[i], x[i + 1]
                i += 2
            if has_ext:
                el = x[i]
            return c, jstep(*tabs, keys, f, e, m, px, pe, co,
                            dm, ds, dd, el)

        outs = jax.lax.scan(body, 0, tuple(xs))[1]
        return jax.tree_util.tree_map(
            lambda a: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:]),
            outs)

    return jscan


def _make_scan_call(jstep, tables):
    """Bind `_jscan_factory` to a step's grid tables, exposing the same
    11-argument signature as the per-batch `step` closure."""

    def scan_call(keys, flux, err, mask, plx, plx_err, coord,
                  dust_mean, dust_std, dust_dist, ext_lnl):
        has_dust = dust_mean is not None
        has_ext = ext_lnl is not None
        jscan = _jscan_factory(jstep, len(tables), has_dust, has_ext)
        xs = [keys, flux, err, mask, plx, plx_err, coord]
        if has_dust:
            xs += [dust_mean, dust_std]
        if has_ext:
            xs += [ext_lnl]
        return jscan(*tables, dust_dist, *xs)

    return scan_call


class BruteForce:
    """Grid-scan fitter over `(Nmodel, Nfilt, 3)` magnitude coefficients.

    Parity: reference `brutus/fitting.py:1110-1142`.
    """

    def __init__(self, models, models_labels, labels_mask=None,
                 dtype=None):
        self.NMODEL, self.NDIM, self.NCOEF = models.shape
        self.models = np.asarray(models)
        if dtype is not None:
            self.models = self.models.astype(dtype)
        self.models_labels = models_labels
        self.labels_mask = labels_mask
        self.NLABELS = len(models_labels.dtype.names)

    # -- setup ------------------------------------------------------------

    def _setup(self, data, data_err, data_mask, phot_offsets=None,
               parallax=None, parallax_err=None, lnprior=None,
               apply_agewt=True, apply_grad=True, data_coords=None,
               mag_max=50.0, merr_max=0.25):
        """Data hygiene + default priors.

        Parity: reference `brutus/fitting.py:1144-1424` (the parts that
        are not obsoleted by static-shape execution).
        """
        data = np.ascontiguousarray(data, dtype=float)
        data_err = np.ascontiguousarray(data_err, dtype=float)
        data_mask = np.ascontiguousarray(data_mask).astype(bool)
        n_data, n_filt = data.shape
        if n_filt != self.NDIM:
            raise ValueError(f"data has {n_filt} bands but the grid has "
                             f"{self.NDIM}")

        if parallax is not None and parallax_err is None:
            raise ValueError("must provide both `parallax` and "
                             "`parallax_err`")
        if parallax is None:
            parallax = np.full(n_data, np.nan)
            parallax_err = np.full(n_data, np.nan)

        if phot_offsets is None:
            phot_offsets = np.ones(n_filt)

        if lnprior is None:
            lnprior = default_grid_lnprior(self.models_labels,
                                           self.labels_mask,
                                           apply_agewt=apply_agewt,
                                           apply_grad=apply_grad)

        if data_coords is None:
            data_coords = np.zeros((n_data, 2))

        # Remove bad photometry the user may not have masked
        # (fitting.py:1404-1420).
        with warnings.catch_warnings(), np.errstate(all="ignore"):
            warnings.simplefilter("ignore")
            mag, err = [np.asarray(v) for v in magnitude(data, data_err)]
            bad_mag = (mag > mag_max) | (err > merr_max)
            clean = (np.isfinite(data) & np.isfinite(data_err)
                     & (data_err > 0.0))
            data_mask = data_mask & clean & ~bad_mag

        if np.any(data_mask.sum(axis=1) < 4):
            raise ValueError(
                "Objects with fewer than 4 bands of acceptable photometry "
                "give degenerate fits; remove them or adjust "
                "`mag_max`/`merr_max`.")

        return (data * phot_offsets, data_err * phot_offsets, data_mask,
                np.asarray(parallax, dtype=float),
                np.asarray(parallax_err, dtype=float),
                np.asarray(data_coords, dtype=float),
                np.asarray(lnprior, dtype=float))

    # -- compiled batch step ----------------------------------------------

    def _build_step(self, fit_cfg, post_cfg, gal_cfg, dust_cfg,
                    apply_av_prior, apply_dlabels, device_models,
                    lnprior_dev, feh=None, loga=None, has_ext=False,
                    engine="xla", tile=512, n_real=None,
                    screen_tables=None, mesh=None,
                    lngalprior=None, lndustprior=None):

        if engine == "xla_screen":
            tabw, tabc, packed_b, aux_names, n_real_s = screen_tables
            jstep = _screened_step_xla(fit_cfg, post_cfg, gal_cfg,
                                       dust_cfg, apply_av_prior,
                                       aux_names, n_real_s, mesh=mesh,
                                       lngalprior=lngalprior,
                                       lndustprior=lndustprior)

            def step(keys, flux, err, mask, plx, plx_err, coord,
                     dust_mean, dust_std, dust_dist, ext_lnl):
                return jstep(tabw, tabc, packed_b, keys, flux, err,
                             mask, plx, plx_err, coord, dust_mean,
                             dust_std, dust_dist, ext_lnl)

            if mesh is None:
                # Scanned variant (`fit(scan_batches=N)`): N batches
                # per dispatch; sharded steps are not scannable.
                step.scan = _make_scan_call(jstep,
                                            (tabw, tabc, packed_b))
            return step

        if engine == "fused_screen":
            coeffs_t, packed, aux_names, n_real_s, maskrow = screen_tables
            jstep = _screened_step(fit_cfg, post_cfg, gal_cfg, dust_cfg,
                                   apply_av_prior, aux_names, n_real_s,
                                   tile, mesh=mesh,
                                   lngalprior=lngalprior,
                                   lndustprior=lndustprior)

            def step(keys, flux, err, mask, plx, plx_err, coord,
                     dust_mean, dust_std, dust_dist, ext_lnl):
                return jstep(coeffs_t, packed, maskrow, keys, flux, err,
                             mask, plx, plx_err, coord, dust_mean,
                             dust_std, dust_dist, ext_lnl)

            if mesh is None:
                # Scanned variant (`fit(scan_batches=N)`): N batches
                # per dispatch; sharded steps are not scannable.
                step.scan = _make_scan_call(jstep,
                                            (coeffs_t, packed, maskrow))
            return step

        def post_step(key, res, plx, plx_err, coord,
                      dust_mean, dust_std, dust_dist, ext_lnl):
            if ext_lnl is not None:
                res = dict(res)
                res["lnlike"] = res["lnlike"] + ext_lnl
            profile = ((dust_dist, dust_mean, dust_std)
                       if dust_mean is not None else None)
            return lnpost_grid(key, res, lnprior_dev, coord,
                               parallax=plx, parallax_err=plx_err,
                               feh=feh, loga=loga, dust_profile=profile,
                               cfg=post_cfg, gal_cfg=gal_cfg,
                               dust_cfg=dust_cfg,
                               apply_av_prior=apply_av_prior,
                               lngalprior=lngalprior,
                               lndustprior=lndustprior)

        post_axes = (0, 0, 0, 0, 0,
                     0 if apply_av_prior else None,
                     0 if apply_av_prior else None,
                     None,
                     0 if has_ext else None)

        if engine == "fused":
            from .ops.pallas_loglike import loglike_grid_fused

            # NOT jitted as a whole: jit-wrapping the Mosaic kernel is
            # pathologically slow to lower on the remote-compile TPU
            # backend; the kernel dispatches eagerly and only the
            # posterior stage is jitted.
            post_batch = jax.jit(jax.vmap(post_step, in_axes=post_axes))

            def step(keys, flux, err, mask, plx, plx_err, coord,
                     dust_mean, dust_std, dust_dist, ext_lnl):
                res = loglike_grid_fused(flux, err, mask, device_models,
                                         cfg=fit_cfg, tile=tile,
                                         n_real=n_real)
                return post_batch(keys, res, plx, plx_err, coord,
                                  dust_mean, dust_std, dust_dist, ext_lnl)

            return step
        else:
            def star_step(key, flux, err, mask, plx, plx_err, coord,
                          dust_mean, dust_std, dust_dist, ext_lnl):
                res = loglike_grid(flux, err, mask, device_models,
                                   parallax=plx, parallax_err=plx_err,
                                   cfg=fit_cfg)
                return post_step(key, res, plx, plx_err, coord,
                                 dust_mean, dust_std, dust_dist, ext_lnl)

            in_axes = (0, 0, 0, 0, 0, 0, 0,
                       0 if apply_av_prior else None,
                       0 if apply_av_prior else None,
                       None,
                       0 if has_ext else None)
            step = jax.vmap(star_step, in_axes=in_axes)
        return jax.jit(step)

    # -- public API -------------------------------------------------------

    def fit(self, data, data_err, data_mask, data_labels=None,
            save_file=None,
            phot_offsets=None, parallax=None, parallax_err=None,
            Nmc_prior=50, avlim=(0.0, 20.0), av_gauss=None,
            rvlim=(1.0, 8.0), rv_gauss=(3.32, 0.18),
            lnprior=None, lnprior_ext=None,
            wt_thresh=1e-3, cdf_thresh=2e-3, Ndraws=250,
            apply_agewt=True, apply_grad=True,
            lngalprior=None, lndustprior=None,
            lngalprior_cfg=None, dustfile=None, dustmap=None,
            dust_cfg=None, apply_dlabels=True, data_coords=None,
            logl_dim_prior=True, ltol=3e-2, ltol_subthresh=1e-2,
            logl_initthresh=5e-3, mag_max=50.0, merr_max=0.25,
            save_dar_draws=True, running_io=True, verbose=True,
            batch_size=16, n_sel_max=2048, seed=0, resume=False,
            return_results=False, return_sel=False, mesh=None,
            engine=None, tile=512, screen_k=None, screen_block=None,
            screen_select=None,
            mag_direct_init=True, scan_batches=1,
            _yield_batches=False):
        """Fit every star against the grid and write the results file.

        Parity: reference `brutus/fitting.py:1426-1801` (same defaults,
        same output schema).  TPU-specific knobs: `batch_size` (stars
        per compiled step), `n_sel_max` (fixed top-k model count
        replacing `mem_lim`), `seed` (threefry key), `resume`
        (restart from a partial results file), `engine` (None = auto:
        the fused Pallas kernel on TPU whenever the grid fits per
        device, the XLA/GSPMD path otherwise), `tile` (fused kernel
        model-tile width), `scan_batches` (N star batches per device
        dispatch via `lax.scan` — amortizes per-call host latency,
        which otherwise dominates behind slow host links; identical
        output rows to the unscanned path.  Applies to the funnel
        engines on a single device; silently per-batch otherwise).

        Custom priors (reference fitting.py:870-881): `lngalprior` /
        `lndustprior` are jax-TRACEABLE callables replacing the
        built-in Galactic / 3-D dust priors, with signatures
        `lngalprior(dist, coord, feh=None, loga=None)` and
        `lndustprior(dist, av, av_dist, av_mean, av_std)` (the
        reference passes `labels`/`dustfile`; here labels arrive as
        per-model arrays and the sightline profile is pre-queried).
        With custom callables the fused engine's posterior runs
        through the XLA MC integration instead of the Pallas MC
        kernel (which hard-codes the built-ins).

        Results stream batch-by-batch: HDF5 rows are written as each
        batch completes (crash-recoverable via `resume`), and memory
        stays bounded unless `return_results=True` collects everything.
        """
        (data, data_err, data_mask, parallax, parallax_err, data_coords,
         lnprior) = self._setup(data, data_err, data_mask,
                                phot_offsets=phot_offsets,
                                parallax=parallax,
                                parallax_err=parallax_err,
                                lnprior=lnprior, apply_agewt=apply_agewt,
                                apply_grad=apply_grad,
                                data_coords=data_coords,
                                mag_max=mag_max, merr_max=merr_max)
        n_data, n_filt = data.shape

        # Configs (static / hashable).
        if av_gauss is None:
            av_gauss_eff = (0.0, 1e6)
        else:
            av_gauss_eff = tuple(av_gauss)
        fit_cfg = FitConfig(avlim=tuple(avlim), av_gauss=av_gauss_eff,
                            rvlim=tuple(rvlim), rv_gauss=tuple(rv_gauss),
                            ltol=ltol, ltol_subthresh=ltol_subthresh,
                            init_thresh=logl_initthresh,
                            dim_prior=logl_dim_prior,
                            # None -> the FitConfig defaults (single
                            # source of truth; sized for worst-star
                            # recall, see config.py).
                            screen_k=(FitConfig.screen_k if screen_k
                                      is None else int(screen_k)),
                            screen_block=(FitConfig.screen_block
                                          if screen_block is None
                                          else int(screen_block)),
                            screen_select=(FitConfig.screen_select
                                           if screen_select is None
                                           else str(screen_select)),
                            # Production default ON (the fused kernel
                            # always direct-seeds; this turns it on for
                            # the XLA engine too — same converged
                            # results, several-fold fewer iterations).
                            mag_direct_init=bool(mag_direct_init))
        post_cfg = PosteriorConfig(n_mc_prior=Nmc_prior,
                                   wt_thresh=wt_thresh,
                                   cdf_thresh=cdf_thresh, n_draws=Ndraws,
                                   avlim=tuple(avlim), rvlim=tuple(rvlim),
                                   n_sel_max=min(n_sel_max, self.NMODEL),
                                   # f32 can carry grid indices exactly
                                   # only below 2**24: larger grids fall
                                   # back to the explicit int gather.
                                   pack_gidx_f32=self.NMODEL < 2 ** 24)
        gal_cfg = lngalprior_cfg or GalPriorConfig()
        dust_cfg = dust_cfg or DustPriorConfig()

        # Dust map: host-side per-star LOS profiles
        # (fitting.py:1368-1395 + pdf.py:812-820).
        if dustmap is None and dustfile is not None:
            dustmap = Bayestar(dustfile)
        apply_av_prior = (dustmap is not None) and (av_gauss is None)
        if apply_av_prior:
            from .dustmap import uniform_profile
            from .ops.pallas_mc import NL_PAD
            dust_dist, dust_mean, dust_std = dustmap.query(
                (data_coords[:, 0], data_coords[:, 1]))
            # Uniform-in-distance ladder: the device-side dust prior
            # interpolates by direct index arithmetic (no searchsorted).
            # n MUST NOT exceed the MC kernel's NL_PAD table size —
            # longer ladders were silently truncated (zero hat weights
            # beyond rung 128 -> flat dust prior for distant stars).
            dust_dist, dust_mean, dust_std = uniform_profile(
                dust_dist, np.atleast_2d(dust_mean),
                np.atleast_2d(dust_std), n=NL_PAD)
            dust_dist = jnp.asarray(dust_dist)
        else:
            dust_dist = dust_mean = dust_std = None

        # External per-object Gaussian label priors
        # (fitting.py:1970-2009): precompute (Ndata, Nmodel) additions.
        ext_lnl = None
        if lnprior_ext is not None:
            names = self.models_labels.dtype.names
            for k in lnprior_ext:
                if k not in names:
                    raise ValueError(f"`lnprior_ext` key {k!r} does not "
                                     "match any model label")
            ext_lnl = np.zeros((n_data, self.NMODEL), dtype=np.float32)
            for k, pars in lnprior_ext.items():
                pars = np.asarray(pars, dtype=float)
                mean, std = pars[:, 0], pars[:, 1]
                ok = np.isfinite(mean) & (std > 0)
                lab = np.asarray(self.models_labels[k], dtype=float)
                chi2 = (lab[None, :] - np.where(ok, mean, 0.0)[:, None]) ** 2
                ivar = np.where(ok, 1.0 / np.where(ok, std, 1.0) ** 2,
                                0.0)[:, None]
                const = np.where(ok, np.log(2 * np.pi *
                                            np.where(ok, std, 1.0) ** 2),
                                 0.0)[:, None]
                ext_lnl += np.where(ok[:, None],
                                    -0.5 * (chi2 * ivar + const), 0.0)

        # Per-model label arrays consumed by the Galactic prior
        # (reference `dlabels`, fitting.py:1966-1969).
        names = self.models_labels.dtype.names
        feh_arr = (np.asarray(self.models_labels["feh"], dtype=float)
                   if apply_dlabels and "feh" in names else None)
        loga_arr = (np.asarray(self.models_labels["loga"], dtype=float)
                    if apply_dlabels and "loga" in names else None)

        # --- engine resolution ---
        # The fused Pallas kernel replicates the (tiny, ~100 MB max)
        # coefficient grid per device and shards *stars* over the mesh
        # 'data' axis; the XLA/GSPMD engine shards the *grid* over the
        # 'model' axis (for grids too large to replicate) and handles
        # non-TPU backends at full compiled speed.
        model_ax = mesh.shape.get("model", 1) if mesh is not None else 1
        use_screen = bool(fit_cfg.screen_k) and \
            fit_cfg.screen_k < self.NMODEL
        if engine is None:
            # Auto: the Pallas engine on TPU; a model>1 mesh needs the
            # funnel's sharded mode (dense fused replicates the grid).
            engine = ("fused" if jax.default_backend() == "tpu"
                      and (model_ax == 1 or use_screen) else "xla")
        if engine == "fused" and model_ax > 1 and not use_screen:
            raise ValueError(
                "engine='fused' with a model>1 mesh requires the "
                "funnel (screen_k < NMODEL): the dense fused kernel "
                "replicates the grid per device.  Use screen_k or "
                "engine='xla' for dense grid sharding.")
        if (engine == "fused" and model_ax > 1
                and lnprior_ext is not None):
            raise NotImplementedError(
                "lnprior_ext with a model-sharded fused mesh")
        if mesh is not None and batch_size % mesh.shape["data"] != 0:
            raise ValueError("batch_size must be divisible by the "
                             "mesh 'data' axis size")

        batch_shard = None
        fused_devices = None
        if engine == "fused" and model_ax > 1:
            # Model-sharded funnel: grid tables sharded over the mesh
            # 'model' axis, stars over 'data', one shard_map step (see
            # `_screened_step` / `loglike_grid_screened` sharded mode).
            from .ops.pallas_loglike import prepare_screen
            from .parallel import data_sharding
            from jax.sharding import NamedSharding, PartitionSpec as P
            aux = {"lnprior": np.asarray(lnprior, np.float32)}
            if feh_arr is not None:
                aux["feh"] = np.asarray(feh_arr, np.float32)
            if loga_arr is not None:
                aux["loga"] = np.asarray(loga_arr, np.float32)
            (coeffs_t, packed, aux_names, n_real,
             maskrow) = prepare_screen(
                 self.models, aux=aux, tile=tile, n_shards=model_ax,
                 screen_block=fit_cfg.screen_block)
            ct_s = jax.device_put(
                coeffs_t, NamedSharding(mesh, P(None, None, "model")))
            # Block-major gather tables carry the model axis in ROWS
            # ((Mp // gb) * C, gb); column-major carries it in columns.
            pk_spec = (P("model", None) if packed.shape[1] != maskrow.shape[1]
                       else P(None, "model"))
            pk_s = jax.device_put(packed, NamedSharding(mesh, pk_spec))
            mr_s = jax.device_put(
                maskrow, NamedSharding(mesh, P(None, "model")))
            batch_shard = data_sharding(mesh)
            step = self._build_step(
                fit_cfg, post_cfg, gal_cfg, dust_cfg, apply_av_prior,
                apply_dlabels, None, None, has_ext=False,
                engine="fused_screen", tile=tile,
                screen_tables=(ct_s, pk_s, aux_names, n_real, mr_s),
                mesh=mesh, lngalprior=lngalprior, lndustprior=lndustprior)
        elif engine == "fused":
            fused_devices = (list(mesh.devices.flatten())
                             if mesh is not None else [None])
            steps = []
            if use_screen:
                # Funnel: screening kernel + per-star shortlist fit.
                # Grid prior / labels travel as gathered aux columns.
                from .ops.pallas_loglike import prepare_screen
                aux = {"lnprior": np.asarray(lnprior, np.float32)}
                if feh_arr is not None:
                    aux["feh"] = np.asarray(feh_arr, np.float32)
                if loga_arr is not None:
                    aux["loga"] = np.asarray(loga_arr, np.float32)
                (coeffs_t, packed, aux_names, n_real,
                 maskrow) = prepare_screen(
                     self.models, aux=aux, tile=tile,
                     screen_block=fit_cfg.screen_block)
                for dev in fused_devices:
                    put = (lambda x: x if dev is None
                           else jax.device_put(x, dev))
                    steps.append(self._build_step(
                        fit_cfg, post_cfg, gal_cfg, dust_cfg,
                        apply_av_prior, apply_dlabels, None, None,
                        has_ext=ext_lnl is not None,
                        engine="fused_screen", tile=tile,
                        screen_tables=(put(coeffs_t), put(packed),
                                       aux_names, n_real,
                                       put(maskrow)),
                        lngalprior=lngalprior,
                        lndustprior=lndustprior))
            if not use_screen:
                from .ops.pallas_loglike import prepare_coeffs
                coeffs_t, n_real = prepare_coeffs(self.models, tile=tile)
                pad = coeffs_t.shape[-1] - n_real

                def padded(a, fill, dt):
                    a = np.asarray(a, dt)
                    return np.concatenate([a, np.full(pad, fill, dt)]) \
                        if pad else a

                dt = np.float32
                lnprior_h = padded(lnprior, -1e30, dt)
                feh_h = (padded(feh_arr, 0.0, dt)
                         if feh_arr is not None else None)
                loga_h = (padded(loga_arr, 9.0, dt)
                          if loga_arr is not None else None)
                if pad and ext_lnl is not None:
                    ext_lnl = np.concatenate(
                        [ext_lnl, np.zeros((n_data, pad), ext_lnl.dtype)],
                        axis=1)

                for dev in fused_devices:
                    put = (lambda x: x if dev is None
                           else (jax.device_put(x, dev)
                                 if x is not None else None))
                    steps.append(self._build_step(
                        fit_cfg, post_cfg, gal_cfg, dust_cfg,
                        apply_av_prior, apply_dlabels,
                        put(coeffs_t), put(jnp.asarray(lnprior_h)),
                        feh=put(jnp.asarray(feh_h)) if feh_h is not None
                        else None,
                        loga=put(jnp.asarray(loga_h))
                        if loga_h is not None else None,
                        has_ext=ext_lnl is not None,
                        engine="fused", tile=tile, n_real=n_real,
                        lngalprior=lngalprior,
                        lndustprior=lndustprior))
            if len(fused_devices) == 1:
                step = steps[0]
            else:
                # Star-batch data parallelism for the fused engine: the
                # Mosaic kernel dispatches eagerly per device (async),
                # so the per-device sub-batches run concurrently.
                n_dev = len(fused_devices)
                nb = batch_size // n_dev

                def step(*args):
                    # Returns the per-device output dicts UNMATERIALIZED
                    # (a list): the batch streamer packs each device's
                    # results into two matrices and starts their
                    # device->host copies asynchronously, so all devices
                    # stream back concurrently while the next batch
                    # computes — the old `np.asarray` + concat here
                    # serialized one blocking fetch per (device, key) on
                    # the host thread.
                    outs = []
                    for i, dev in enumerate(fused_devices):
                        sl = slice(i * nb, (i + 1) * nb)
                        put = lambda x, s=True: (
                            None if x is None
                            else jax.device_put(x[sl] if s else x, dev))
                        a = [put(x) for x in args[:9]]
                        a.append(put(args[9], s=False))   # dust ladder
                        a.append(put(args[10]))
                        outs.append(steps[i](*a))
                    return outs
        elif use_screen:
            # Plain-XLA funnel: same screen -> block shortlist -> fit
            # algorithm, no Pallas (non-TPU backends; model-sharded
            # grids run it under shard_map).  lnprior/labels ride as
            # gathered aux columns like the fused funnel.
            from .ops.screen_xla import prepare_screen_xla
            aux = {"lnprior": np.asarray(lnprior, np.float32)}
            if feh_arr is not None:
                aux["feh"] = np.asarray(feh_arr, np.float32)
            if loga_arr is not None:
                aux["loga"] = np.asarray(loga_arr, np.float32)
            block = fit_cfg.screen_block
            (tabw, tabc, packed_b, aux_names,
             n_real) = prepare_screen_xla(self.models, aux=aux,
                                          block=block,
                                          n_shards=model_ax)
            if mesh is not None:
                from .parallel import data_sharding
                from jax.sharding import NamedSharding, PartitionSpec as P
                tabw = jax.device_put(
                    tabw, NamedSharding(mesh, P(None, None, "model")))
                tabc = jax.device_put(
                    tabc, NamedSharding(mesh, P(None, None, "model")))
                packed_b = jax.device_put(
                    packed_b, NamedSharding(mesh, P("model", None, None)))
                batch_shard = data_sharding(mesh)
            step = self._build_step(
                fit_cfg, post_cfg, gal_cfg, dust_cfg, apply_av_prior,
                apply_dlabels, None, None, has_ext=ext_lnl is not None,
                engine="xla_screen",
                screen_tables=(tabw, tabc, packed_b, aux_names, n_real),
                mesh=mesh, lngalprior=lngalprior,
                lndustprior=lndustprior)
        else:
            if mesh is not None:
                from .parallel import shard_grid, data_sharding
                (device_models, (lnprior_dev, feh_dev, loga_dev),
                 n_real) = shard_grid(mesh, self.models,
                                      lnprior.astype(self.models.dtype),
                                      feh_arr, loga_arr)
                pad_m = device_models.shape[0] - n_real
                if pad_m:
                    # Padded models fit as well as real ones (the flux
                    # scale absorbs magnitude offsets); kill them via
                    # the grid prior.
                    lnprior_dev = lnprior_dev.at[n_real:].set(-1e30)
                    if ext_lnl is not None:
                        ext_lnl = np.concatenate(
                            [ext_lnl, np.zeros((n_data, pad_m),
                                               ext_lnl.dtype)], axis=1)
                batch_shard = data_sharding(mesh)
            else:
                device_models = jnp.asarray(self.models)
                lnprior_dev = jnp.asarray(lnprior, device_models.dtype)
                feh_dev = (jnp.asarray(feh_arr, device_models.dtype)
                           if feh_arr is not None else None)
                loga_dev = (jnp.asarray(loga_arr, device_models.dtype)
                            if loga_arr is not None else None)
            step = self._build_step(fit_cfg, post_cfg, gal_cfg, dust_cfg,
                                    apply_av_prior, apply_dlabels,
                                    device_models, lnprior_dev,
                                    feh=feh_dev, loga=loga_dev,
                                    has_ext=ext_lnl is not None,
                                    engine="xla",
                                    lngalprior=lngalprior,
                                    lndustprior=lndustprior)

        writer = None
        if save_file is not None:
            writer = ResultsWriter(save_file, n_data, Ndraws,
                                   labels=data_labels,
                                   save_dar_draws=save_dar_draws,
                                   resume=resume)
        start_row = writer.cursor if (writer is not None and resume) else 0

        pending = [None]   # one in-flight batch (device->host overlap)

        # Scanned dispatch (`scan_batches` > 1): group N star batches
        # into one `lax.scan` call — only where the step exposes a
        # scanned variant (single-device funnel engines).
        n_scan = (max(1, int(scan_batches))
                  if hasattr(step, "scan") and batch_shard is None else 1)
        chunk = batch_size * n_scan
        step_call = step.scan if n_scan > 1 else step

        def batches_dispatch():
            """Stream `(lo, n_valid, out)` per completed star batch."""
            root_key = jax.random.PRNGKey(seed)
            for lo in range(start_row, n_data, chunk):
                hi = min(lo + chunk, n_data)
                n = hi - lo
                pad = chunk - n
                sl = slice(lo, hi)

                def group(x):
                    """(chunk, ...) -> (n_scan, batch_size, ...)."""
                    if n_scan == 1:
                        return x
                    return x.reshape((n_scan, batch_size) + x.shape[1:])

                def pad_batch(x):
                    x = np.asarray(x[sl])
                    if pad:
                        x = np.concatenate(
                            [x, np.repeat(x[-1:], pad, axis=0)])
                    x = group(x)
                    if batch_shard is not None:
                        return jax.device_put(x, batch_shard)
                    return jnp.asarray(x)

                keys = group(jax.vmap(jax.random.fold_in, (None, 0))(
                    root_key, jnp.arange(lo, lo + chunk)))
                args = (keys, pad_batch(data), pad_batch(data_err),
                        pad_batch(data_mask), pad_batch(parallax),
                        pad_batch(parallax_err), pad_batch(data_coords),
                        pad_batch(dust_mean) if apply_av_prior else None,
                        pad_batch(dust_std) if apply_av_prior else None,
                        dust_dist,
                        pad_batch(ext_lnl) if ext_lnl is not None else None)
                out = step_call(*args)
                # Pack to two matrices (one fetch round trip each),
                # start the device->host copies immediately, but only
                # materialize the PREVIOUS batch: the device computes
                # batch i+1 while batch i streams back (the host link
                # is a major cost at these throughputs).  The
                # multi-device fused path returns a LIST of per-device
                # dicts; each device's pair packs and streams
                # independently (concurrent readback over all devices).
                # The top-K diagnostics are ~75% of the result bytes
                # and feed no output dataset; fetch only on request.
                skip = (() if return_sel
                        else ("sel_idx", "lnp_sel", "valid_sel"))
                parts = out if isinstance(out, list) else [out]
                if all(isinstance(p, dict) and hasattr(
                        next(iter(p.values())), "copy_to_host_async")
                        for p in parts):
                    packs, layout = [], None
                    for p in parts:
                        fpack, ipack, layout = _pack_outputs(p, skip)
                        for v in (fpack, ipack):
                            if v is not None:
                                v.copy_to_host_async()
                        packs.append((fpack, ipack))
                    item = (lo, n, packs, None, layout)
                else:       # interpret-mode fallbacks return numpy
                    merged = (parts[0] if len(parts) == 1 else
                              {k: np.concatenate(
                                  [np.asarray(p[k]) for p in parts])
                               for k in parts[0]})
                    item = (lo, n, merged, None, None)
                if pending[0] is not None:
                    yield pending[0]
                pending[0] = item

        def batches():
            def emit(item):
                lo, n, a, b, layout = item
                if layout is None:
                    return lo, n, {k: np.asarray(v) for k, v in a.items()}
                parts = [_unpack_outputs(f, i, layout) for f, i in a]
                if len(parts) == 1:
                    return lo, n, parts[0]
                return lo, n, {k: np.concatenate([p[k] for p in parts])
                               for k in parts[0]}

            for item in batches_dispatch():
                yield emit(item)
            if pending[0] is not None:
                item, pending[0] = pending[0], None
                yield emit(item)

        if _yield_batches:
            return batches()

        collected = [] if return_results else None
        t_start = time.time()
        n_done = 0
        for lo, n, out in batches():
            if writer is not None:
                writer.write_batch(lo, out, n_valid=n)
            if collected is not None:
                collected.append({k: v[:n] for k, v in out.items()})

            n_done += n
            if verbose:
                dt = time.time() - t_start
                rate = dt / max(n_done, 1)
                remain = rate * (n_data - start_row - n_done)
                sys.stderr.write(
                    f"\rFitting object {start_row + n_done}/{n_data} "
                    f"[chi2/n: {out['chi2min'][n - 1]:.1f}/"
                    f"{out['ndim'][n - 1]}] "
                    f"(mean time: {rate:.3f} s/obj, "
                    f"est. remaining: {remain:.1f} s)   ")
                sys.stderr.flush()
        if verbose:
            sys.stderr.write("\n")
        if writer is not None:
            writer.close()
        if collected is not None:
            return {k: np.concatenate([c[k] for c in collected])
                    for k in collected[0]}

    def _fit(self, data, data_err, data_mask, **kwargs):
        """Per-object generator (API parity with reference
        `brutus/fitting.py:1803-2065`); yields the reference's
        13-tuple per star.

        Memory-bounded: batches are fit lazily as the generator is
        consumed (one `batch_size` block resident at a time), unlike a
        full-catalog materialization.
        """
        kwargs.setdefault("save_file", None)
        kwargs.setdefault("verbose", False)
        kwargs.pop("return_results", None)
        for _lo, n, out in self.fit(data, data_err, data_mask,
                                    _yield_batches=True, **kwargs):
            for i in range(n):
                yield (out["model_idx"][i], out["scale"][i], out["av"][i],
                       out["rv"][i], out["cov_sar"][i], out["ndim"][i],
                       out["lnprob"][i], out["log_evidence"][i],
                       out["chi2min"][i], out["dist"][i], out["red"][i],
                       out["dred"][i], out["logwt"][i])


__all__ = ["BruteForce", "loglike", "lnpost", "default_grid_lnprior"]
