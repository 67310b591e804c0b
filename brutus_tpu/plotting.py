"""
Posterior visualization (host-side matplotlib).

Parity: reference `brutus/plotting.py` — `cornerplot`, `dist_vs_red`,
`posterior_predictive`, `photometric_offsets`, `photometric_offsets_2d`,
and the corner-style `_hist2d` contour helper.  These are analysis-side
utilities; the implementations are compact re-derivations of the same
plots driven by the results schema written by `fitting.BruteForce`.
"""

import numpy as np
import matplotlib
import matplotlib.pyplot as plt
from scipy.ndimage import gaussian_filter as norm_kde

from .utils import quantile as _wquantile


def _quantile(x, q, weights=None):
    return np.asarray(_wquantile(np.asarray(x), np.asarray(q),
                                 None if weights is None
                                 else np.asarray(weights)))


def _hist2d(x, y, ax=None, span=None, weights=None, levels=None,
            color="gray", plot_density=True, plot_contours=True,
            fill_contours=True, smooth=0.02, bins=100, **kwargs):
    """Corner-style smoothed 2-D histogram with sigma-level contours.

    Parity: reference `brutus/plotting.py:1386-1602` (same default
    0.5/1/1.5/2-sigma levels and density shading).
    """
    if ax is None:
        ax = plt.gca()
    if levels is None:
        levels = 1.0 - np.exp(-0.5 * np.arange(0.5, 2.1, 0.5) ** 2)
    if span is None:
        span = [[x.min(), x.max()], [y.min(), y.max()]]
    H, xe, ye = np.histogram2d(x, y, bins=bins, range=span,
                               weights=weights)
    if smooth is not None:
        sx = smooth * H.shape[0] if smooth < 1 else smooth
        sy = smooth * H.shape[1] if smooth < 1 else smooth
        H = norm_kde(H, (sx, sy))
    # Convert density levels to histogram thresholds.
    Hflat = np.sort(H.ravel())[::-1]
    cum = np.cumsum(Hflat)
    cum /= cum[-1]
    V = np.array([Hflat[np.searchsorted(cum, lv)]
                  if lv < 1 else Hflat[-1] for lv in levels])
    V.sort()
    V = np.unique(V)
    xc = 0.5 * (xe[1:] + xe[:-1])
    yc = 0.5 * (ye[1:] + ye[:-1])
    if plot_density:
        ax.pcolormesh(xe, ye, H.T, cmap="Greys", shading="auto",
                      rasterized=True)
    if plot_contours and len(V) > 1:
        if fill_contours:
            ax.contourf(xc, yc, H.T, np.concatenate([V, [H.max() * 1.01]]),
                        colors=None, cmap="Greys", alpha=0.6)
        ax.contour(xc, yc, H.T, V, colors=color, **kwargs)
    ax.set_xlim(span[0])
    ax.set_ylim(span[1])
    return ax


def cornerplot(samples, labels=None, weights=None, span=None,
               quantiles=(0.16, 0.5, 0.84), truths=None, fig=None,
               color="black", smooth=0.02, bins=50,
               show_titles=True, title_fmt=".2f", **kwargs):
    """Corner plot of posterior samples.

    Parity: reference `brutus/plotting.py:38-520` (`cornerplot`),
    generalized to any `(ndim, nsamps)` sample array — the reference's
    usage passes stellar labels + derived dist/Av/Rv per star.
    """
    samples = np.atleast_2d(np.asarray(samples))
    if samples.shape[0] > samples.shape[1]:
        samples = samples.T
    ndim, nsamps = samples.shape
    if labels is None:
        labels = [f"x{i}" for i in range(ndim)]
    if span is None:
        span = [[_quantile(s, [0.001, 0.999], weights)[i]
                 for i in (0, 1)] for s in samples]
        span = [[lo, hi if hi > lo else lo + 1e-10] for lo, hi in span]

    if fig is None:
        fig, axes = plt.subplots(ndim, ndim,
                                 figsize=(2.2 * ndim, 2.2 * ndim))
    else:
        axes = np.asarray(fig.axes).reshape(ndim, ndim)
    axes = np.atleast_2d(axes)

    for i in range(ndim):
        for j in range(ndim):
            ax = axes[i, j]
            if j > i:
                ax.axis("off")
                continue
            if i == j:
                h, edges = np.histogram(samples[i], bins=bins,
                                        range=span[i], weights=weights)
                ax.stairs(h, edges, color=color, fill=False)
                if quantiles:
                    for q in _quantile(samples[i], quantiles, weights):
                        ax.axvline(q, ls="--", color=color, lw=1)
                if truths is not None and truths[i] is not None:
                    ax.axvline(truths[i], color="crimson", lw=1.5)
                if show_titles:
                    lo, mid, hi = _quantile(samples[i],
                                            [0.16, 0.5, 0.84], weights)
                    ax.set_title(f"{labels[i]} = {mid:{title_fmt}}"
                                 f"$^{{+{hi - mid:{title_fmt}}}}"
                                 f"_{{-{mid - lo:{title_fmt}}}}$",
                                 fontsize=9)
                ax.set_yticks([])
                ax.set_xlim(span[i])
            else:
                _hist2d(samples[j], samples[i], ax=ax,
                        span=[span[j], span[i]], weights=weights,
                        smooth=smooth, bins=bins, color=color, **kwargs)
                if truths is not None:
                    if truths[j] is not None:
                        ax.axvline(truths[j], color="crimson", lw=1.5)
                    if truths[i] is not None:
                        ax.axhline(truths[i], color="crimson", lw=1.5)
            if i == ndim - 1:
                ax.set_xlabel(labels[j])
            if j == 0 and i > 0:
                ax.set_ylabel(labels[i])
    fig.tight_layout()
    return fig, axes


def dist_vs_red(data, ebv=False, dist_type="distance_modulus",
                parallax=None, parallax_err=None, cmap="magma",
                bins=(750, 300), span=None, smooth=0.01, ax=None,
                weights=None, **kwargs):
    """Smoothed 2-D distance-reddening posterior for one star.

    Parity: reference `brutus/plotting.py:523-776`; accepts saved
    `(dists, reds, dreds)` draws for one object.
    """
    from .pdf import bin_pdfs_distred
    dists, reds, dreds = [np.atleast_2d(np.asarray(v)) for v in data]
    pdfs, xe, ye = bin_pdfs_distred(
        (dists, reds, dreds), ebv=ebv, dist_type=dist_type, bins=bins,
        span=span, smooth=smooth,
        parallaxes=(None if parallax is None else np.atleast_1d(parallax)),
        parallax_errors=(None if parallax_err is None
                         else np.atleast_1d(parallax_err)))
    if ax is None:
        ax = plt.gca()
    ax.pcolormesh(xe, ye, pdfs[0].T, cmap=cmap, shading="auto",
                  rasterized=True, **kwargs)
    labels = {"scale": "scale $s$", "parallax": r"parallax [mas]",
              "distance": "distance [kpc]",
              "distance_modulus": r"$\mu$ [mag]"}
    ax.set_xlabel(labels[dist_type])
    ax.set_ylabel(r"$E(B-V)$ [mag]" if ebv else r"$A_V$ [mag]")
    return ax, (pdfs[0], xe, ye)


def posterior_predictive(models, idxs, reds, dreds, dists, data=None,
                         data_err=None, data_mask=None, offset=None,
                         labels=None, vcolor="blue", pcolor="black",
                         ax=None, **kwargs):
    """Posterior-predictive SED check: model flux distributions per band
    against the observed photometry.

    Parity: reference `brutus/plotting.py:779-936`.
    """
    from .ops.sed import get_seds
    import jax.numpy as jnp
    seds = np.asarray(get_seds(jnp.asarray(models[np.asarray(idxs)]),
                               av=jnp.asarray(reds),
                               rv=jnp.asarray(dreds), return_flux=True))
    seds = seds / np.asarray(dists)[:, None] ** 2
    n_filt = seds.shape[1]
    if offset is not None:
        seds = seds * np.asarray(offset)
    if ax is None:
        ax = plt.gca()
    parts = ax.violinplot([seds[:, i] for i in range(n_filt)],
                          positions=np.arange(n_filt), widths=0.8,
                          showextrema=False)
    for pc in parts["bodies"]:
        pc.set_facecolor(vcolor)
        pc.set_alpha(0.5)
    if data is not None:
        mask = (np.ones(n_filt, bool) if data_mask is None
                else np.asarray(data_mask, bool))
        x = np.arange(n_filt)[mask]
        ax.errorbar(x, np.asarray(data)[mask],
                    yerr=(None if data_err is None
                          else np.asarray(data_err)[mask]),
                    fmt="o", color=pcolor, capsize=3)
    if labels is not None:
        ax.set_xticks(np.arange(n_filt))
        ax.set_xticklabels(labels, rotation=45, ha="right")
    ax.set_ylabel("flux density")
    return ax


def photometric_offsets(phot, err, mask, models, idxs, reds, dreds, dists,
                        x, bins=50, offset=None, sel=None, weights=None,
                        xlabel=None, ax=None, color="black", **kwargs):
    """Binned median model/data flux ratio vs a quantity `x`.

    Parity: reference `brutus/plotting.py:939-1145` — the 1-D
    diagnostic of photometric offsets per band as a function of e.g.
    magnitude or color.  Returns `(ax, (bin_centers, medians))` for the
    requested band data already flattened into `phot`.
    """
    from .ops.sed import get_seds
    import jax.numpy as jnp
    n_obj, n_samp = np.shape(idxs)
    if sel is None:
        sel = np.ones(n_obj, bool)
    seds = np.asarray(get_seds(jnp.asarray(models[np.asarray(idxs).ravel()]),
                               av=jnp.asarray(np.asarray(reds).ravel()),
                               rv=jnp.asarray(np.asarray(dreds).ravel()),
                               return_flux=True))
    seds = (seds / np.asarray(dists).ravel()[:, None] ** 2).reshape(
        n_obj, n_samp, -1)
    if offset is not None:
        seds = seds * np.asarray(offset)
    ratio = np.nanmedian(seds, axis=1) / phot      # (Nobj, Nfilt)
    if ax is None:
        ax = plt.gca()
    edges = np.linspace(np.nanmin(x), np.nanmax(x), bins + 1)
    centers = 0.5 * (edges[1:] + edges[:-1])
    med = np.full((bins, ratio.shape[1]), np.nan)
    for b in range(bins):
        inbin = sel & (x >= edges[b]) & (x < edges[b + 1])
        if inbin.sum() > 2:
            med[b] = np.nanmedian(ratio[inbin], axis=0)
    for i in range(ratio.shape[1]):
        ax.plot(centers, med[:, i], **kwargs)
    ax.axhline(1.0, ls="--", color=color)
    if xlabel:
        ax.set_xlabel(xlabel)
    ax.set_ylabel("model / data")
    return ax, (centers, med)


def photometric_offsets_2d(phot, err, mask, models, idxs, reds, dreds,
                           dists, x, y, bins=40, band=0, offset=None,
                           sel=None, ax=None, cmap="coolwarm",
                           clim=(0.9, 1.1), **kwargs):
    """2-D map of median model/data ratio vs `(x, y)` for one band.

    Parity: reference `brutus/plotting.py:1148-1383`.
    """
    from .ops.sed import get_seds
    import jax.numpy as jnp
    n_obj, n_samp = np.shape(idxs)
    if sel is None:
        sel = np.ones(n_obj, bool)
    seds = np.asarray(get_seds(jnp.asarray(models[np.asarray(idxs).ravel()]),
                               av=jnp.asarray(np.asarray(reds).ravel()),
                               rv=jnp.asarray(np.asarray(dreds).ravel()),
                               return_flux=True))
    seds = (seds / np.asarray(dists).ravel()[:, None] ** 2).reshape(
        n_obj, n_samp, -1)
    if offset is not None:
        seds = seds * np.asarray(offset)
    ratio = np.nanmedian(seds[:, :, band], axis=1) / phot[:, band]
    xe = np.linspace(np.nanmin(x), np.nanmax(x), bins + 1)
    ye = np.linspace(np.nanmin(y), np.nanmax(y), bins + 1)
    H = np.full((bins, bins), np.nan)
    ix = np.clip(np.digitize(x, xe) - 1, 0, bins - 1)
    iy = np.clip(np.digitize(y, ye) - 1, 0, bins - 1)
    for b in range(bins):
        for c in range(bins):
            inbin = sel & (ix == b) & (iy == c)
            if inbin.sum() > 2:
                H[b, c] = np.nanmedian(ratio[inbin])
    if ax is None:
        ax = plt.gca()
    pc = ax.pcolormesh(xe, ye, H.T, cmap=cmap, vmin=clim[0], vmax=clim[1],
                       shading="auto", **kwargs)
    plt.colorbar(pc, ax=ax, label="model / data")
    return ax, (H, xe, ye)


__all__ = ["cornerplot", "dist_vs_red", "posterior_predictive",
           "photometric_offsets", "photometric_offsets_2d", "_hist2d"]
