"""Funnel shortlist recall at the FULL 49-band registry width.

Round-5 VERDICT task 6 (accuracy half): every recall artifact so far
ran F=8; the screen kernel packs filters into 8-wide sublane groups
(n_g = 7 groups at F=49) and the claim that block recall holds at wide
F was untested.  Same methodology as scratch/recall_curve.py (dense
fused yardstick + host-side block-selection sweep on fetched per-block
score maxima), on a label-ordered SEDmaker grid built with all 49
registered filters.

Run on TPU:  python scratch/recall_f49.py [n_star]
Appends an "f49" section to RECALL.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))

import numpy as np

import _synth  # noqa: E402
from brutus_tpu.filters import FILTERS  # all 49 registered bands


def build_grid_f49():
    """Label-ordered grid via SEDmaker at F=49 (smaller label lattice
    than the F=8 probe: 49-band tables are ~6x the bytes/model)."""
    from brutus_tpu.models.nn import write_nn_file
    from brutus_tpu.models.sedmaker import SEDmaker
    cache = os.path.join(_synth.workdir(), "recall_grid_f49.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        print(f"grid: {len(d['coeffs'])} models (cached)", flush=True)
        return d["coeffs"], d["labels"]
    paths = _synth.make_data_files()
    nn49 = os.path.join(_synth.workdir(), "nn_f49.h5")
    NF = len(FILTERS)
    h = 8
    rng = np.random.default_rng(4949)
    xmin = np.array([2000.0, 0.0, -3.0, -0.3, 0.0, 1.0])
    xmax = np.array([20000.0, 6.0, 1.0, 0.7, 2.5, 6.0])
    write_nn_file(nn49, FILTERS,
                  rng.normal(size=(NF, h, 6)) * 5.0,
                  rng.normal(size=(NF, h, 1)) * 1.0,
                  rng.normal(size=(NF, h, h)) * 1.5,
                  rng.normal(size=(NF, h, 1)) * 0.5,
                  rng.normal(size=(NF, 1, h)) * 6.0,
                  rng.normal(size=(NF, 1, 1)) * 0.3, xmin, xmax)
    mk = SEDmaker(filters=FILTERS, nnfile=nn49,
                  mistfile=paths["tracks"], verbose=False)
    mini = np.linspace(0.5, 2.0, 240)
    eep = np.arange(202.0, 601.0, 1.25)       # 320 pts
    feh = np.linspace(-1.0, 0.5, 10)
    t0 = time.time()
    mk.make_grid(mini_grid=mini, eep_grid=eep, feh_grid=feh,
                 smf_grid=[0.0], verbose=False)
    coeffs = np.stack([mk.grid_sed[n] for n in mk.filters], axis=1)
    labels = mk.grid_label
    ok = np.isfinite(coeffs).all(axis=(1, 2))
    print(f"grid: {ok.sum()}/{len(coeffs)} finite models "
          f"in {time.time()-t0:.1f} s", flush=True)
    coeffs = np.ascontiguousarray(coeffs[ok], np.float32)
    np.savez(cache, coeffs=coeffs, labels=labels[ok])
    return coeffs, labels[ok]


def main():
    n_star = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    import jax.numpy as jnp
    from brutus_tpu.config import FitConfig
    from brutus_tpu.ops.pallas_loglike import (
        loglike_grid_fused, loglike_grid_screened, prepare_coeffs,
        prepare_screen)

    mc, labels = build_grid_f49()
    M = len(mc)
    cat = _synth.synth_catalog(mc, n_star=n_star, seed=11, snr=40.0)
    flux = jnp.asarray(cat["flux"], jnp.float32)
    err = jnp.asarray(cat["err"], jnp.float32)
    mask = jnp.asarray(cat["mask"])
    plx = jnp.asarray(cat["parallax"], jnp.float32)
    plxe = jnp.asarray(cat["parallax_err"], jnp.float32)

    cfg = FitConfig()
    tile = 512

    ct, n_real = prepare_coeffs(mc, tile=tile)
    chunks = []
    for lo in range(0, n_star, 8):
        cpath = os.path.join(_synth.workdir(),
                             f"recall49_dense_{n_star}_{lo}.npz")
        if os.path.exists(cpath):
            chunks.append(np.load(cpath)["lnl"])
            print(f"dense chunk {lo}: cached", flush=True)
            continue
        t0 = time.time()
        sl = slice(lo, lo + 8)
        dense = loglike_grid_fused(flux[sl], err[sl], mask[sl], ct,
                                   cfg=cfg, tile=tile, n_real=n_real)
        c = np.stack([np.asarray(dense["lnlike"], np.float32)[:, :n_real],
                      np.asarray(dense["scale"], np.float32)[:, :n_real]])
        np.savez(cpath, lnl=c)
        chunks.append(c)
        print(f"dense chunk {lo}: {time.time()-t0:.1f} s", flush=True)
    both = np.concatenate(chunks, axis=1).astype(np.float64)
    lnl, dscale = both[0], both[1]
    # screen ranks on likelihood + parallax, so must the yardstick
    lnl = lnl - 0.5 * ((np.sqrt(np.maximum(dscale, 1e-30))
                        - np.asarray(cat["parallax"])[:, None]) ** 2
                       / np.asarray(cat["parallax_err"])[:, None] ** 2)
    lmax = lnl.max(axis=1, keepdims=True)
    w = np.exp(np.clip(lnl - lmax, -745, 0.0))
    w[w < 1e-3] = 0.0
    wsum = w.sum(axis=1)
    n_surv = (w > 0).sum(axis=1)
    print(f"survivors/star: med={np.median(n_surv):.0f} "
          f"max={n_surv.max()}", flush=True)

    BASE = 128
    scache = os.path.join(_synth.workdir(),
                          f"recall49_bscore{BASE}_{n_star}.npz")
    if os.path.exists(scache):
        score = np.load(scache)["score"]
        print("screen block scores: cached", flush=True)
    else:
        st, packed, names, n_real2, maskrow = prepare_screen(
            mc, aux=dict(lnprior=np.zeros(M, np.float32)), tile=tile,
            screen_block=BASE)
        score = loglike_grid_screened(
            flux, err, mask, st, packed, maskrow, n_real2,
            parallax=plx, parallax_err=plxe, cfg=cfg, tile=tile,
            screen_block=BASE, stop_after="screen")
        score = np.asarray(score)[:n_star]
        np.savez(scache, score=score)

    results = []
    for block in (128, 256):
        f = block // BASE
        Mb = score.shape[1] // f
        bscore = score[:, :Mb * f].reshape(n_star, Mb, f).max(-1)
        order = np.argsort(-bscore, axis=1)
        for screen_k in (8192, 12288, 16384):
            nb = max(1, min(screen_k // block, Mb))
            bidx = order[:, :nb]
            idx = (bidx[:, :, None] * block
                   + np.arange(block)[None, None, :]).reshape(n_star, -1)
            rec = np.zeros(n_star)
            for b in range(n_star):
                sel = idx[b][idx[b] < n_real]
                rec[b] = w[b, sel].sum() / wsum[b]
            hit = np.mean([cat["idx"][b] in idx[b]
                           for b in range(n_star)])
            results.append(dict(screen_k=int(nb * block),
                                block=int(block),
                                recall_min=float(rec.min()),
                                recall_mean=float(rec.mean()),
                                recall_p10=float(np.percentile(rec, 10)),
                                true_model_on_list=float(hit)))
            print(results[-1], flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "RECALL.json")
    with open(path) as f:
        out = json.load(f)
    out["f49"] = dict(n_models=int(n_real), n_star=n_star,
                      n_filters=len(FILTERS),
                      survivors_median=float(np.median(n_surv)),
                      survivors_max=int(n_surv.max()),
                      results=results)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("updated RECALL.json (f49 section)")


if __name__ == "__main__":
    main()
