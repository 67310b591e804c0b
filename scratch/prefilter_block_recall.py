"""Posterior-mass recall of BLOCK-granular prefilter selection.

Numpy-only (reuses the cached dense yardstick + screen block scores of
scratch/recall_curve.py; run that first on TPU if caches are missing).
For each star the funnel shortlist (top screen_k/screen_block score
blocks, screen rank order — the production slot order) is re-ranked by
lnprob exactly as `ops/posterior.py`'s prefilter does, then the
top-2048 selection is taken at single-slot granularity (shipped
default) vs `blk`-slot block granularity (PosteriorConfig.
prefilter_block): blocks of `blk` consecutive shortlist slots ranked
by block-max.  Recall = cull-surviving posterior mass captured /
total dense mass (same definition as RECALL.json).

Run:  python scratch/prefilter_block_recall.py
"""
import json
import os

import numpy as np

WD = "/tmp/brutus_tpu_examples"
N_STAR = 64
BASE = 128                      # granularity of the cached block scores
SCREEN_K, SCREEN_BLOCK = 12288, 256   # shipped funnel defaults
K1 = 2048                       # prefilter_k = n_sel_max default


def synth_catalog_params(M, n_star=64, seed=11):
    """Parallax/idx replica of examples/_synth.synth_catalog (numpy
    RNG is draw-order deterministic; flux draws consumed in order)."""
    r = np.random.default_rng(seed)
    idx = r.integers(0, M, n_star)
    r.uniform(0.1, 1.2, n_star)          # av (unused)
    r.uniform(2.9, 3.7, n_star)          # rv
    dist = r.uniform(0.3, 2.5, n_star)
    return idx, dist, r


def main():
    d = np.load(os.path.join(WD, "recall_grid.npz"))
    M = len(d["coeffs"])
    idx_true, dist, r = synth_catalog_params(M, N_STAR)
    # consume the flux/parallax noise draws in catalog order
    F = d["coeffs"].shape[1]
    r.normal(size=(N_STAR, F))                      # flux noise
    plx = 1.0 / dist + r.normal(size=N_STAR) * 0.02 / dist
    plxe = 0.02 / dist

    chunks = [np.load(os.path.join(WD, f"recall_dense_{N_STAR}_{lo}.npz"))
              ["lnl"] for lo in range(0, N_STAR, 16)]
    both = np.concatenate(chunks, axis=1).astype(np.float64)
    lnl, dscale = both[0], both[1]
    n_real = lnl.shape[1]
    lnp = lnl - 0.5 * ((np.sqrt(np.maximum(dscale, 1e-30))
                        - plx[:, None]) ** 2 / plxe[:, None] ** 2)
    lmax = lnp.max(axis=1, keepdims=True)
    w = np.exp(np.clip(lnp - lmax, -745, 0.0))
    w[w < 1e-3] = 0.0           # cull #1 survivors carry the mass
    wsum = w.sum(axis=1)

    score = np.load(os.path.join(
        WD, f"recall_bscore{BASE}_{N_STAR}.npz"))["score"]
    f = SCREEN_BLOCK // BASE
    Mb = score.shape[1] // f
    bscore = score[:, :Mb * f].reshape(N_STAR, Mb, f).max(-1)
    order = np.argsort(-bscore, axis=1)
    nb = SCREEN_K // SCREEN_BLOCK
    bidx = order[:, :nb]
    # shortlist model ids in production slot order (block rank major)
    slots = (bidx[:, :, None] * SCREEN_BLOCK
             + np.arange(SCREEN_BLOCK)[None, None, :]).reshape(N_STAR, -1)

    results = []
    for blk in (1, 4, 8, 16):
        rec = np.zeros(N_STAR)
        for b in range(N_STAR):
            sl = slots[b]
            valid = sl < n_real
            key = np.where(valid, lnp[b, np.minimum(sl, n_real - 1)],
                           -1e30)
            if blk == 1:
                pick = np.argsort(-key)[:K1]
            else:
                kb = key.reshape(-1, blk).max(axis=1)
                top = np.argsort(-kb)[:K1 // blk]
                pick = (top[:, None] * blk
                        + np.arange(blk)[None, :]).reshape(-1)
            sel = sl[pick]
            sel = sel[sel < n_real]
            rec[b] = w[b, sel].sum() / wsum[b]
        results.append(dict(prefilter_block=blk,
                            recall_min=float(rec.min()),
                            recall_mean=float(rec.mean()),
                            recall_p10=float(np.percentile(rec, 10))))
        print(results[-1], flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "RECALL.json")
    with open(path) as fh:
        out = json.load(fh)
    out["prefilter_block"] = dict(
        n_star=N_STAR, screen_k=SCREEN_K, screen_block=SCREEN_BLOCK,
        prefilter_k=K1, note="recall of the top-K1 prefilter selection "
        "at block granularity vs dense mass (shortlist fixed at the "
        "shipped funnel defaults)", results=results)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("updated RECALL.json (prefilter_block section)")


if __name__ == "__main__":
    main()
