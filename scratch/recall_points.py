"""Recall at arbitrary (screen_k, block) from the cached dense lnl +
cached exact 3x3 screening scores (see recall_two_tier.py).  Pure
numpy — no device work."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))
import numpy as np  # noqa: E402
import _synth  # noqa: E402


def main():
    n_star = 64
    d = np.load(os.path.join(_synth.workdir(), "recall_grid.npz"))
    mc = d["coeffs"].astype(np.float64)
    cat = _synth.synth_catalog(d["coeffs"], n_star=n_star, seed=11,
                               snr=40.0)
    chunks = [np.load(os.path.join(
        _synth.workdir(), f"recall_dense_{n_star}_{lo}.npz"))["lnl"]
        for lo in range(0, n_star, 16)]
    both = np.concatenate(chunks, axis=1).astype(np.float64)
    lnl, dscale = both[0], both[1]
    n_real = lnl.shape[1]
    lnl = lnl - 0.5 * ((np.sqrt(np.maximum(dscale, 1e-30))
                        - cat["parallax"][:, None]) ** 2
                       / cat["parallax_err"][:, None] ** 2)
    lmax = lnl.max(axis=1, keepdims=True)
    w = np.exp(np.clip(lnl - lmax, -745, 0.0))
    w[w < 1e-3] = 0.0
    wsum = w.sum(axis=1)

    gkey = f"{mc.shape[0]}_{abs(int(float(mc.sum()) * 1e3)) % 10**8:08d}"
    score = np.load(os.path.join(
        _synth.workdir(), f"twotier_score_3x3_{n_star}_{gkey}.npy"))

    for block in (32, 64, 128):
        Mb = n_real // block
        bs = score[:, :Mb * block].reshape(n_star, Mb, block).max(-1)
        order = np.argsort(-bs, axis=1)
        for k in (8192, 10240, 12288, 16384):
            nb = k // block
            idx = (order[:, :nb, None] * block
                   + np.arange(block)[None, None, :]).reshape(n_star, -1)
            rec = np.array([w[b, idx[b][idx[b] < n_real]].sum() / wsum[b]
                            for b in range(n_star)])
            hit = np.mean([cat["idx"][b] in idx[b]
                           for b in range(n_star)])
            print(f"block={block:3d} k={k:5d}: min={rec.min():.4f} "
                  f"p10={np.percentile(rec, 10):.4f} "
                  f"mean={rec.mean():.4f} hit={hit:.3f}", flush=True)


if __name__ == "__main__":
    main()
