"""Two-tier funnel design study (host, f64, cached artifacts).

Answers, on the correlated 758k-model SEDmaker grid:
  (a) one-tier recall at fine (screen_k, block) steps — picks the
      shipped default that reaches worst-star >= 0.95;
  (b) tier-1 candidates: how wide a K1 superset (at what tier-1 block
      width) each cheap score needs for LOSSLESS tier-2 composition:
        - 5-col fixed-Rv (mu, Av) clamped 2x2 solve (the round-3
          candidate, scratch/recall_two_tier.py),
        - 2-col fixed-(Av, Rv) mu-only scores, single point and
          best-of-a-small-Av-ladder (each ladder point costs 2 MXU
          output columns; L points = 2L columns vs 9 exact).
      Tier-2 = exact 3x3 block score re-ranking inside the K1 superset
      at the shipped (screen_k, block).

Requires the caches written by scratch/recall_curve.py and
scratch/recall_two_tier.py (dense reference + exact/fixed-Rv scores).

Run:  python scratch/twotier_design.py [n_star]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))

import numpy as np

import _synth  # noqa: E402

LN10 = np.log(10.0)


def load_reference(n_star):
    d = np.load(os.path.join(_synth.workdir(), "recall_grid.npz"))
    mc = d["coeffs"].astype(np.float64)
    cat = _synth.synth_catalog(d["coeffs"], n_star=n_star, seed=11,
                               snr=40.0)
    chunks = [np.load(os.path.join(
        _synth.workdir(), f"recall_dense_{n_star}_{lo}.npz"))["lnl"]
        for lo in range(0, n_star, 16)]
    both = np.concatenate(chunks, axis=1).astype(np.float64)
    lnl, dscale = both[0], both[1]
    lnl = lnl - 0.5 * ((np.sqrt(np.maximum(dscale, 1e-30))
                        - cat["parallax"][:, None]) ** 2
                       / cat["parallax_err"][:, None] ** 2)
    w = np.exp(np.clip(lnl - lnl.max(axis=1, keepdims=True), -745, 0.0))
    w[w < 1e-3] = 0.0
    return mc, cat, w, w.sum(axis=1)


def star_weights(cat):
    """Mag-space data + weights exactly as the screen sees them
    (prepare_star_data: wt_mag = (flux / (1.0857 * err))^2 on good
    bands)."""
    flux, err = cat["flux"], cat["err"]
    good = np.isfinite(flux) & (flux > 0)
    mags = np.where(good, -2.5 * np.log10(np.maximum(flux, 1e-300)), 0.0)
    wt = np.where(good, (flux * LN10 * 0.4 / err) ** 2, 0.0)
    return mags, wt


def fixed_point_score(mc, mags, wt, plx, plxw, av, rv):
    """mu-only chi2 score at fixed (av, rv): 2 MXU columns per point.

    v[m, f] = mag + av*(r0 + rv*dr); chi2 = rss - b^2/a00 with
    b = sum w (m - v), rss = sum w (m - v)^2, plus the parallax chi2
    at the implied scale mu = b / a00.
    """
    v = mc[:, :, 0] + av * (mc[:, :, 1] + rv * mc[:, :, 2])  # (M, F)
    a00 = wt.sum(axis=1, keepdims=True)                      # (B, 1)
    # b = C0 - sum w v ; rss = q0 - 2 sum w m v + sum w v^2
    C0 = (wt * mags).sum(axis=1, keepdims=True)
    q0 = (wt * mags * mags).sum(axis=1, keepdims=True)
    Bv = wt @ v.T                                            # (B, M)
    Bmv = (wt * mags) @ v.T
    Bv2 = wt @ (v * v).T
    b = C0 - Bv
    rss = q0 - 2.0 * Bmv + Bv2
    u = b / a00
    chi2 = rss - b * b / a00
    par = np.exp(-0.2 * LN10 * u)
    chi2 = chi2 + (par - plx[:, None]) ** 2 * plxw[:, None]
    return -0.5 * chi2


def recall_of(block_idx, w, wsum, cat, block, n_real):
    n_star, nb = block_idx.shape
    idx = (block_idx[:, :, None] * block
           + np.arange(block)[None, None, :]).reshape(n_star, -1)
    rec = np.array([w[b, idx[b][idx[b] < n_real]].sum() / wsum[b]
                    for b in range(n_star)])
    hit = np.mean([cat["idx"][b] in idx[b] for b in range(n_star)])
    return rec, hit


def block_max(score, block):
    n_star, M = score.shape
    Mb = M // block
    return score[:, :Mb * block].reshape(n_star, Mb, block).max(-1)


def compose(order1_blocks, bs_exact_fine, k1_blocks, nb2, fine_per_1):
    """Tier-1 top-k1_blocks (coarse) -> tier-2 exact re-rank at the
    fine block width inside the superset -> top-nb2 fine blocks."""
    n_star = order1_blocks.shape[0]
    sel1 = order1_blocks[:, :k1_blocks]          # coarse ids
    # expand coarse blocks to their fine sub-blocks
    fine = (sel1[:, :, None] * fine_per_1
            + np.arange(fine_per_1)[None, None, :]).reshape(n_star, -1)
    b3 = np.take_along_axis(bs_exact_fine, fine, axis=1)
    sub = np.argsort(-b3, axis=1)[:, :nb2]
    return np.take_along_axis(fine, sub, axis=1)


def main():
    n_star = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    mc, cat, w, wsum = load_reference(n_star)
    n_real = mc.shape[0]
    gkey = f"{n_real}_{abs(int(float(mc.sum()) * 1e3)) % 10 ** 8:08d}"
    s3 = np.load(os.path.join(_synth.workdir(),
                              f"twotier_score_3x3_{n_star}_{gkey}.npy"))
    s2 = np.load(os.path.join(_synth.workdir(),
                              f"twotier_score_2x2_{n_star}_{gkey}.npy"))
    mags, wt = star_weights(cat)
    plx, plxw = cat["parallax"], 1.0 / cat["parallax_err"] ** 2

    print("== (a) one-tier exact-score recall, fine (k, block) ==",
          flush=True)
    for block in (128, 256):
        bs = block_max(s3, block)
        order = np.argsort(-bs, axis=1)
        for k in (8192, 10240, 12288, 16384, 20480):
            nb = k // block
            rec, hit = recall_of(order[:, :nb], w, wsum, cat, block,
                                 n_real)
            print(f"  k={k:6d} block={block}: min={rec.min():.4f} "
                  f"p10={np.percentile(rec, 10):.4f} "
                  f"mean={rec.mean():.4f} hit={hit:.3f}", flush=True)

    # Tier-1 candidates: scores -> coarse-block order.
    cands = {"5col fixed-Rv": s2}
    for name, pts in (("2col Av=0.6", [(0.6, 3.3)]),
                      ("2x2col Av={0.2,1.0}", [(0.2, 3.3), (1.0, 3.3)]),
                      ("3x2col Av={0.1,0.6,1.2}",
                       [(0.1, 3.3), (0.6, 3.3), (1.2, 3.3)])):
        sc = None
        for av, rv in pts:
            s = fixed_point_score(mc, mags, wt, plx, plxw, av, rv)
            sc = s if sc is None else np.maximum(sc, s)
        cands[name] = sc

    # Shipped tier-2 target: the (a) winner is decided after this runs;
    # report compositions for both candidate finals.
    for fk, fblock in ((16384, 256), (12288, 128), (16384, 128)):
        nb2 = fk // fblock
        bs_fine = block_max(s3, fblock)
        ord_exact = np.argsort(-bs_fine, axis=1)
        rec0, hit0 = recall_of(ord_exact[:, :nb2], w, wsum, cat, fblock,
                               n_real)
        print(f"== (b) two-tier to final k={fk} block={fblock} "
              f"(one-tier min={rec0.min():.4f}) ==", flush=True)
        for name, sc in cands.items():
            for t1block in (256, 512, 1024):
                f1 = t1block // fblock
                bs1 = block_max(sc, t1block)
                order1 = np.argsort(-bs1, axis=1)
                for K1 in (16384, 32768, 65536):
                    k1b = K1 // t1block
                    final = compose(order1, bs_fine, k1b, nb2, f1)
                    rec, hit = recall_of(final, w, wsum, cat, fblock,
                                         n_real)
                    tag = ("LOSSLESS" if rec.min() >= rec0.min() - 1e-9
                           else f"min={rec.min():.4f}")
                    print(f"  {name:24s} t1block={t1block:4d} "
                          f"K1={K1:6d}: {tag} p10="
                          f"{np.percentile(rec, 10):.4f} hit={hit:.3f}",
                          flush=True)


if __name__ == "__main__":
    main()
