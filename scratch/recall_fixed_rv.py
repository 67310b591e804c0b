"""Recall of a CHEAPER fixed-Rv screening score vs the current 3x3 one.

The v4 screen kernel solves the full (mu, Av, Av*Rv) 3x3 WLS per
(star, model) — 9 MXU output planes.  Fixing Rv at the prior mean
turns it into a (mu, Av) 2x2 solve needing only 5 planes
(w-terms: rvec, rvec^2, m0; data-terms: rss0 fold, b1 fold), a ~45%
screen-stage cut.  This script measures what that costs in shortlist
recall, using the cached correlated-grid dense reference from
scratch/recall_curve.py (jax-on-CPU float64; no TPU needed).
"""
import os
import sys
import time

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import _synth  # noqa: E402

CHUNK = 65536


def _chunked_score(mags, wt, plx, plxw, mc, cfg, solve_rv):
    """(B, M) screen score, f64, vectorized over stars, chunked over
    models.  solve_rv=True reproduces the v4 3x3 score; False is the
    fixed-Rv 2x2 candidate."""
    avm, av_sig = cfg.av_gauss
    rvm, _ = cfg.rv_gauss
    avvi = 1.0 / av_sig ** 2
    LN10 = float(np.log(10.0))

    @jax.jit
    def block(m0, r0, dr):
        # m0/r0/dr: (F, T); mags/wt: (B, F)
        w = wt[:, :, None]                      # (B, F, 1)
        resid0 = mags[:, :, None] - m0[None]    # (B, F, T)
        a00 = jnp.sum(wt, axis=1)[:, None]      # (B, 1)
        b0 = jnp.sum(w * resid0, axis=1)        # (B, T)
        rss0 = jnp.sum(w * resid0 ** 2, axis=1)
        if solve_rv:
            A01 = jnp.sum(w * r0, axis=1)
            A02 = jnp.sum(w * dr, axis=1)
            A11 = jnp.sum(w * r0 * r0, axis=1)
            A12 = jnp.sum(w * r0 * dr, axis=1)
            A22 = jnp.sum(w * dr * dr, axis=1)
            b1r = jnp.sum(w * resid0 * r0, axis=1)
            b2 = jnp.sum(w * resid0 * dr, axis=1)
            a11 = A11 + avvi
            b1 = b1r + avm * avvi
            det = (a00 * (a11 * A22 - A12 * A12)
                   - A01 * (A01 * A22 - A12 * A02)
                   + A02 * (A01 * A12 - a11 * A02))
            det1 = (a00 * (b1 * A22 - A12 * b2)
                    - b0 * (A01 * A22 - A12 * A02)
                    + A02 * (A01 * b2 - b1 * A02))
            det2 = (a00 * (a11 * b2 - b1 * A12)
                    - A01 * (A01 * b2 - b1 * A02)
                    + b0 * (A01 * A12 - a11 * A02))
            sd = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
            av = jnp.clip(det1 / sd, *cfg.avlim)
            avrv = det2 / sd
            rv = jnp.where(jnp.abs(av) > 1e-10,
                           avrv / jnp.where(jnp.abs(av) > 1e-10, av, 1.0),
                           rvm)
            rv = jnp.clip(rv, *cfg.rvlim)
            avrv = av * rv
            u = (b0 - av * A01 - avrv * A02) / a00
            chi2 = (rss0 + u * u * a00 + av * av * A11
                    + avrv * avrv * A22
                    - 2.0 * (u * b0 + av * b1r + avrv * b2)
                    + 2.0 * (u * av * A01 + u * avrv * A02
                             + av * avrv * A12))
        else:
            rvec = r0 + rvm * dr
            A01 = jnp.sum(w * rvec, axis=1)
            A11 = jnp.sum(w * rvec * rvec, axis=1)
            b1r = jnp.sum(w * resid0 * rvec, axis=1)
            b1 = b1r + avm * avvi
            a11 = A11 + avvi
            det = a00 * a11 - A01 * A01
            sd = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
            av = jnp.clip((a00 * b1 - A01 * b0) / sd, *cfg.avlim)
            u = (b0 - av * A01) / a00
            chi2 = (rss0 + u * u * a00 + av * av * A11
                    - 2.0 * (u * b0 + av * b1r) + 2.0 * u * av * A01)
        par = jnp.exp(-0.2 * LN10 * u)
        chi2 = chi2 + (par - plx[:, None]) ** 2 * plxw[:, None]
        return -0.5 * chi2

    M = mc.shape[0]
    out = np.empty((mags.shape[0], M))
    for lo in range(0, M, CHUNK):
        hi = min(lo + CHUNK, M)
        sl = jnp.asarray(mc[lo:hi].transpose(2, 1, 0))   # (3, F, T)
        out[:, lo:hi] = np.asarray(block(sl[0], sl[1], sl[2]))
    return out


def main():
    n_star = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from brutus_tpu.config import FitConfig
    from brutus_tpu.ops.optimize import prepare_star_data

    t0 = time.time()
    d = np.load(os.path.join(_synth.workdir(), "recall_grid.npz"))
    mc = d["coeffs"].astype(np.float64)
    cat = _synth.synth_catalog(d["coeffs"], n_star=n_star, seed=11,
                               snr=40.0)
    chunks = [np.load(os.path.join(_synth.workdir(),
                                   f"recall_dense_{n_star}_{lo}.npz"))["lnl"]
              for lo in range(0, n_star, 16)]
    both = np.concatenate(chunks, axis=1).astype(np.float64)
    print(f"loaded in {time.time()-t0:.0f} s", flush=True)
    lnl, dscale = both[0], both[1]
    n_real = lnl.shape[1]
    lnl = lnl - 0.5 * ((np.sqrt(np.maximum(dscale, 1e-30))
                        - cat["parallax"][:, None]) ** 2
                       / cat["parallax_err"][:, None] ** 2)
    lmax = lnl.max(axis=1, keepdims=True)
    w = np.exp(np.clip(lnl - lmax, -745, 0.0))
    w[w < 1e-3] = 0.0
    wsum = w.sum(axis=1)
    print(f"survivors/star: med={np.median((w > 0).sum(1)):.0f} "
          f"max={(w > 0).sum(1).max()}", flush=True)

    cfg = FitConfig()
    prep = prepare_star_data(jnp.asarray(cat["flux"], jnp.float32),
                             jnp.asarray(cat["err"], jnp.float32),
                             jnp.asarray(cat["mask"]), cfg)
    mags = jnp.asarray(np.asarray(prep[2]), jnp.float64)
    wt = jnp.asarray(np.asarray(prep[3]), jnp.float64)
    plx = jnp.asarray(cat["parallax"])
    plxw = 1.0 / jnp.asarray(cat["parallax_err"]) ** 2

    for name, solve_rv in (("3x3", True), ("2x2-fixedRv", False)):
        t0 = time.time()
        score = _chunked_score(mags, wt, plx, plxw, mc, cfg, solve_rv)
        print(f"{name} scored in {time.time()-t0:.0f} s", flush=True)
        for block_w in (256,):
            Mb = n_real // block_w
            bs = score[:, :Mb * block_w].reshape(n_star, Mb,
                                                 block_w).max(-1)
            order = np.argsort(-bs, axis=1)
            for screen_k in (2048, 4096, 8192, 16384):
                nb = min(screen_k // block_w, Mb)
                idx = (order[:, :nb, None] * block_w
                       + np.arange(block_w)[None, None, :]
                       ).reshape(n_star, -1)
                rec = np.array([w[b, idx[b][idx[b] < n_real]].sum()
                                / wsum[b] for b in range(n_star)])
                hit = np.mean([cat["idx"][b] in idx[b]
                               for b in range(n_star)])
                print(f"{name} block={block_w} k={screen_k}: "
                      f"recall min={rec.min():.4f} "
                      f"p10={np.percentile(rec, 10):.4f} "
                      f"mean={rec.mean():.4f} hit={hit:.3f}", flush=True)


if __name__ == "__main__":
    main()
