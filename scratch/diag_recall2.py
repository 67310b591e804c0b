"""Pure-numpy diagnosis of the screen-vs-dense ranking failure on the
correlated SEDmaker grid (no jax import — the tunnel can wedge)."""
import os
import sys

import numpy as np

wd = "/tmp/brutus_tpu_examples"
score = np.load(os.path.join(wd, "recall_score_64.npz"))["score"]
chunks = [np.load(os.path.join(wd, f"recall_dense_64_{lo}.npz"))["lnl"]
          for lo in (0, 16, 32, 48)]
both = np.concatenate(chunks, axis=1).astype(np.float64)
lnl, dscale = both[0], both[1]
d = np.load(os.path.join(wd, "recall_grid.npz"))
mc = d["coeffs"].astype(np.float64)
n_real = lnl.shape[1]

# inline synth_catalog(mc, n_star=64, seed=11, snr=40.0)
r = np.random.default_rng(11)
M = len(mc)
n_star = 64
idx = r.integers(0, M, n_star)
av = r.uniform(0.1, 1.2, n_star)
rv = r.uniform(2.9, 3.7, n_star)
dist = r.uniform(0.3, 2.5, n_star)
sed = (mc[idx, :, 0] + av[:, None]
       * (mc[idx, :, 1] + rv[:, None] * mc[idx, :, 2]))
flux = 10 ** (-0.4 * sed) / dist[:, None] ** 2
err = flux / 40.0
flux = flux + r.normal(size=flux.shape) * err
plx = 1.0 / dist + r.normal(size=n_star) * 0.02 / dist
plxe = 0.02 / dist

lnlp = lnl - 0.5 * ((np.sqrt(np.maximum(dscale, 1e-30))
                     - plx[:, None]) ** 2 / plxe[:, None] ** 2)

for b in range(4):
    s = score[b, :n_real].astype(np.float64)
    l = lnlp[b]
    top = np.argsort(-l)[:10]
    order = np.argsort(-s)
    pos = np.empty(n_real, int)
    pos[order] = np.arange(n_real)
    print(f"star {b}: true={idx[b]} d={dist[b]:.2f} av={av[b]:.2f} "
          f"dense-argmax={l.argmax()} score-argmax={s.argmax()}")
    print("  dense-top10 pos-in-score-rank:", pos[top])
    print("  dense lnlp  @top:", np.round(l[top[:5]], 1))
    print("  score       @top:", np.round(s[top[:5]], 1))
    print("  score max:", np.round(s.max(), 1),
          " @dense-argmax:", np.round(s[l.argmax()], 1))
    # What are the score-top models like in dense terms?
    stop = order[:5]
    print("  score-top5 dense-lnlp:", np.round(l[stop], 1),
          " dense rank:", np.searchsorted(-np.sort(-l), -l[stop]))
    # magnitude-space direct solve on the score-top model vs true:
    for m in [int(s.argmax()), int(l.argmax())]:
        mags = -2.5 * np.log10(np.maximum(flux[b], 1e-300))
        me = 2.5 / np.log(10) * err[b] / np.maximum(flux[b], 1e-300)
        w = 1.0 / me ** 2
        m0, r0, dr = mc[m, :, 0], mc[m, :, 1], mc[m, :, 2]
        A = np.array([
            [w.sum(), (w * r0).sum(), (w * dr).sum()],
            [(w * r0).sum(), (w * r0 * r0).sum() + 1/3.0**2,
             (w * r0 * dr).sum()],
            [(w * dr).sum(), (w * r0 * dr).sum(), (w * dr * dr).sum()]])
        resid0 = mags - m0
        bv = np.array([(w * resid0).sum(),
                       (w * resid0 * r0).sum() + 0.0,
                       (w * resid0 * dr).sum()])
        x = np.linalg.solve(A, bv)
        u, avs, avrv = x
        rr = resid0 - u - avs * r0 - avrv * dr
        chi2 = (w * rr * rr).sum()
        pimp = 10 ** (-0.2 * u)
        chi2p = chi2 + (pimp - plx[b]) ** 2 / plxe[b] ** 2
        print(f"   model {m}: solve av={avs:.2f} rv="
              f"{avrv/avs if abs(avs)>1e-9 else np.nan:.2f} "
              f"mu={u:.3f} chi2={chi2:.1f} +plx={chi2p:.1f} "
              f"kernel-score={s[m]:.1f}")
