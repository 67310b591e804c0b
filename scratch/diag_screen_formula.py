"""Reproduce the screen kernel's chi2 expansion in numpy (f64 + f32)
for the dense-argmax model of star 0 — formula bug vs precision?"""
import os

import numpy as np

wd = "/tmp/brutus_tpu_examples"
d = np.load(os.path.join(wd, "recall_grid.npz"))
mc = d["coeffs"].astype(np.float64)
score = np.load(os.path.join(wd, "recall_score_64.npz"))["score"]

r = np.random.default_rng(11)
M = len(mc)
n_star = 64
idx = r.integers(0, M, n_star)
av_t = r.uniform(0.1, 1.2, n_star)
rv_t = r.uniform(2.9, 3.7, n_star)
dist = r.uniform(0.3, 2.5, n_star)
sed = (mc[idx, :, 0] + av_t[:, None]
       * (mc[idx, :, 1] + rv_t[:, None] * mc[idx, :, 2]))
flux = 10 ** (-0.4 * sed) / dist[:, None] ** 2
err = flux / 40.0
flux = flux + r.normal(size=flux.shape) * err
plx = 1.0 / dist + r.normal(size=n_star) * 0.02 / dist
plxe = 0.02 / dist

CEN = 12.0
LN10 = np.log(10.0)
avm, av_sig = 0.0, 10.0   # check config below
try:
    import sys
    sys.path.insert(0, "/root/repo")
except Exception:
    pass

b = 0
m = 101478
for dt in (np.float64, np.float32):
    mags = (-2.5 * np.log10(np.maximum(flux[b], 1e-300))).astype(dt)
    me = (2.5 / LN10 * err[b] / np.maximum(flux[b], 1e-300)).astype(dt)
    w = (1.0 / me ** 2).astype(dt)
    m0 = (mc[m, :, 0] - CEN).astype(dt)
    r0 = mc[m, :, 1].astype(dt)
    dr = mc[m, :, 2].astype(dt)
    mcw = ((mags - CEN) * w).astype(dt)

    A01 = (w * r0).sum(dtype=dt)
    A02 = (w * dr).sum(dtype=dt)
    Bm0 = (w * m0).sum(dtype=dt)
    A11 = (w * r0 * r0).sum(dtype=dt)
    A12 = (w * r0 * dr).sum(dtype=dt)
    A22 = (w * dr * dr).sum(dtype=dt)
    Bm1 = (w * m0 * r0).sum(dtype=dt)
    Bm2 = (w * m0 * dr).sum(dtype=dt)
    Q2 = (w * m0 * m0).sum(dtype=dt)
    C1 = (mcw * r0).sum(dtype=dt)
    C2 = (mcw * dr).sum(dtype=dt)
    Cm = (mcw * m0).sum(dtype=dt)
    a00 = w.sum(dtype=dt)
    C0 = mcw.sum(dtype=dt)
    q0 = ((mags - CEN) * mcw).sum(dtype=dt)

    avvi = dt(1.0 / 100.0)   # cfg.av_gauss placeholder; adjust
    b0 = C0 - Bm0
    b1r = C1 - Bm1
    b2 = C2 - Bm2
    b1 = b1r + dt(avm) * avvi
    a11 = A11 + avvi
    det = (a00 * (a11 * A22 - A12 * A12)
           - A01 * (A01 * A22 - A12 * A02)
           + A02 * (A01 * A12 - a11 * A02))
    det1 = (a00 * (b1 * A22 - A12 * b2)
            - b0 * (A01 * A22 - A12 * A02)
            + A02 * (A01 * b2 - b1 * A02))
    det2 = (a00 * (a11 * b2 - b1 * A12)
            - A01 * (A01 * b2 - b1 * A02)
            + b0 * (A01 * A12 - a11 * A02))
    av = np.clip(det1 / det, 0.0, 6.0)
    avrv = det2 / det
    rv = np.clip(avrv / av if abs(av) > 1e-10 else 3.3, 1.0, 8.0)
    avrv = av * rv
    u = (b0 - av * A01 - avrv * A02) / a00
    rss0 = q0 - 2.0 * Cm + Q2
    chi2 = (rss0 + u * u * a00 + av * av * A11 + avrv * avrv * A22
            - 2.0 * (u * b0 + av * b1r + avrv * b2)
            + 2.0 * (u * av * A01 + u * avrv * A02 + av * avrv * A12))
    # explicit residual for truth
    resid = (mags - CEN) - m0 - u - av * r0 - avrv * dr
    chi2_direct = (w * resid * resid).sum(dtype=dt)
    print(f"{np.dtype(dt).name}: av={av:.3f} rv={rv:.3f} u={u:.4f} "
          f"chi2_expansion={chi2:.2f} chi2_direct={chi2_direct:.2f} "
          f"rss0={rss0:.1f} q0={q0:.1f} Cm={Cm:.1f} Q2={Q2:.1f}")
print("kernel score at model:", score[b, m])
print("mag errs:", np.round(2.5 / LN10 / 40.0, 4), "w~", 1/(2.5/LN10/40)**2)
