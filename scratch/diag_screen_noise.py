"""Localize the hardware screen-score noise (round-4 recall regression).

Computes, for the correlated recall grid + catalog, per-128-block score
maxima four ways and compares their per-star top-block rankings:

  (a) f64 sums + f64 epilogue        (truth; recall_fixed_rv path)
  (b) f64 sums -> f32, f32 epilogue  (epilogue sensitivity)
  (c) f32 sums (numpy f32 exact-ish) + f32 epilogue
  (d) the cached HARDWARE kernel block scores (recall_bscore128)

Run on CPU: python scratch/diag_screen_noise.py [n_star]
"""
import os
import sys

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


def sums_np(mags, wt, mc, dtype):
    """The nine per-(star, model) bilinear sums in the given dtype,
    chunked over models.  Centered like the kernel."""
    from brutus_tpu.ops.pallas_loglike import SCREEN_MAG_CENTER
    B = mags.shape[0]
    M = mc.shape[0]
    out = {k: np.empty((B, M), dtype) for k in
           ("A01", "A02", "Bm0", "A11", "A12", "A22", "RS", "b1r", "b2")}
    m_c = (mags - SCREEN_MAG_CENTER).astype(dtype)
    w = wt.astype(dtype)
    mw = (m_c * w).astype(dtype)
    for lo in range(0, M, 65536):
        hi = min(lo + 65536, M)
        c = mc[lo:hi].transpose(2, 1, 0).astype(dtype)   # (3, F, T)
        m0 = c[0] - dtype(SCREEN_MAG_CENTER)
        r0, dr = c[1], c[2]
        sl = slice(lo, hi)
        out["A01"][:, sl] = w @ r0
        out["A02"][:, sl] = w @ dr
        out["Bm0"][:, sl] = w @ m0
        out["A11"][:, sl] = w @ (r0 * r0)
        out["A12"][:, sl] = w @ (r0 * dr)
        out["A22"][:, sl] = w @ (dr * dr)
        out["RS"][:, sl] = mw @ (-2.0 * m0) + w @ (m0 * m0)
        out["b1r"][:, sl] = mw @ r0 + w @ (-m0 * r0)
        out["b2"][:, sl] = mw @ dr + w @ (-m0 * dr)
    return out


def epilogue(s, a00, C0, q0, plx, plxw, cfg, dtype):
    from brutus_tpu.ops.pallas_loglike import screen_score_from_sums
    conv = lambda x: jnp.asarray(np.asarray(x, dtype))
    return np.asarray(screen_score_from_sums(
        conv(s["A01"]), conv(s["A02"]), conv(s["Bm0"]), conv(s["A11"]),
        conv(s["A12"]), conv(s["A22"]), conv(s["RS"]), conv(s["b1r"]),
        conv(s["b2"]), conv(a00[:, None]), conv(C0[:, None]),
        conv(q0[:, None]), conv(plx[:, None]), conv(plxw[:, None]), cfg))


def main():
    n_star = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from brutus_tpu.config import FitConfig
    from brutus_tpu.ops.optimize import prepare_star_data
    from brutus_tpu.ops.pallas_loglike import SCREEN_MAG_CENTER

    d = np.load(os.path.join(_synth.workdir(), "recall_grid.npz"))
    mc = d["coeffs"]
    cat = _synth.synth_catalog(mc, n_star=64, seed=11, snr=40.0)
    cfg = FitConfig()
    prep = prepare_star_data(jnp.asarray(cat["flux"], jnp.float32),
                             jnp.asarray(cat["err"], jnp.float32),
                             jnp.asarray(cat["mask"]), cfg)
    mags = np.asarray(prep[2], np.float64)[:n_star]
    wt = np.asarray(prep[3], np.float64)[:n_star]
    plx = cat["parallax"][:n_star]
    plxw = 1.0 / cat["parallax_err"][:n_star] ** 2

    m_c = mags - SCREEN_MAG_CENTER
    a00 = (wt).sum(1)
    C0 = (m_c * wt).sum(1)
    q0 = (m_c * m_c * wt).sum(1)

    n = mc.shape[0] // 128

    def bmax(score):
        return score[:, :n * 128].reshape(n_star, n, 128).max(-1)

    s64 = sums_np(mags, wt, mc, np.float64)
    sa = bmax(epilogue(s64, a00, C0, q0, plx, plxw, cfg, np.float64))
    sb = bmax(epilogue(s64, a00, C0, q0, plx, plxw, cfg, np.float32))
    s32 = sums_np(mags.astype(np.float32), wt.astype(np.float32),
                  mc.astype(np.float32), np.float32)
    sc = bmax(epilogue(s32, a00, C0, q0, plx, plxw, cfg, np.float32))
    hw = np.load(os.path.join(_synth.workdir(),
                              "recall_bscore128_64.npz"))["score"]
    sd = hw[:n_star, :n]

    def cmp(name, x, ref):
        # error on blocks near the per-star best (the ones that matter)
        best = ref.max(1, keepdims=True)
        good = ref > best - 25.0
        delta = (x - x.max(1, keepdims=True)) - (ref - best)
        ov = np.mean([len(set(np.argsort(-x[b])[:64])
                          & set(np.argsort(-ref[b])[:64])) / 64
                      for b in range(n_star)])
        print(f"{name}: top-block delta p50/p95/max "
              f"{np.percentile(np.abs(delta[good]), [50, 95, 100])} "
              f"top64-overlap {ov:.3f}", flush=True)

    cmp("b (f32 epilogue)         vs a", sb, sa)
    cmp("c (f32 sums + epilogue)  vs a", sc, sa)
    cmp("d (hardware kernel)      vs a", sd, sa)
    cmp("d (hardware kernel)      vs c", sd, sc)


if __name__ == "__main__":
    main()
