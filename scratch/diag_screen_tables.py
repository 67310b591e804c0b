"""Check the packed bf16 screening TABLES term-by-term on the real TPU.

Reconstructs the nine bilinear sums from `prepare_screen`'s packed
split tables with plain-XLA bf16 dots (no Pallas), and compares each
term against exact f32 host sums.  If these match, the tables and the
split trick are fine and the defect is inside the kernel; if not, the
packing itself is wrong at real-data magnitudes.

Run on TPU: python scratch/diag_screen_tables.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))

import numpy as np
import jax
import jax.numpy as jnp
import _synth  # noqa: E402


def main():
    from brutus_tpu.config import FitConfig
    from brutus_tpu.ops.optimize import prepare_star_data
    from brutus_tpu.ops.pallas_loglike import (
        prepare_screen, _screen_star_mats, _screen_parallax,
        SCREEN_MAG_CENTER, SCREEN_FP, N_SCREEN_W, N_SCREEN_C)

    d = np.load(os.path.join(_synth.workdir(), "recall_grid.npz"))
    mc = d["coeffs"][:131072]          # structured slice of the grid
    M = len(mc)
    tile = 512
    n_star = 16
    cat = _synth.synth_catalog(d["coeffs"], n_star=n_star, seed=11,
                               snr=40.0)
    cfg = FitConfig()

    (tab_w, tab_c), packed, names, n_real, maskrow = prepare_screen(
        mc, tile=tile)
    Mp = maskrow.shape[1]

    prep = prepare_star_data(jnp.asarray(cat["flux"], jnp.float32),
                             jnp.asarray(cat["err"], jnp.float32),
                             jnp.asarray(cat["mask"]), cfg)
    mags, wt = prep[2], prep[3]
    plx, plxw = _screen_parallax(jnp.asarray(cat["parallax"]),
                                 jnp.asarray(cat["parallax_err"]))
    F = mags.shape[1]
    n_g = tab_w.shape[0]
    fp = n_g * SCREEN_FP
    wb, cb, srow = _screen_star_mats(mags, wt, plx[:, None],
                                     plxw[:, None], 0, fp)

    @jax.jit
    def dots(wb, cb, tw, tc):
        ow = sum(jax.lax.dot_general(wb[g], tw[g], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
                 for g in range(n_g))
        oc = sum(jax.lax.dot_general(cb[g], tc[g], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
                 for g in range(n_g))
        return ow, oc

    ow, oc = dots(wb, cb, tab_w, tab_c)
    ow, oc = np.asarray(ow), np.asarray(oc)
    # un-interleave the per-tile term-major column layout
    nt = Mp // tile
    ow = ow.reshape(n_star, nt, N_SCREEN_W, tile)
    oc = oc.reshape(n_star, nt, N_SCREEN_C, tile)
    got = {}
    for j, name in enumerate(("A01", "A02", "Bm0", "A11", "A12", "A22")):
        got[name] = ow[:, :, j].reshape(n_star, Mp)[:, :M]
    for j, name in enumerate(("RS", "b1r", "b2")):
        got[name] = oc[:, :, j].reshape(n_star, Mp)[:, :M]

    # exact f32 host sums (centered)
    mg = np.asarray(mags, np.float64)
    w = np.asarray(wt, np.float64)
    m_c = mg - SCREEN_MAG_CENTER
    mw = m_c * w
    c = mc.transpose(2, 1, 0).astype(np.float64)
    m0 = c[0] - SCREEN_MAG_CENTER
    r0, dr = c[1], c[2]
    truth = {
        "A01": w @ r0, "A02": w @ dr, "Bm0": w @ m0,
        "A11": w @ (r0 * r0), "A12": w @ (r0 * dr), "A22": w @ (dr * dr),
        "RS": mw @ (-2.0 * m0) + w @ (m0 * m0),
        "b1r": mw @ r0 + w @ (-m0 * r0),
        "b2": mw @ dr + w @ (-m0 * dr),
    }
    for name in got:
        dd = got[name] - truth[name]
        scale = np.abs(truth[name]).max()
        print(f"{name}: max|err| {np.abs(dd).max():.5g}  "
              f"(scale {scale:.4g}, rel {np.abs(dd).max()/scale:.2e})",
              flush=True)


if __name__ == "__main__":
    main()
