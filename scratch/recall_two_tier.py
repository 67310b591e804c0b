"""Two-tier screen recall: fixed-Rv tier-1 prefilter -> exact 3x3 tier-2.

The v4 screen streams 9 MXU output columns per model (measured ~11.4 of
the 22.9 ms full step at B=128).  A fixed-Rv (mu, Av) 2x2 score needs
only 5 columns but its ranking alone loses recall (0.82 -> 0.25 at
k=8192, scratch/recall_fixed_rv.py).  Candidate: tier-1 selects a WIDE
top-K1 block superset with the 5-column score over all M; tier-2
re-ranks ONLY those K1 models with the exact 9-column 3x3 score and
keeps the usual top screen_k=8192.  Column count: 5*M + 9*K1 vs 9*M —
a ~36% screen cut at K1=64k if recall holds.

This script measures, in float64 on CPU against the cached dense
reference (scratch/recall_curve.py artifacts), the posterior-mass
recall of the two-tier composition across K1, at block=256 (the
production default).

Run:  python scratch/recall_two_tier.py [n_star]
"""
import os
import sys
import time

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import _synth  # noqa: E402
from recall_fixed_rv import _chunked_score  # noqa: E402


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

    # Key the score cache on the grid contents (model count + a cheap
    # coefficient checksum): a regenerated recall_grid.npz must not be
    # silently paired with stale cached scores.
    gkey = f"{mc.shape[0]}_{abs(int(float(mc.sum()) * 1e3)) % 10 ** 8:08d}"
    scores = {}
    for name, solve_rv in (("3x3", True), ("2x2", False)):
        cpath = os.path.join(_synth.workdir(),
                             f"twotier_score_{name}_{n_star}_{gkey}.npy")
        if os.path.exists(cpath):
            scores[name] = np.load(cpath)
            print(f"{name}: cached", flush=True)
            continue
        t0 = time.time()
        scores[name] = _chunked_score(mags, wt, plx, plxw, mc, cfg,
                                      solve_rv)
        np.save(cpath, scores[name])
        print(f"{name} scored in {time.time()-t0:.0f} s", flush=True)

    block = 256
    Mb = n_real // block
    bs3 = scores["3x3"][:, :Mb * block].reshape(n_star, Mb, block).max(-1)
    bs2 = scores["2x2"][:, :Mb * block].reshape(n_star, Mb, block).max(-1)
    order3 = np.argsort(-bs3, axis=1)
    order2 = np.argsort(-bs2, axis=1)

    def recall_of(block_idx):
        """block_idx: (n_star, nb) selected block indices."""
        idx = (block_idx[:, :, None] * block
               + np.arange(block)[None, None, :]).reshape(n_star, -1)
        rec = np.array([w[b, idx[b][idx[b] < n_real]].sum() / wsum[b]
                        for b in range(n_star)])
        hit = np.mean([cat["idx"][b] in idx[b] for b in range(n_star)])
        return rec, hit

    screen_ks = ([int(x) for x in sys.argv[2].split(",")]
                 if len(sys.argv) > 2 else [8192, 12288])
    for screen_k in screen_ks:
      nb2 = screen_k // block
      rec1, hit1 = recall_of(order3[:, :nb2])
      print(f"one-tier 3x3 k={screen_k}: min={rec1.min():.4f} "
            f"p10={np.percentile(rec1, 10):.4f} mean={rec1.mean():.4f} "
            f"hit={hit1:.3f}", flush=True)

      for K1 in (16384, 32768, 49152, 65536, 131072):
          nb1 = K1 // block
          # tier-1: top-nb1 blocks by the 2x2 score; tier-2: re-rank
          # those blocks by the exact 3x3 BLOCK score, keep nb2.
          sel1 = order2[:, :nb1]                         # (n_star, nb1)
          b3 = np.take_along_axis(bs3, sel1, axis=1)     # 3x3 scores there
          sub = np.argsort(-b3, axis=1)[:, :nb2]
          final = np.take_along_axis(sel1, sub, axis=1)
          rec, hit = recall_of(final)
          # how much of the one-tier selection does tier-1 cover?
          cover = np.mean([np.isin(order3[b, :nb2], sel1[b]).mean()
                           for b in range(n_star)])
          cols = (5.0 * n_real + 9.0 * K1) / (9.0 * n_real)
          M_PROD = 750_000        # production grid size
          cols_prod = (5.0 * M_PROD + 9.0 * K1) / (9.0 * M_PROD)
          print(f"two-tier K1={K1:6d}: min={rec.min():.4f} "
                f"p10={np.percentile(rec, 10):.4f} mean={rec.mean():.4f} "
                f"hit={hit:.3f} block-cover={cover:.4f} "
                f"cols={cols:.2f}x (test grid M={n_real}; "
                f"{cols_prod:.2f}x at M=750k)", flush=True)


if __name__ == "__main__":
    main()
