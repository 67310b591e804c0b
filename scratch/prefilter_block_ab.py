"""Accuracy cost of block-granular prefilter selection at the shipped
defaults (prefilter_k = n_sel_max = 2048, shortlist 12288).

`PosteriorConfig.prefilter_block=8` ranks 8-slot blocks by block-max
lnprob instead of single candidates — the pack gather then moves 8x
fewer (8x bigger) slices, attacking the 1.9 ms/batch slice-rate-bound
fusion of the round-5 device trace.  The shortlist is screen-block
ordered (contiguous grid-model runs of `screen_block`), so 8-blocks are
8 grid-adjacent models; this measures what that granularity costs in
log-evidence / posterior medians on the correlated SEDmaker grid,
CPU interpret mode, vs single-candidate selection.

Run:  python scratch/prefilter_block_ab.py [n_star]
"""
import os
import sys
import time

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import _synth  # noqa: E402


def main():
    n_star = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    from brutus_tpu.config import FitConfig, PosteriorConfig
    from brutus_tpu.ops.pallas_loglike import (prepare_screen,
                                               loglike_grid_screened)
    from brutus_tpu.ops.posterior import lnpost_batch

    d = np.load(os.path.join(_synth.workdir(), "recall_grid.npz"))
    mc = d["coeffs"]
    M = len(mc)
    cat = _synth.synth_catalog(mc, n_star=n_star, seed=11, snr=40.0)
    cfg = FitConfig()
    tile = 512
    st, packed, names, n_real, maskrow = prepare_screen(
        mc, aux=dict(lnprior=np.zeros(M, np.float32)), tile=tile)
    coord = jnp.asarray([204.7, -19.2], jnp.float32)

    outs = {}
    for blk in (1, 8):
        pcfg = PosteriorConfig(prefilter_block=blk)
        res_all = {k: [] for k in ("log_evidence", "dist", "red")}
        for lo in range(0, n_star, 16):
            sl = slice(lo, lo + 16)
            t0 = time.time()
            flux = jnp.asarray(cat["flux"][sl], jnp.float32)
            err = jnp.asarray(cat["err"][sl], jnp.float32)
            msk = jnp.asarray(cat["mask"][sl])
            plx = jnp.asarray(cat["parallax"][sl], jnp.float32)
            plxe = jnp.asarray(cat["parallax_err"][sl], jnp.float32)
            res = loglike_grid_screened(
                flux, err, msk, st, packed, maskrow, n_real,
                parallax=plx, parallax_err=plxe, cfg=cfg, tile=tile,
                screen_k=cfg.screen_k, aux_names=names)
            gidx = res.pop("global_idx")
            aux = res.pop("aux")
            keys = jax.random.split(jax.random.PRNGKey(lo + 7), 16)
            out = lnpost_batch(keys, res, aux["lnprior"], coord,
                               parallax=plx, parallax_err=plxe,
                               global_idx=gidx, cfg=pcfg)
            for k in res_all:
                res_all[k].append(np.asarray(out[k]))
            print(f"blk={blk} batch {lo}: {time.time()-t0:.0f} s",
                  flush=True)
        outs[blk] = {k: np.concatenate(v) for k, v in res_all.items()}

    a, b = outs[1], outs[8]
    dev = np.abs(a["log_evidence"] - b["log_evidence"])
    md_a = np.median(a["dist"], axis=1)
    md_b = np.median(b["dist"], axis=1)
    mr_a = np.median(a["red"], axis=1)
    mr_b = np.median(b["red"], axis=1)
    rd = np.abs(md_a - md_b) / md_a
    ra = np.abs(mr_a - mr_b)
    print(f"|d log_evid|: max={dev.max():.4f} "
          f"p90={np.percentile(dev, 90):.4f}")
    print(f"|d median dist|/d: max={rd.max():.4f} "
          f"p90={np.percentile(rd, 90):.4f}")
    print(f"|d median Av|: max={ra.max():.4f} "
          f"p90={np.percentile(ra, 90):.4f}")
    tr_a = np.abs(md_a - cat["dist"]) / cat["dist"]
    tr_b = np.abs(md_b - cat["dist"]) / cat["dist"]
    print(f"truth dist rel err p90: blk1={np.percentile(tr_a, 90):.4f} "
          f"blk8={np.percentile(tr_b, 90):.4f}")


if __name__ == "__main__":
    main()
