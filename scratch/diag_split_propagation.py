"""Decisive test: does XLA-TPU's bf16 propagation zero the m/l split
blocks produced inside the jitted _screen_star_mats?

Run on TPU: python scratch/diag_split_propagation.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
import numpy as np
import jax
import jax.numpy as jnp
import _synth

from brutus_tpu.config import FitConfig
from brutus_tpu.ops.optimize import prepare_star_data
from brutus_tpu.ops.pallas_loglike import (_screen_star_mats,
                                           _screen_parallax, _split3)

d = np.load(os.path.join(_synth.workdir(), "recall_grid.npz"))
cat = _synth.synth_catalog(d["coeffs"], n_star=16, seed=11, snr=40.0)
cfg = FitConfig()
prep = prepare_star_data(jnp.asarray(cat["flux"], jnp.float32),
                         jnp.asarray(cat["err"], jnp.float32),
                         jnp.asarray(cat["mask"]), cfg)
mags, wt = prep[2], prep[3]
plx, plxw = _screen_parallax(jnp.asarray(cat["parallax"]),
                             jnp.asarray(cat["parallax_err"]))
F = mags.shape[1]
n_g = -(-F // 8)
wb, cb, srow = _screen_star_mats(mags, wt, plx[:, None], plxw[:, None],
                                 0, n_g * 8)
wb = np.asarray(wb).astype(np.float32)   # (n_g, B, 48)
# blocks: [h h h m m l] along last axis in groups of 8
h = wb[..., 0:8]; m = wb[..., 24:32]; l = wb[..., 40:48]
print("jitted _screen_star_mats on", jax.devices()[0].platform)
print("  |h| max", np.abs(h).max(), " |m| max", np.abs(m).max(),
      " |l| max", np.abs(l).max())

# same split eagerly
wt_np = np.asarray(wt, np.float32)
he, me, le = _split3(jnp.asarray(wt_np))
print("eager split:  |m| max", np.abs(np.asarray(me, np.float32)).max(),
      " |l| max", np.abs(np.asarray(le, np.float32)).max())
