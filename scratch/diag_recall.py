"""Why is the dense likelihood flat on the SEDmaker synthetic grid?"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
import jax
jax.config.update('jax_platforms', 'cpu')

import numpy as np
import jax.numpy as jnp
import _synth
from brutus_tpu.models.sedmaker import SEDmaker
from brutus_tpu.config import FitConfig
from brutus_tpu.ops.optimize import loglike_grid

paths = _synth.make_data_files()
mk = SEDmaker(filters=_synth.FILTERS, nnfile=paths["nn"],
              mistfile=paths["tracks"], verbose=False)
mini = np.linspace(0.5, 2.0, 40)
eep = np.arange(202.0, 601.0, 8.0)
feh = np.linspace(-1.0, 0.5, 5)
mk.make_grid(mini_grid=mini, eep_grid=eep, feh_grid=feh,
             smf_grid=[0.0], verbose=False)
mc = np.stack([mk.grid_sed[n] for n in mk.filters], axis=1)
ok = np.isfinite(mc).all(axis=(1, 2))
mc = mc[ok]
print("models:", len(mc))
print("mag0 spread per band:", np.round(mc[:, :, 0].std(axis=0), 3))
col = mc[:, :, 0] - mc[:, :, 0].mean(axis=1, keepdims=True)
print("color spread:", np.round(col.std(axis=0), 3))
print("r0 range:", np.round([mc[:, :, 1].min(), mc[:, :, 1].max()], 3))

cat = _synth.synth_catalog(mc, n_star=8, seed=11, snr=40.0)
cfg = FitConfig()
res = jax.vmap(lambda f, e, m: loglike_grid(
    f.astype(jnp.float32), e.astype(jnp.float32), m,
    jnp.asarray(mc, jnp.float32), cfg=cfg))(
    jnp.asarray(cat["flux"]), jnp.asarray(cat["err"]),
    jnp.asarray(cat["mask"]))
lnl = np.asarray(res["lnlike"], np.float64)
chi2 = np.asarray(res["chi2"], np.float64)
for b in range(8):
    n_close = (lnl[b] > lnl[b].max() - 7).sum()
    print(f"star {b}: argmax={lnl[b].argmax()} true={cat['idx'][b]} "
          f"lnlmax={lnl[b].max():.2f} med={np.median(lnl[b]):.2f} "
          f"chi2min={chi2[b].min():.2f} chi2med={np.median(chi2[b]):.1f} "
          f"n_within7={n_close}")
