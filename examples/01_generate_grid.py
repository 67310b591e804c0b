"""Generate an SED model grid (analog of demo 'Overview 2').

Builds the MIST-track + BC-network stack from (synthetic) data files,
generates a coefficient grid over (mini, eep, feh, afe), and writes it
in the schema `brutus_tpu.io.load_models` reads.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import time

import numpy as np

from _synth import FILTERS, make_data_files
from brutus_tpu.models import SEDmaker

paths = make_data_files()
mk = SEDmaker(filters=FILTERS, nnfile=paths["nn"],
              mistfile=paths["tracks"], verbose=False)

t0 = time.time()
mk.make_grid(mini_grid=np.arange(0.55, 1.95, 0.02),
             eep_grid=np.arange(210.0, 600.0, 4.0),
             feh_grid=np.arange(-0.9, 0.45, 0.05),
             afe_grid=np.array([0.0]),
             smf_grid=np.array([0.0]), verbose=True)
dt = time.time() - t0
n = len(mk.grid_label)
print(f"\ngenerated {n} models in {dt:.1f} s "
      f"({1e3 * dt / n:.3f} ms/model; reference: 18.459 ms/model)")
print(f"valid fraction: {mk.grid_sel.mean():.2f}")

mk.to_hdf5(paths["grid"])
print(f"grid written to {paths['grid']}")
