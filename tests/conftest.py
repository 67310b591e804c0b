"""Test configuration: force a virtual 8-device CPU mesh and float64.

The container preloads jax and an 'axon' TPU PJRT plugin via
sitecustomize, so `JAX_PLATFORMS` from the environment is not enough;
we override through `jax.config` before the backend initializes (it is
lazy — conftest runs before any computation).
"""

import os

# BRUTUS_TPU_HW=1 runs the suite against the REAL TPU backend instead
# of the virtual CPU mesh — for the hardware-gated multi-chip tests
# (test_parallel.py::test_real_tpu_multichip_funnel).  Do NOT set the
# host-platform device-count flag there (it hangs the axon client).
_REAL_HW = os.environ.get("BRUTUS_TPU_HW", "") not in ("", "0")

if not _REAL_HW:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _REAL_HW:
    jax.config.update("jax_platforms", "cpu")

# Oracle-parity tests validate math against float64 numpy; device code is
# dtype-polymorphic so float32 paths are exercised explicitly where needed.
# (TPUs have no f64 — the hardware-gated runs keep the f32 default.)
if not _REAL_HW:
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the interpret-mode Pallas tests spend
# most of their wall time in XLA compiles that are identical run to
# run; cached executables make repeat suite runs several times faster.
try:
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass
