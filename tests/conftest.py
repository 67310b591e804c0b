"""Test configuration: force a virtual 8-device CPU mesh and float64.

The container preloads jax and an 'axon' TPU PJRT plugin via
sitecustomize, so `JAX_PLATFORMS` from the environment is not enough;
we override through `jax.config` before the backend initializes (it is
lazy — conftest runs before any computation).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Oracle-parity tests validate math against float64 numpy; device code is
# dtype-polymorphic so float32 paths are exercised explicitly where needed.
jax.config.update("jax_enable_x64", True)
