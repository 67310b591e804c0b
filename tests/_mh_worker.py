"""Worker for test_parallel::test_multihost_two_process_psum.

Joins a 2-process JAX distributed cluster over CPU, builds a global
('data', 'model') mesh spanning both processes via
`brutus_tpu.parallel`, and runs one GSPMD reduction over a
model-sharded global array.  Prints a line the parent asserts on.
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import brutus_tpu.parallel as bp  # noqa: E402


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    bp.initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()   # 2 per process
    mesh = bp.make_mesh(n_data=1, n_model=4)
    assert mesh.devices.size == 4

    # Global (8,) array sharded over 'model' across BOTH processes;
    # the jitted sum lowers to a cross-process psum.
    data = np.arange(8.0)
    sharding = NamedSharding(mesh, P("model"))
    x = jax.make_array_from_callback((8,), sharding,
                                     lambda idx: data[idx])
    tot = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
    print(f"MHOK pid={pid} procs={jax.process_count()} "
          f"total={float(tot):.1f}", flush=True)


if __name__ == "__main__":
    main()
