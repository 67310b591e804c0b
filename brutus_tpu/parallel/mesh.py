"""
Device-mesh construction and sharding layouts.

The reference has no distributed layer at all (SURVEY.md §2): its
scaling story was "run independent processes per sky pixel".  The
TPU-native replacement is a 2-D GSPMD mesh

    ('data', 'model')

where the star batch is sharded over the `data` axis and the
`(Nmodel, Nfilt, 3)` coefficient grid over the `model` axis.  All
per-star reductions over the grid (max log-likelihood, evidence
logsumexp, top-k model selection) are expressed as plain `jnp`
reductions, so XLA lowers them to `psum`-family collectives over ICI
automatically; nothing in the compute code is mesh-aware.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, local_device_ids=None):
    """Multi-host bring-up: join this process to the JAX distributed
    runtime so `jax.devices()` spans every host's chips.

    Thin, idempotent wrapper over `jax.distributed.initialize` — the
    TPU-native replacement for the communication backend the reference
    never had (SURVEY.md §2 checklist).  On Cloud TPU VMs all arguments
    are discovered from the metadata server, so a typical v5e-8 (or
    multi-host v5e-16+) launch is simply:

        # same command on every TPU VM worker, e.g. via
        #   gcloud compute tpus tpu-vm ssh $NAME --worker=all --command=...
        python -c "
        import brutus_tpu.parallel as bp
        bp.initialize()                       # no-op on a single host
        mesh = bp.make_mesh(n_data=<hosts>)   # spans ALL processes
        ... BruteForce(...).fit(..., mesh=mesh)
        "

    Sharding guidance: keep the 'model' axis inside a slice (its
    logsumexp/top-k collectives ride ICI) and put the embarrassingly
    parallel 'data' (star-batch) axis across hosts/slices, where DCN
    traffic is one batch of stars per step.
    """
    global _initialized
    if _initialized:
        return
    # NOTE: do NOT probe jax.process_count() here — it initializes the
    # XLA backend, after which jax.distributed.initialize refuses to
    # run.  The distributed client handle is a non-initializing check
    # for an externally bootstrapped cluster.
    try:
        from jax._src import distributed as _dist
        if getattr(_dist.global_state, "client", None) is not None:
            _initialized = True
            return
    except ImportError:
        pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
            local_device_ids=local_device_ids)
        _initialized = True
    except (ValueError, RuntimeError) as err:
        # Single-process environments (no coordinator discoverable) are
        # not an error: the mesh simply spans the local devices.
        if num_processes not in (None, 1):
            raise
        import warnings
        warnings.warn(f"jax.distributed.initialize unavailable "
                      f"({err}); continuing single-process")


def make_mesh(n_data=None, n_model=None, devices=None):
    """Build a `('data', 'model')` mesh over the available devices.

    With no arguments, uses all devices — across every participating
    process after `initialize()` — with data-parallel degree 1 (the
    model grid is the long axis worth sharding first — it is ~50x
    larger than any practical star batch).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_data is None and n_model is None:
        n_data, n_model = 1, n
    elif n_data is None:
        n_data = n // n_model
    elif n_model is None:
        n_model = n // n_data
    if n_data * n_model != n:
        raise ValueError(f"mesh {n_data}x{n_model} != {n} devices")
    dev_grid = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_grid, axis_names=("data", "model"))


def model_sharding(mesh):
    """Sharding for grid-axis-leading arrays: `(M, ...)` split on 'model'."""
    return NamedSharding(mesh, P("model"))


def data_sharding(mesh):
    """Sharding for star-batch-leading arrays: `(B, ...)` split on 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def pad_to_multiple(x, multiple, axis=0, fill=None):
    """Pad `x` along `axis` to a multiple of `multiple`.

    Grid padding uses unreachable magnitudes (very faint models) so the
    padded rows can never win the likelihood race; star padding repeats
    rows, which are discarded on write-out.
    """
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, rem)
    if fill is None:
        out = np.pad(x, pad_width, mode="edge")
    else:
        out = np.pad(x, pad_width, mode="constant", constant_values=fill)
    return out, n


def shard_grid(mesh, mag_coeffs, *label_arrays):
    """Device-put the model grid (and per-model label arrays) sharded over
    the 'model' axis, padding to the shard count.

    Padded models get +60 mag in every band (flux ~ 1e-24), so their
    likelihood is ~-inf and they are culled by every threshold.

    Returns `(mag_coeffs_sharded, labels_sharded_tuple, n_real_models)`.
    """
    n_model_shards = mesh.shape["model"]
    mc = np.asarray(mag_coeffs)
    n = mc.shape[0]
    rem = (-n) % n_model_shards
    if rem:
        pad = np.repeat(mc[-1:], rem, axis=0).copy()
        pad[..., 0] += 60.0   # unreachably faint
        mc = np.concatenate([mc, pad], axis=0)
    mc_dev = jax.device_put(mc, model_sharding(mesh))
    labels_dev = []
    for arr in label_arrays:
        if arr is None:
            labels_dev.append(None)
            continue
        a = np.asarray(arr)
        if rem:
            a = np.concatenate([a, np.repeat(a[-1:], rem, axis=0)])
        labels_dev.append(jax.device_put(a, model_sharding(mesh)))
    return mc_dev, tuple(labels_dev), n


__all__ = ["initialize", "make_mesh", "model_sharding", "data_sharding",
           "replicated", "shard_grid", "pad_to_multiple"]
