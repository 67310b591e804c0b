"""Sharding tests: 8-device virtual CPU mesh vs single-device parity."""

import os

import numpy as np
import jax
import pytest

from brutus_tpu.fitting import BruteForce
from brutus_tpu.parallel import make_mesh, shard_grid, model_sharding

from test_fitting import MC, LABELS, LMASK, make_star, COORD, NFILT


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(5)
    n_star = 4
    data = np.zeros((n_star, NFILT))
    errs = np.zeros((n_star, NFILT))
    for i in range(n_star):
        data[i], errs[i] = make_star(MC, 20 + 7 * i, 0.4, 3.3, 1.1)
    mask = np.ones((n_star, NFILT), bool)
    coords = np.tile(COORD, (n_star, 1))
    return data, errs, mask, coords


def _run(problem, mesh):
    data, errs, mask, coords = problem
    bf = BruteForce(MC, LABELS, LMASK)
    return bf.fit(data, errs, mask, data_coords=coords,
                  parallax=np.full(len(data), 1.0),
                  parallax_err=np.full(len(data), 0.05),
                  Nmc_prior=16, Ndraws=32, batch_size=4, n_sel_max=64,
                  verbose=False, return_results=True, mesh=mesh)


def test_initialize_single_process():
    """initialize() is an idempotent no-op in single-process settings
    and make_mesh afterwards spans all local devices."""
    from brutus_tpu.parallel import initialize
    initialize()
    initialize()   # idempotent
    assert jax.process_count() == 1
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())


def test_mesh_construction():
    mesh = make_mesh(n_data=2, n_model=4)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    mesh = make_mesh()
    assert dict(mesh.shape) == {"data": 1, "model": 8}


def test_shard_grid_padding():
    mesh = make_mesh(n_data=1, n_model=8)
    mc = np.asarray(MC[:250])  # 250 % 8 != 0
    dev, (lab,), n = shard_grid(mesh, mc, np.arange(250.0))
    assert n == 250
    assert dev.shape[0] == 256
    assert lab.shape[0] == 256
    # Padded rows are unreachably faint.
    assert np.asarray(dev)[250:, :, 0].min() > np.asarray(dev)[:250, :, 0].max()


@pytest.mark.slow
def test_sharded_matches_single_device(problem):
    out1 = _run(problem, mesh=None)
    mesh = make_mesh(n_data=2, n_model=4)
    out8 = _run(problem, mesh)
    # Same PRNG keys + same math -> identical draws up to float assoc.
    np.testing.assert_allclose(out8["log_evidence"], out1["log_evidence"],
                               rtol=1e-6)
    np.testing.assert_allclose(out8["chi2min"], out1["chi2min"], rtol=1e-6)
    assert (out8["model_idx"] == out1["model_idx"]).mean() > 0.95
    np.testing.assert_allclose(np.median(out8["dist"], axis=1),
                               np.median(out1["dist"], axis=1), rtol=0.05)


@pytest.mark.slow
def test_model_only_mesh(problem):
    mesh = make_mesh(n_data=1, n_model=8)
    out = _run(problem, mesh)
    assert np.isfinite(out["log_evidence"]).all()


@pytest.mark.slow
def test_graft_entry_dryrun():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 4096)
    mod.dryrun_multichip(8)


@pytest.mark.slow
def test_fused_engine_data_mesh(problem):
    """Fused engine: star-batch data parallelism over a 2-device mesh
    (per-device grid replicas, eager per-device kernel dispatch) matches
    the single-device fused run."""
    data, errs, mask, coords = problem
    bf = BruteForce(MC, LABELS, LMASK)
    kw = dict(data_coords=coords,
              parallax=np.full(len(data), 1.0),
              parallax_err=np.full(len(data), 0.05),
              Nmc_prior=16, Ndraws=32, batch_size=4, n_sel_max=64,
              verbose=False, return_results=True, engine="fused", tile=64)
    out1 = bf.fit(data, errs, mask, **kw)
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    out2 = bf.fit(data, errs, mask, mesh=mesh, **kw)
    np.testing.assert_allclose(out2["log_evidence"], out1["log_evidence"],
                               rtol=1e-6)
    np.testing.assert_allclose(out2["chi2min"], out1["chi2min"], rtol=1e-6)
    assert (out2["model_idx"] == out1["model_idx"]).mean() > 0.95


@pytest.mark.slow
def test_screened_engine_data_mesh(problem):
    """Funnel engine (screen_k < M): star-batch data parallelism over
    a 2-device mesh with per-device screen tables matches the
    single-device funnel run."""
    data, errs, mask, coords = problem
    bf = BruteForce(MC, LABELS, LMASK)
    kw = dict(data_coords=coords,
              parallax=np.full(len(data), 1.0),
              parallax_err=np.full(len(data), 0.05),
              Nmc_prior=16, Ndraws=32, batch_size=4, n_sel_max=32,
              verbose=False, return_results=True, engine="fused",
              tile=64, screen_k=128)
    assert bf.NMODEL > 128          # the funnel actually engages
    out1 = bf.fit(data, errs, mask, **kw)
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    out2 = bf.fit(data, errs, mask, mesh=mesh, **kw)
    np.testing.assert_allclose(out2["log_evidence"], out1["log_evidence"],
                               rtol=1e-6)
    assert (out2["model_idx"] == out1["model_idx"]).mean() > 0.95


@pytest.mark.slow
def test_screened_engine_model_mesh(problem):
    """Model-sharded funnel: grid tables sharded over a ('data'=2,
    'model'=4) mesh, shortlist merged across shards with
    all_gather/psum collectives — must match the single-device funnel
    to float association error (the shortlist SET is identical; only
    reduction order differs)."""
    data, errs, mask, coords = problem
    bf = BruteForce(MC, LABELS, LMASK)
    kw = dict(data_coords=coords,
              parallax=np.full(len(data), 1.0),
              parallax_err=np.full(len(data), 0.05),
              Nmc_prior=16, Ndraws=32, batch_size=4, n_sel_max=32,
              verbose=False, return_results=True, engine="fused",
              tile=64, screen_k=128)
    out1 = bf.fit(data, errs, mask, **kw)
    mesh = make_mesh(n_data=2, n_model=4)
    out8 = bf.fit(data, errs, mask, mesh=mesh, **kw)
    np.testing.assert_allclose(out8["log_evidence"], out1["log_evidence"],
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(out8["chi2min"], out1["chi2min"],
                               rtol=1e-6)
    assert (out8["model_idx"] == out1["model_idx"]).mean() > 0.95
    # Draw fields land on real grid-global models.
    assert (out8["model_idx"] >= 0).all()
    assert (out8["model_idx"] < bf.NMODEL).all()


def _real_tpus():
    try:
        return [d for d in jax.devices() if d.platform == "tpu"]
    except Exception:
        return []


@pytest.mark.skipif(len(_real_tpus()) < 2,
                    reason="requires >= 2 REAL TPU chips (run with "
                           "BRUTUS_TPU_HW=1 on multi-chip hardware; "
                           "this environment exposes at most one chip "
                           "behind a tunnel — see README risk note)")
def test_real_tpu_multichip_funnel(problem):
    """RISK-REGISTER test (round-4 VERDICT): Mosaic kernels +
    `shard_map` have only ever lowered together in interpret mode on
    virtual CPU devices; this runs the sharded Pallas funnel on a REAL
    multi-chip TPU mesh.  Skips cleanly anywhere without >= 2 chips —
    the day hardware exists, the multi-chip claim is one
    `BRUTUS_TPU_HW=1 python -m pytest
    tests/test_parallel.py::test_real_tpu_multichip_funnel` away."""
    data, errs, mask, coords = problem
    devs = _real_tpus()
    n_model = 2 ** int(np.log2(len(devs)))
    bf = BruteForce(MC, LABELS, LMASK)
    kw = dict(data_coords=coords,
              parallax=np.full(len(data), 1.0),
              parallax_err=np.full(len(data), 0.05),
              Nmc_prior=16, Ndraws=32, batch_size=4, n_sel_max=32,
              verbose=False, return_results=True, engine="fused",
              tile=64, screen_k=128)
    out1 = bf.fit(data, errs, mask, **kw)                 # one chip
    mesh = make_mesh(n_data=1, n_model=n_model,
                     devices=devs[:n_model])
    outn = bf.fit(data, errs, mask, mesh=mesh, **kw)      # sharded
    np.testing.assert_allclose(outn["log_evidence"],
                               out1["log_evidence"],
                               rtol=1e-5, atol=1e-4)
    assert (outn["model_idx"] == out1["model_idx"]).mean() > 0.9


def test_fused_engine_rejects_dense_model_mesh(problem):
    """Dense fused (screen off) still refuses model>1 meshes — the
    dense kernel replicates the grid; only the funnel shards it."""
    data, errs, mask, coords = problem
    bf = BruteForce(MC, LABELS, LMASK)
    mesh = make_mesh(n_data=1, n_model=2, devices=jax.devices()[:2])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="funnel"):
        bf.fit(data, errs, mask, data_coords=coords, mesh=mesh,
               engine="fused", screen_k=0, verbose=False,
               return_results=True)


@pytest.mark.slow
def test_sharded_ext_prior_with_padding(problem):
    """lnprior_ext must be padded along with the sharded model grid."""
    data, errs, mask, coords = problem
    mc = MC[:250]           # 250 % 4 != 0 -> shard padding
    labels = LABELS[:250]
    import jax
    mesh = make_mesh(n_data=1, n_model=4, devices=jax.devices()[:4])
    bf = BruteForce(mc, labels, LMASK)
    ext = {"feh": np.tile([[-0.5, 0.3]], (len(data), 1))}
    out = bf.fit(data, errs, mask, data_coords=coords,
                 lnprior_ext=ext, Nmc_prior=8, Ndraws=16, batch_size=4,
                 n_sel_max=32, verbose=False, return_results=True,
                 mesh=mesh)
    assert np.isfinite(out["log_evidence"]).all()
    assert (out["model_idx"] < 250).all()


@pytest.mark.slow
def test_multihost_two_process_psum():
    """Real multi-process bring-up: two OS processes join a JAX
    distributed cluster through `parallel.initialize()` (coordinator
    on localhost), build ONE global ('data','model') mesh spanning
    both, and execute a cross-process GSPMD reduction.  Backs the
    v5e-16 launch recipe in `parallel/mesh.py` with a passing test —
    the in-process tests only ever exercise the single-process
    degraded branch."""
    import socket
    import subprocess
    import sys as _sys
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "_mh_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    # The container's sitecustomize registers a TPU PJRT plugin at
    # interpreter start, which initializes the XLA backend BEFORE the
    # worker can call jax.distributed.initialize.  Clearing its gate
    # env var gives the workers a clean CPU-only interpreter.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [_sys.executable, worker, str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MHOK pid={i} procs=2 total=28.0" in out, out


@pytest.mark.slow
def test_screened_engine_model_mesh_wide_filters():
    """Model-sharded funnel x 49-band grid: the sharded screen tables
    carry n_g = 7 contraction groups and the per-tile column-concat
    layout must split cleanly across the 'model' axis."""
    rng = np.random.default_rng(31)
    M, F, n_star = 1024, 49, 4
    mc = np.stack([rng.uniform(8.0, 16.0, (M, F)),
                   rng.uniform(0.4, 1.1, (M, F)),
                   rng.uniform(0.05, 0.2, (M, F))],
                  axis=-1).astype(np.float32)
    idx = rng.integers(0, M, n_star)
    av = rng.uniform(0.2, 1.0, n_star)
    dist = rng.uniform(0.7, 1.5, n_star)
    sed = (mc[idx, :, 0] + av[:, None] * (mc[idx, :, 1]
                                          + 3.3 * mc[idx, :, 2]))
    flux = 10 ** (-0.4 * sed) / dist[:, None] ** 2
    errs = flux / 60.0
    flux = flux + rng.normal(size=flux.shape) * errs
    ltype = np.dtype([("mini", float), ("feh", float), ("loga", float)])
    labels = np.zeros(M, dtype=ltype)
    labels["mini"] = rng.uniform(0.5, 2.0, M)
    labels["feh"] = rng.uniform(-1.0, 0.3, M)
    labels["loga"] = rng.uniform(8.0, 10.1, M)
    bf = BruteForce(mc, labels)
    kw = dict(data_coords=np.tile([204.7, -19.2], (n_star, 1)),
              parallax=1.0 / dist, parallax_err=0.02 / dist,
              Nmc_prior=8, Ndraws=16, batch_size=4, n_sel_max=32,
              verbose=False, return_results=True, engine="fused",
              tile=64, screen_k=128)
    out1 = bf.fit(flux, errs, np.ones((n_star, F), bool), **kw)
    mesh = make_mesh(n_data=2, n_model=4)
    out8 = bf.fit(flux, errs, np.ones((n_star, F), bool), mesh=mesh,
                  **kw)
    np.testing.assert_allclose(out8["log_evidence"],
                               out1["log_evidence"], rtol=1e-6,
                               atol=1e-5)
    assert (out8["model_idx"] == out1["model_idx"]).mean() > 0.95
