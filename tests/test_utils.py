"""Golden-value tests for brutus_tpu.utils against scipy/numpy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import stats

from brutus_tpu import utils


rng = np.random.default_rng(7)


def test_magnitude_roundtrip():
    phot = rng.uniform(1e-8, 1e-3, size=(5, 9))
    err = phot * 0.05
    mag, magerr = utils.magnitude(phot, err)
    phot2, err2 = utils.inv_magnitude(mag, magerr)
    np.testing.assert_allclose(phot2, phot, rtol=1e-12)
    np.testing.assert_allclose(err2, err, rtol=1e-12)


def test_luptitude_roundtrip():
    phot = rng.uniform(1e-8, 1e-3, size=(5, 9))
    err = phot * 0.05
    sky = 1e-6
    mag, magerr = utils.luptitude(phot, err, skynoise=sky)
    phot2, err2 = utils.inv_luptitude(mag, magerr, skynoise=sky)
    np.testing.assert_allclose(phot2, phot, rtol=1e-10)
    np.testing.assert_allclose(err2, err, rtol=1e-10)


def test_add_mag():
    m1, m2 = 5.0, 6.0
    f1, f2 = 10 ** (-0.4 * m1), 10 ** (-0.4 * m2)
    expect = -2.5 * np.log10(f1 + f2)
    np.testing.assert_allclose(utils.add_mag(m1, m2), expect, rtol=1e-12)


def test_inverse3_matches_numpy():
    A = rng.normal(size=(20, 3, 3))
    A = A @ np.swapaxes(A, -1, -2) + 3 * np.eye(3)  # well-conditioned SPD
    inv = np.asarray(utils.inverse3(jnp.asarray(A)))
    np.testing.assert_allclose(inv, np.linalg.inv(A), rtol=1e-9, atol=1e-12)


def test_is_psd3():
    A = rng.normal(size=(50, 3, 3))
    spd = A @ np.swapaxes(A, -1, -2) + 1e-3 * np.eye(3)
    bad = spd.copy()
    bad[::2] -= 10.0 * np.eye(3)
    got = np.asarray(utils.is_psd3(jnp.asarray(bad)))
    expect = np.array([np.all(np.linalg.eigvalsh(m) > 0) for m in bad])
    np.testing.assert_array_equal(got, expect)


def test_chi2_logpdf():
    x = rng.uniform(0.01, 50.0, size=100)
    for df in [1.0, 4.5, 6, 20]:
        got = np.asarray(utils.chi2_logpdf(x, df))
        np.testing.assert_allclose(got, stats.chi2.logpdf(x, df),
                                   rtol=1e-10, atol=1e-12)
    # non-positive -> -inf
    assert np.isneginf(float(utils.chi2_logpdf(-1.0, 5.0)))


def test_truncnorm_logpdf():
    a, b, loc, scale = -1.5, 2.0, 0.3, 1.7
    x = rng.uniform(-3, 4, size=200)
    got = np.asarray(utils.truncnorm_logpdf(x, a, b, loc=loc, scale=scale))
    expect = stats.truncnorm.logpdf(x, a, b, loc=loc, scale=scale)
    np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-12)
    gotp = np.asarray(utils.truncnorm_pdf(x, a, b, loc=loc, scale=scale))
    np.testing.assert_allclose(gotp, stats.truncnorm.pdf(x, a, b, loc=loc,
                                                         scale=scale),
                               rtol=1e-9, atol=1e-12)


def test_quantile_weighted():
    x = rng.normal(size=1000)
    q = np.array([0.1, 0.5, 0.9])
    w = np.ones_like(x)
    got = np.asarray(utils.quantile(x, q, weights=w))
    # Equal weights should approximate the unweighted quantiles.
    expect = np.percentile(x, 100 * q)
    np.testing.assert_allclose(got, expect, atol=2e-2)


def test_sample_multivariate_normal_moments():
    N, d, S = 4, 3, 40000
    mean = rng.normal(size=(N, d))
    A = rng.normal(size=(N, d, d)) * 0.3
    cov = A @ np.swapaxes(A, -1, -2) + 0.2 * np.eye(d)
    key = jax.random.PRNGKey(0)
    samps = np.asarray(utils.sample_multivariate_normal(
        key, jnp.asarray(mean), jnp.asarray(cov), size=S))
    assert samps.shape == (d, S, N)
    for i in range(N):
        got_mean = samps[:, :, i].mean(axis=1)
        got_cov = np.cov(samps[:, :, i])
        np.testing.assert_allclose(got_mean, mean[i], atol=0.05)
        np.testing.assert_allclose(got_cov, cov[i], atol=0.08)


def test_draw_sar_bounds():
    N = 8
    scales = np.abs(rng.normal(1.0, 0.1, N))
    avs = rng.uniform(0.5, 1.5, N)
    rvs = rng.uniform(2.5, 4.0, N)
    cov = np.tile(np.diag([0.05, 0.3, 0.5]) ** 2, (N, 1, 1))
    key = jax.random.PRNGKey(1)
    s, a, r = utils.draw_sar(key, jnp.asarray(scales), jnp.asarray(avs),
                             jnp.asarray(rvs), jnp.asarray(cov), ndraws=256,
                             avlim=(0.0, 2.0), rvlim=(1.0, 5.0))
    s, a, r = np.asarray(s), np.asarray(a), np.asarray(r)
    assert s.shape == (N, 256)
    assert (s >= 0).all()
    assert (a >= 0).all() and (a <= 2.0).all()
    assert (r >= 1.0).all() and (r <= 5.0).all()
    # Means should be close to the (untruncated) centers.
    np.testing.assert_allclose(a.mean(axis=1), avs, atol=0.15)


def test_phot_loglike_matches_manual():
    nfilt, nmodel = 9, 12
    data = rng.uniform(1e-7, 1e-5, nfilt)
    err = data * 0.05
    mask = np.ones(nfilt, bool)
    mask[3] = False
    models = rng.uniform(1e-7, 1e-5, size=(nmodel, nfilt))
    got = np.asarray(utils.phot_loglike(jnp.asarray(data), jnp.asarray(err),
                                        jnp.asarray(mask),
                                        jnp.asarray(models),
                                        dim_prior=False))
    m = mask
    chi2 = np.sum((data[m] - models[:, m]) ** 2 / err[m] ** 2, axis=1)
    expect = -0.5 * (chi2 + m.sum() * np.log(2 * np.pi)
                     + np.sum(np.log(err[m] ** 2)))
    np.testing.assert_allclose(got, expect, rtol=1e-10)


def test_parts_toolkit_matches_matrix_forms():
    """The parts-based symmetric-3x3 toolkit (shared by the posterior's
    XLA path and the fused MC kernel) must reproduce the stacked-matrix
    functions it mirrors."""
    rng = np.random.default_rng(9)
    n = 64
    A = rng.normal(size=(n, 3, 3))
    A = A @ np.swapaxes(A, 1, 2) + np.eye(3) * 0.1   # SPD
    # Mix in some ill-scaled + indefinite cases.
    A[:16] *= np.array([1e8, 1.0, 1e-4])[None, :, None] \
        * np.array([1e8, 1.0, 1e-4])[None, None, :]
    A[16:24, 0, 1] = A[16:24, 1, 0] = \
        2.0 * np.sqrt(A[16:24, 0, 0] * A[16:24, 1, 1])
    Aj = jnp.asarray(A)
    p = (Aj[:, 0, 0], Aj[:, 1, 1], Aj[:, 2, 2],
         Aj[:, 0, 1], Aj[:, 0, 2], Aj[:, 1, 2])

    inv_m = np.asarray(utils.inverse3_stable(Aj))
    inv_p = np.asarray(utils.sym3_from_parts(utils.inverse3_sym_parts(p)))
    np.testing.assert_allclose(inv_p, inv_m, rtol=1e-12, atol=1e-12)

    psd_m = np.asarray(utils.is_psd3(Aj))
    psd_p = np.asarray(utils.is_psd3_parts(p))
    np.testing.assert_array_equal(psd_p, psd_m)

    spd = np.flatnonzero(psd_m)
    L_m = np.asarray(utils.cholesky3_stable(Aj[spd]))
    lp = utils.cholesky3_parts(tuple(x[spd] for x in p))
    np.testing.assert_allclose(np.asarray(lp[0]), L_m[:, 0, 0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(lp[1]), L_m[:, 1, 0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(lp[2]), L_m[:, 1, 1], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(lp[3]), L_m[:, 2, 0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(lp[4]), L_m[:, 2, 1], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(lp[5]), L_m[:, 2, 2], rtol=1e-12)

    # Repair: every output is PSD (incl. the indefinite inputs), and
    # already-PSD inputs round-trip to their true inverse.
    scale = jnp.ones(n)
    valid = jnp.ones(n, bool)
    cov_p = utils.psd_repair_parts(p, scale, valid, 0.02, 8)
    cov = np.asarray(utils.sym3_from_parts(cov_p))
    assert (np.linalg.eigvalsh(cov) > 0).all()
    np.testing.assert_allclose(cov[spd], np.linalg.inv(A[spd]),
                               rtol=1e-6, atol=1e-9)
