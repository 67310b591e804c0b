"""
Core numerical utilities (JAX).

TPU-first re-implementations of the foundation layer of the reference
(`brutus/utils.py`): photometric transforms, batched 3x3 linear algebra,
hand-rolled statistical pdfs, weighted quantiles, and batched
multivariate-normal sampling.  All functions are pure, jit-safe, and
operate on arbitrary leading batch dimensions.
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, erf

LN10 = jnp.log(10.0)


class function_wrapper:
    """Pickleable closure: binds args/kwargs to a function so it can
    cross process boundaries (multiprocessing pools, dynesty workers).

    Parity: reference `brutus/utils.py:43-68` (`_function_wrapper`, the
    emcee-style aid); errors are re-raised with the offending inputs
    printed for debuggability.
    """

    def __init__(self, func, args=None, kwargs=None, name="input"):
        self.func = func
        self.args = args or []
        self.kwargs = kwargs or {}
        self.name = name

    def __call__(self, x):
        try:
            return self.func(x, *self.args, **self.kwargs)
        except Exception:
            import traceback
            print(f"Exception while calling {self.name} function:")
            print("  params:", x)
            print("  args:", self.args)
            print("  kwargs:", self.kwargs)
            traceback.print_exc()
            raise


# ---------------------------------------------------------------------------
# Photometric transforms (parity: reference brutus/utils.py:908-1086)
# ---------------------------------------------------------------------------

def magnitude(phot, err, zeropoints=1.0):
    """Convert flux densities (+errors) to AB magnitudes.

    Parity: reference `brutus/utils.py:908-940`.
    """
    phot = jnp.asarray(phot)
    mag = -2.5 * jnp.log10(phot / zeropoints)
    mag_err = 2.5 / LN10 * err / phot
    return mag, mag_err


def inv_magnitude(mag, err, zeropoints=1.0):
    """Convert AB magnitudes (+errors) to flux densities.

    Parity: reference `brutus/utils.py:943-975`.
    """
    phot = 10 ** (-0.4 * jnp.asarray(mag)) * zeropoints
    phot_err = err * 0.4 * LN10 * phot
    return phot, phot_err


def luptitude(phot, err, skynoise=1.0, zeropoints=1.0):
    """Convert fluxes to asinh magnitudes ("Luptitudes", Lupton et al. 1999).

    Parity: reference `brutus/utils.py:978-1017`.
    """
    phot = jnp.asarray(phot)
    mag = -2.5 / LN10 * (jnp.arcsinh(phot / (2.0 * skynoise)) +
                         jnp.log(skynoise / zeropoints))
    mag_err = jnp.sqrt(jnp.square(2.5 * jnp.log10(jnp.e) * err) /
                       (jnp.square(2.0 * skynoise) + jnp.square(phot)))
    return mag, mag_err


def inv_luptitude(mag, err, skynoise=1.0, zeropoints=1.0):
    """Convert asinh magnitudes back to fluxes.

    Parity: reference `brutus/utils.py:1020-1058`.
    """
    mag = jnp.asarray(mag)
    phot = (2.0 * skynoise) * jnp.sinh(LN10 / -2.5 * mag -
                                       jnp.log(skynoise / zeropoints))
    phot_err = jnp.sqrt((jnp.square(2.0 * skynoise) + jnp.square(phot)) *
                        jnp.square(err)) / (2.5 * jnp.log10(jnp.e))
    return phot, phot_err


def add_mag(mag1, mag2, f1=1.0, f2=1.0):
    """Combined magnitude of two components with fractional weights.

    Parity: reference `brutus/utils.py:1061-1086`.
    """
    flux1 = 10 ** (-0.4 * jnp.asarray(mag1))
    flux2 = 10 ** (-0.4 * jnp.asarray(mag2))
    return -2.5 * jnp.log10(f1 * flux1 + f2 * flux2)


# ---------------------------------------------------------------------------
# Batched 3x3 linear algebra (parity: reference brutus/utils.py:71-127)
# ---------------------------------------------------------------------------

def adjoint3(A):
    """Adjugate (transposed cofactor matrix) of stacked 3x3 matrices.

    Row i of the result is the cross product of rows i-2 and i-1, exactly
    as in reference `brutus/utils.py:71-83` (division-free inverse).
    """
    rows = [jnp.cross(A[..., i - 2, :], A[..., i - 1, :]) for i in range(3)]
    return jnp.stack(rows, axis=-2)


def inverse_transpose3(A):
    """Inverse-transpose of stacked 3x3 matrices via adjugates.

    Parity: reference `brutus/utils.py:96-105`.
    """
    Id = adjoint3(A)
    det = jnp.einsum('...ij,...ij->...', Id, A) / 3.0
    return Id / det[..., None, None]


def inverse3(A):
    """Inverse of stacked 3x3 matrices (reference `brutus/utils.py:108-114`)."""
    return jnp.swapaxes(inverse_transpose3(A), -1, -2)


def equilibrate3(A):
    """Diagonal equilibration of stacked symmetric 3x3 matrices.

    Returns `(B, dinv)` with `B = D^-1 A D^-1`, `D = diag(sqrt(|diag A|))`
    (unit-magnitude diagonal).  The `(s, Av, Rv)` precision matrices mix
    entry scales over ~8 decades with correlations up to ~0.98; their raw
    float32 adjugate/Cholesky cancels catastrophically (observed: negative
    "covariance" diagonals purely from inversion noise).  All minors of
    `B` have the same signs as those of `A`, so definiteness tests are
    unchanged.
    """
    d = jnp.sqrt(jnp.maximum(
        jnp.abs(jnp.diagonal(A, axis1=-2, axis2=-1)), 1e-30))
    dinv = 1.0 / d
    B = A * dinv[..., :, None] * dinv[..., None, :]
    return B, dinv


def inverse3_stable(A):
    """Float32-stable inverse of stacked symmetric 3x3 matrices via
    diagonal equilibration (`inv(A) = D^-1 inv(B) D^-1`)."""
    B, dinv = equilibrate3(A)
    return inverse3(B) * dinv[..., :, None] * dinv[..., None, :]


def cholesky3_stable(A):
    """Float32-stable Cholesky of stacked SPD 3x3 matrices.

    `chol(D B D) = D chol(B)` for diagonal `D`, so the factorization runs
    on the equilibrated matrix and is rescaled afterwards.
    """
    B, dinv = equilibrate3(A)
    return cholesky3(B) / dinv[..., :, None]


def cholesky3(A):
    """Closed-form Cholesky factor of stacked SPD 3x3 matrices.

    `jnp.linalg.cholesky` lowers poorly on TPU for huge batches of tiny
    matrices; the explicit scalar recurrence is a handful of fused
    elementwise ops.  Returns lower-triangular `L` with NaNs where the
    input is not positive definite.
    """
    a11, a21, a31 = A[..., 0, 0], A[..., 1, 0], A[..., 2, 0]
    a22, a32, a33 = A[..., 1, 1], A[..., 2, 1], A[..., 2, 2]
    l11 = jnp.sqrt(a11)
    l21 = a21 / l11
    l31 = a31 / l11
    l22 = jnp.sqrt(a22 - l21 * l21)
    l32 = (a32 - l31 * l21) / l22
    l33 = jnp.sqrt(a33 - l31 * l31 - l32 * l32)
    z = jnp.zeros_like(l11)
    return jnp.stack([
        jnp.stack([l11, z, z], axis=-1),
        jnp.stack([l21, l22, z], axis=-1),
        jnp.stack([l31, l32, l33], axis=-1),
    ], axis=-2)


def mvn3_transform(mean, L, z):
    """`mean + L @ z` for stacked 3x3 lower triangles, written as
    elementwise ops (no tiny batched matmuls).

    mean : (..., 3); L : (..., 3, 3); z : (..., 3, S) -> (..., 3, S).
    """
    z0, z1, z2 = z[..., 0, :], z[..., 1, :], z[..., 2, :]
    s0 = mean[..., 0, None] + L[..., 0, 0, None] * z0
    s1 = (mean[..., 1, None] + L[..., 1, 0, None] * z0
          + L[..., 1, 1, None] * z1)
    s2 = (mean[..., 2, None] + L[..., 2, 0, None] * z0
          + L[..., 2, 1, None] * z1 + L[..., 2, 2, None] * z2)
    return jnp.stack([s0, s1, s2], axis=-2)


def is_psd3(A, eps=0.0):
    """Boolean mask of which stacked 3x3 symmetric matrices are PD.

    The reference checks via a Cholesky try/except (`utils.py:117-127`);
    here we use the leading-principal-minor (Sylvester) criterion, which
    is branch-free and exact for 3x3.  The matrix is equilibrated first
    (sign-preserving; see `equilibrate3`) so the minors are computed at
    unit scale instead of cancelling in float32.
    """
    A, _ = equilibrate3(A)
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    m1 = a
    m2 = a * e - b * d
    m3 = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    return (m1 > eps) & (m2 > eps) & (m3 > eps)


# ---------------------------------------------------------------------------
# Parts-based symmetric 3x3 toolkit
#
# The same operations as the stacked-matrix functions above, but on the
# SIX unique components `(p00, p11, p22, p01, p02, p12)` as separate
# arrays of any shape.  Shared by the posterior's host/XLA path and the
# fused MC Pallas kernel (which carries per-model state as `(1, T)` lane
# rows and cannot build `(..., 3, 3)` stacks without wasting its lane
# axis) — a single implementation keeps the two paths bit-identical, so
# the batch-vs-grid parity tests can assert exact draw indices.
# ---------------------------------------------------------------------------

def equilibrate3_parts(p):
    """Parts analogue of `equilibrate3`: returns the equilibrated parts
    plus the inverse scale factors `(e0, e1, e2)`."""
    p00, p11, p22, p01, p02, p12 = p
    e0 = 1.0 / jnp.sqrt(jnp.maximum(jnp.abs(p00), 1e-30))
    e1 = 1.0 / jnp.sqrt(jnp.maximum(jnp.abs(p11), 1e-30))
    e2 = 1.0 / jnp.sqrt(jnp.maximum(jnp.abs(p22), 1e-30))
    bp = (p00 * e0 * e0, p11 * e1 * e1, p22 * e2 * e2,
          p01 * e0 * e1, p02 * e0 * e2, p12 * e1 * e2)
    return bp, (e0, e1, e2)


def _inv3_sym_raw_parts(p):
    """Adjugate-over-determinant inverse of a symmetric 3x3 given as
    parts (the parts analogue of `inverse3`; det via the same
    mean-of-three identity `det = sum(adj * A) / 3`)."""
    a, d, f, b, c, e = p           # a=p00 d=p11 f=p22 b=p01 c=p02 e=p12
    adj00 = d * f - e * e
    adj01 = e * c - b * f
    adj02 = b * e - d * c
    adj11 = f * a - c * c
    adj12 = c * b - e * a
    adj22 = a * d - b * b
    det = (adj00 * a + adj01 * b + adj02 * c
           + adj01 * b + adj11 * d + adj12 * e
           + adj02 * c + adj12 * e + adj22 * f) / 3.0
    return (adj00 / det, adj11 / det, adj22 / det,
            adj01 / det, adj02 / det, adj12 / det)


def inverse3_sym_parts(p):
    """Float32-stable inverse of symmetric 3x3 parts (equilibrated, as
    `inverse3_stable`)."""
    bp, (e0, e1, e2) = equilibrate3_parts(p)
    i00, i11, i22, i01, i02, i12 = _inv3_sym_raw_parts(bp)
    return (i00 * e0 * e0, i11 * e1 * e1, i22 * e2 * e2,
            i01 * e0 * e1, i02 * e0 * e2, i12 * e1 * e2)


def is_psd3_parts(p, eps=0.0):
    """Sylvester PD test on symmetric 3x3 parts (see `is_psd3`)."""
    (a, e, i, b, c, f), _ = equilibrate3_parts(p)
    m1 = a
    m2 = a * e - b * b
    m3 = a * (e * i - f * f) - b * (b * i - f * c) + c * (b * f - e * c)
    return (m1 > eps) & (m2 > eps) & (m3 > eps)


def cholesky3_parts(p):
    """Stable Cholesky of symmetric 3x3 parts -> the six lower-triangle
    entries `(l00, l10, l11, l20, l21, l22)` (see `cholesky3_stable`)."""
    bp, (e0, e1, e2) = equilibrate3_parts(p)
    a11, a22, a33, a21, a31, a32 = bp
    l11 = jnp.sqrt(a11)
    l21 = a21 / l11
    l31 = a31 / l11
    l22 = jnp.sqrt(a22 - l21 * l21)
    l32 = (a32 - l31 * l21) / l22
    l33 = jnp.sqrt(a33 - l31 * l31 - l32 * l32)
    return (l11 / e0, l21 / e1, l22 / e1, l31 / e2, l32 / e2, l33 / e2)


def psd_repair_parts(icov_p, scale, valid, width, max_passes,
                     mvn_eps=0.0):
    """Escalating diagonal-prior PSD repair on precision PARTS, plus a
    terminal positive-diagonal fallback — the parts analogue of
    `ops.posterior._psd_repair` (reference `brutus/fitting.py:
    1042-1065`).  Returns the repaired COVARIANCE parts (with `mvn_eps`
    added to the diagonal, ready for `cholesky3_parts`).
    """
    sfrac = scale * width
    cov_p = inverse3_sym_parts(icov_p)
    one = jnp.ones_like(scale)
    zero = jnp.zeros_like(scale)
    for i in range(max_passes):
        count = 2.0 ** i
        not_psd = (~is_psd3_parts(cov_p)) & valid
        d1 = cov_p[0] <= 0
        d2 = cov_p[1] <= 0
        d3 = cov_p[2] <= 0
        s1 = jnp.where(d1, one, zero) + jnp.where((~d2) & (~d3), one,
                                                  zero)
        s2 = jnp.where(d2, one, zero) + jnp.where((~d1) & (~d3), one,
                                                  zero)
        s3 = jnp.where(d3, one, zero) + jnp.where((~d1) & (~d2), one,
                                                  zero)
        add = (count / sfrac ** 2 * s1, count / width ** 2 * s2,
               count / width ** 2 * s3)
        icov_p = tuple(
            jnp.where(not_psd, icov_p[j] + add[j], icov_p[j])
            for j in range(3)) + icov_p[3:]
        new_cov = inverse3_sym_parts(icov_p)
        cov_p = tuple(jnp.where(not_psd, new_cov[j], cov_p[j])
                      for j in range(6))
    still_bad = ~is_psd3_parts(cov_p)
    d0, d1, d2 = cov_p[0], cov_p[1], cov_p[2]
    w0 = jnp.maximum(sfrac ** 2, 1e-30)
    f0 = jnp.where((d0 > 0) & jnp.isfinite(d0), d0, w0)
    f1 = jnp.where((d1 > 0) & jnp.isfinite(d1), d1, width ** 2)
    f2 = jnp.where((d2 > 0) & jnp.isfinite(d2), d2, width ** 2)
    cov_p = (jnp.where(still_bad, f0, cov_p[0]) + mvn_eps,
             jnp.where(still_bad, f1, cov_p[1]) + mvn_eps,
             jnp.where(still_bad, f2, cov_p[2]) + mvn_eps,
             jnp.where(still_bad, zero, cov_p[3]),
             jnp.where(still_bad, zero, cov_p[4]),
             jnp.where(still_bad, zero, cov_p[5]))
    return cov_p


def sym3_from_parts(p):
    """Assemble `(..., 3, 3)` symmetric matrices from parts
    `(p00, p11, p22, p01, p02, p12)`."""
    p00, p11, p22, p01, p02, p12 = p
    return jnp.stack([
        jnp.stack([p00, p01, p02], axis=-1),
        jnp.stack([p01, p11, p12], axis=-1),
        jnp.stack([p02, p12, p22], axis=-1),
    ], axis=-2)


# ---------------------------------------------------------------------------
# Statistical pdfs (parity: reference brutus/utils.py:130-283)
# ---------------------------------------------------------------------------

def chi2_logpdf(x, df, loc=0.0, scale=1.0):
    """Log-PDF of the chi-square distribution.

    Parity: reference `brutus/utils.py:130-176` (`_chisquare_logpdf`),
    which replicates `scipy.stats.chi2.logpdf`.  `df` may be a traced
    value (the reference relies on `Ndim - 3` which varies per star).
    """
    y = (jnp.asarray(x) - loc) / scale
    halfdf = df / 2.0
    safe_y = jnp.where(y > 0, y, 1.0)
    ans = (-(halfdf * jnp.log(2.0) + gammaln(halfdf))
           + (halfdf - 1.0) * jnp.log(safe_y) - safe_y / 2.0
           - jnp.log(scale))
    return jnp.where(y > 0, ans, -jnp.inf)


def truncnorm_pdf(x, a, b, loc=0.0, scale=1.0):
    """PDF of a truncated normal (reference `brutus/utils.py:179-229`).

    `a`/`b` are the standardized cutoffs, as in `scipy.stats.truncnorm`.
    """
    x = jnp.asarray(x)
    lo = scale * a + loc
    hi = scale * b + loc
    xi = (x - loc) / scale
    phix = jnp.exp(-0.5 * xi ** 2) / jnp.sqrt(2.0 * jnp.pi)
    Phia = 0.5 * (1 + erf(a / jnp.sqrt(2.0)))
    Phib = 0.5 * (1 + erf(b / jnp.sqrt(2.0)))
    ans = phix / (scale * (Phib - Phia))
    return jnp.where((x < lo) | (x > hi), 0.0, ans)


def truncnorm_logpdf(x, a, b, loc=0.0, scale=1.0):
    """Log-PDF of a truncated normal (reference `brutus/utils.py:232-283`)."""
    x = jnp.asarray(x)
    lo = scale * a + loc
    hi = scale * b + loc
    xi = (x - loc) / scale
    lnphi = -jnp.log(jnp.sqrt(2.0 * jnp.pi)) - 0.5 * jnp.square(xi)
    lndenom = (jnp.log(scale / 2.0) +
               jnp.log(erf(b / jnp.sqrt(2.0)) - erf(a / jnp.sqrt(2.0))))
    ans = lnphi - lndenom
    return jnp.where((x < lo) | (x > hi), -jnp.inf, ans)


# ---------------------------------------------------------------------------
# Weighted quantiles (parity: reference brutus/utils.py:718-762)
# ---------------------------------------------------------------------------

def quantile(x, q, weights=None):
    """(Weighted) sample quantiles.

    Parity: reference `brutus/utils.py:718-762`.  Unweighted falls back
    to `jnp.percentile`; weighted interpolates the weighted CDF.
    """
    x = jnp.atleast_1d(x)
    q = jnp.atleast_1d(q)
    if weights is None:
        return jnp.percentile(x, 100.0 * q)
    weights = jnp.atleast_1d(weights)
    idx = jnp.argsort(x)
    sw = weights[idx]
    cdf = jnp.cumsum(sw)[:-1]
    cdf = cdf / cdf[-1]
    cdf = jnp.concatenate([jnp.zeros(1, dtype=cdf.dtype), cdf])
    return jnp.interp(q, cdf, x[idx])


# ---------------------------------------------------------------------------
# Batched MVN sampling (parity: reference brutus/utils.py:765-905)
# ---------------------------------------------------------------------------

def sample_multivariate_normal(key, mean, cov, size=1, eps=1e-30):
    """Draw `size` samples from `N` different d-dimensional Gaussians.

    Parity: reference `brutus/utils.py:845-905` (batched Cholesky of the
    jittered covariances + standard-normal transform), with the stateful
    numpy RNG replaced by a JAX PRNG key.

    Parameters
    ----------
    mean : (N, d), cov : (N, d, d)

    Returns
    -------
    samples : (d, size, N) — matching the reference's output layout.
    """
    N, d = mean.shape
    K = cov + eps * jnp.eye(d, dtype=cov.dtype)
    z = jax.random.normal(key, (N, d, size), dtype=mean.dtype)
    if d == 3:
        ans = mvn3_transform(mean, cholesky3(K), z)
    else:
        L = jnp.linalg.cholesky(K)
        # HIGHEST: TPU matmuls truncate f32 operands to bf16 at
        # default precision — keep the draws exact vs the f64 oracle.
        ans = mean[:, :, None] + jnp.matmul(
            L, z, precision=jax.lax.Precision.HIGHEST)  # (N, d, size)
    return jnp.moveaxis(ans, 0, -1)                # (d, size, N)


def draw_sar(key, scales, avs, rvs, covs_sar, ndraws=500,
             avlim=(0.0, 6.0), rvlim=(1.0, 8.0)):
    """Truncated-MVN draws of `(s, Av, Rv)` per model.

    The reference (`brutus/utils.py:765-842`) rejection-samples in a
    Python while-loop until `ndraws` in-bounds draws accumulate.  The
    TPU-native equivalent draws a fixed batch and replaces out-of-bounds
    draws by resampling (with replacement) from the in-bounds set — the
    same truncated distribution in the large-`ndraws` limit, with static
    shapes.  Models with zero in-bounds draws fall back to clipped means.

    Returns
    -------
    sdraws, adraws, rdraws : (Nsamps, Ndraws)
    """
    mean = jnp.stack([scales, avs, rvs], axis=-1)       # (N, 3)
    kd, kr = jax.random.split(key)
    samps = sample_multivariate_normal(kd, mean, covs_sar, size=ndraws)
    s_mc, a_mc, r_mc = samps[0].T, samps[1].T, samps[2].T   # (N, ndraws)
    inbounds = ((s_mc >= 0.0) &
                (a_mc >= avlim[0]) & (a_mc <= avlim[1]) &
                (r_mc >= rvlim[0]) & (r_mc <= rvlim[1]))
    # Categorical resample indices from the in-bounds subset per model.
    logits = jnp.where(inbounds, 0.0, -jnp.inf)
    any_in = jnp.any(inbounds, axis=-1, keepdims=True)
    logits = jnp.where(any_in, logits, 0.0)  # degenerate fallback: uniform
    idx = jax.random.categorical(kr, logits[:, None, :], axis=-1,
                                 shape=(s_mc.shape[0], ndraws))
    take = lambda x: jnp.take_along_axis(x, idx, axis=-1)
    s_out = jnp.where(inbounds, s_mc, take(s_mc))
    a_out = jnp.where(inbounds, a_mc, take(a_mc))
    r_out = jnp.where(inbounds, r_mc, take(r_mc))
    # Total fallback when nothing is in bounds: clipped means.
    s_out = jnp.where(any_in, s_out, jnp.maximum(mean[:, :1], 0.0))
    a_out = jnp.where(any_in, a_out, jnp.clip(mean[:, 1:2], *avlim))
    r_out = jnp.where(any_in, r_out, jnp.clip(mean[:, 2:3], *rvlim))
    return s_out, a_out, r_out


# ---------------------------------------------------------------------------
# Simple photometric log-likelihood (parity: reference brutus/utils.py:1162)
# ---------------------------------------------------------------------------

def phot_loglike(data, data_err, data_mask, models, dim_prior=True):
    """Masked chi-square log-likelihood of fluxes against model fluxes.

    Parity: reference `brutus/utils.py:1162-1215`, recast with mask
    weighting instead of boolean fancy-indexing (static shapes).

    Parameters
    ----------
    data, data_err, data_mask : (Nfilt,)
    models : (Nmodel, Nfilt)
    """
    mask = jnp.asarray(data_mask, dtype=models.dtype)
    ndim = jnp.sum(mask)
    tot_var = jnp.square(data_err)
    safe_var = jnp.where(mask > 0, tot_var, 1.0)
    resid = jnp.where(mask > 0, data - models, 0.0)
    chi2 = jnp.sum(jnp.square(resid) / safe_var * mask, axis=-1)
    lnl = -0.5 * chi2
    lnl = lnl - 0.5 * (ndim * jnp.log(2.0 * jnp.pi) +
                       jnp.sum(jnp.log(safe_var) * mask, axis=-1))
    if dim_prior:
        a = 0.5 * (ndim - 3)
        lnl = ((a - 1.0) * jnp.where(chi2 > 0, jnp.log(jnp.where(chi2 > 0, chi2, 1.0)), 0.0)
               - chi2 / 2.0 - gammaln(a) - jnp.log(2.0) * a)
    return lnl


# API parity: the reference exposes `get_seds` from utils
# (brutus/utils.py:1089); the implementation lives in ops.sed.
from .ops.sed import get_seds  # noqa: E402

__all__ = [
    "magnitude", "inv_magnitude", "luptitude", "inv_luptitude", "add_mag",
    "get_seds",
    "adjoint3", "inverse3", "inverse_transpose3", "is_psd3",
    "chi2_logpdf", "truncnorm_pdf", "truncnorm_logpdf",
    "quantile", "sample_multivariate_normal", "draw_sar", "phot_loglike",
]
