"""
Fused Pallas TPU kernel for the per-star grid log-likelihood.

The XLA path (`ops.optimize.loglike_grid`) re-streams several
`(B, M, F)` tensors from HBM on every optimizer iteration (~40+
iterations), making it HBM-bandwidth-bound.  This kernel tiles the
model axis and keeps each `(F, TILE)` coefficient block **resident in
VMEM through every iteration of both optimization phases**, so the
grid is read from HBM exactly once per star batch:

    HBM traffic = coeffs (3*F*M*4 B)  +  outputs (11*B*M*4 B)

Layout: coefficients are transposed to `(3, F, M)` so models ride the
128-wide lanes and the F~8 filter axis sits in sublanes; all
filter-axis reductions are cheap sublane reductions and every
elementwise op vectorizes across 128 models at once.

Program shape (v2): each program handles a group of **8 stars** (rides
the sublane axis of the per-model row state) against one model tile;
both optimization phases run a **fixed, fully unrolled iteration
budget** (`FitConfig.kernel_mag_iters/kernel_flux_iters`) seeded by an
in-kernel direct 3x3 magnitude-space solve.  The v1 kernel used
per-(tile, star) programs with `lax.while_loop` convergence — the
data-dependent cond (vector->scalar reduce + branch) stalled the VPU
pipeline every iteration and the kernel spent ~95% of its time idle
(54 stars/s); the unrolled schedule has no scalar syncs at all.

Semantics vs the reference (`brutus/fitting.py:579-820`): identical
math per model, with two deliberate differences — (1) convergence is
tracked **per model** (a model freezes when its own update falls below
tolerance) instead of the reference's global max-over-good-models
predicate, which would need a cross-tile reduction every iteration;
(2) iteration counts are a fixed budget chosen to exceed observed
convergence maxima rather than data-dependent.  Frozen models have
converged at least as tightly as under the global rule; posterior
summaries agree to well below survey tolerance (see
tests/test_pallas.py).  The reference's init-threshold cull
(fitting.py:743-768) is likewise unnecessary here: all models are
flux-polished, which only improves their fits.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.scipy.special import gammaln

from ..config import FitConfig, LN2PI
from ..utils import chi2_logpdf

LN10 = math.log(10.0)
FLUXFAC = -0.4 * LN10


from functools import lru_cache


GROUP = 8  # stars per program (sublane width of the row state)


@lru_cache(maxsize=32)
def _make_kernel(cfg: FitConfig, per_star=False, stacked=None):
    """`stacked=(n_aux, n_rows, mask_n_real)` switches the funnel
    kernel to ONE pack-ready `(B, n_rows, M)` output (rows: lnl, chi2,
    scale, av, rv, the 6 precision parts, the aux rows copied through
    from the slab gather, the global index, zero padding) with the
    `_post` epilogue (Gaussian norm constant / chi2 dim-prior /
    pad-model masking, reference `brutus/fitting.py:806-815`) applied
    IN-KERNEL from per-star constants.  The round-5 device trace
    showed ~1.7 ms/batch of XLA marshalling (8 stack update-slices,
    the aux deinterleave copy, two relayout copies) just to assemble
    this buffer from 11 separate outputs; emitting it directly makes
    the kernel-output -> prefilter-pack-gather handoff a pure bitcast.
    """
    avm, av_sig = cfg.av_gauss
    rvm, rv_sig = cfg.rv_gauss
    avvi = 1.0 / av_sig ** 2
    rvvi = 1.0 / rv_sig ** 2
    a_reg = 1.0 / cfg.av_reg ** 2
    r_reg = 1.0 / cfg.rv_reg ** 2
    avmin, avmax = cfg.avlim
    rvmin, rvmax = cfg.rvlim
    ln_init_thresh = math.log(cfg.init_thresh)

    def fsum(x):
        """Filter-axis (outer-axis) reduction: (F, G, T) -> (G, T).

        F is the OUTER dim, so this lowers to F-1 full-tile adds; the
        result rides the full 8-sublane x T-lane layout, so every
        per-model row op downstream uses the whole VPU.  (The previous
        (G, 1, T) row layout used 1/8 of the sublanes and the row ops
        dominated the kernel.)
        """
        return jnp.sum(x, axis=0)

    def lmax(x):
        """Per-star max over the model tile: (G, T) -> (G, 1)."""
        return jnp.max(x, axis=1, keepdims=True)

    def kernel(flux_ref, wtf_ref, mags_ref, wtm_ref, coef_ref,
               *out_refs):
        if stacked is not None:
            (aux_ref, gidx_ref, srow_ref), (out_ref,) = \
                out_refs[:3], out_refs[3:]
        else:
            (lnl_ref, chi2_ref, scale_ref, av_ref, rv_ref,
             sden_ref, aden_ref, rden_ref, sa_ref, sr_ref,
             ar_ref) = out_refs
        # Grid: (num_tiles, B // GROUP); one program = 8 stars x 1 tile.
        # The coefficient block keeps the same index across the inner
        # group steps, so the grid streams from HBM exactly once.
        # Layout: models ride the 128-wide lanes, the 8 stars of the
        # group ride the sublanes, and the F filters ride the outer dim.
        if per_star:
            # Screened (funnel) mode: each star has its own gathered
            # model shortlist, so the coefficient block carries a GROUP
            # axis and broadcasts nowhere.  The block is the slab
            # gather's native (3F, G, T) row layout (row k*F + f holds
            # coefficient k of filter f) — consuming it directly keeps
            # the gather-output -> fit-operand handoff a pure bitcast
            # (the 4-D (3, F, B, P) view cost a 0.45 ms/batch layout
            # copy on the round-5 device trace); dim 0 is untiled, so
            # the static F-row slices are free.
            nf = flux_ref.shape[1]
            mag0 = coef_ref[0:nf]       # (F, G, T)
            r0 = coef_ref[nf:2 * nf]
            dr = coef_ref[2 * nf:3 * nf]
        else:
            mag0 = coef_ref[0][:, None, :]  # (F, 1, T)
            r0 = coef_ref[1][:, None, :]
            dr = coef_ref[2][:, None, :]

        flux = flux_ref[0][:, :, None]  # (F, G, 1)
        wtf = wtf_ref[0][:, :, None]
        mags = mags_ref[0][:, :, None]
        wtm = wtm_ref[0][:, :, None]

        # Iteration-invariant intrinsic fluxes (hoisted out of `mle`).
        m_int = jnp.exp(FLUXFAC * mag0)             # (F, 1, T)

        def mle(av, rv, want_icov=False):
            """Flux-space MLE re-expansion (fitting.py:430-576).

            av, rv : (G, T) rows; F-space tensors are (F, G, T).
            """
            rvec_m = r0 + rv[None] * dr
            m = m_int * jnp.exp(FLUXFAC * (av[None] * rvec_m))
            rvec = FLUXFAC * m * rvec_m
            drvec = FLUXFAC * m * dr
            s_num = fsum(m * flux * wtf)
            # Floor the normal matrix: m**2 underflows f32 for strongly
            # extincted faint models and 0/0 would poison chi2 with NaN.
            s_den = jnp.maximum(fsum(m * m * wtf), 1e-30)
            scale = jnp.maximum(s_num / s_den, cfg.scale_min)   # (G, T)
            ms = m * scale[None]
            resid = flux - ms
            if not want_icov:
                return ms, rvec * scale[None], drvec * scale[None], \
                    scale, resid
            red_s = (m - m_int) * scale[None]
            t = ms - resid
            sa = fsum(rvec * t * wtf)
            sr = fsum(drvec * t * wtf)
            rvec_s = rvec * scale[None]
            drvec_s = drvec * scale[None]
            ar = fsum(drvec_s * (red_s - resid) * wtf)
            a_den = fsum(rvec_s * rvec_s * wtf) + avvi + a_reg
            r_den = fsum(drvec_s * drvec_s * wtf) + rvvi + r_reg
            return (ms, rvec_s, drvec_s, scale, resid,
                    s_den, a_den, r_den, sa, sr, ar)

        # ---- phase A seed: direct 3x3 WLS solve of (mu, Av, Av*Rv) ----
        # (the same closed-form seed as ops.optimize.direct_mag_init).
        # ALWAYS on, independent of cfg.mag_direct_init: the fixed
        # unrolled budgets below are sized assuming this seed; from the
        # constant (av0, rv0) start some stars exhaust the budget
        # under-converged (multi-nat evidence errors vs the XLA
        # engine's to-tolerance while_loop).
        resid0 = mags - mag0                      # (F, G, T)
        a00 = jnp.sum(wtm, axis=0)                # (G, 1)
        a01 = fsum(r0 * wtm)                      # (G, T)
        a02 = fsum(dr * wtm)
        a11 = fsum(r0 * r0 * wtm) + avvi
        a12 = fsum(r0 * dr * wtm)
        a22 = fsum(dr * dr * wtm)
        b0 = fsum(resid0 * wtm)
        b1 = fsum(resid0 * r0 * wtm) + avm * avvi
        b2 = fsum(resid0 * dr * wtm)
        det = (a00 * (a11 * a22 - a12 * a12)
               - a01 * (a01 * a22 - a12 * a02)
               + a02 * (a01 * a12 - a11 * a02))
        det1 = (a00 * (b1 * a22 - a12 * b2)
                - b0 * (a01 * a22 - a12 * a02)
                + a02 * (a01 * b2 - b1 * a02))
        det2 = (a00 * (a11 * b2 - b1 * a12)
                - a01 * (a01 * b2 - b1 * a02)
                + b0 * (a01 * a12 - a11 * a02))
        safe_det = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
        av = jnp.clip(det1 / safe_det, avmin, avmax)
        avrv = det2 / safe_det
        rv = jnp.where(jnp.abs(av) > 1e-10,
                       avrv / jnp.where(jnp.abs(av) > 1e-10, av, 1.0),
                       rvm)
        rv = jnp.clip(rv, rvmin, rvmax)

        # ---- phase A: alternating clamped (Av, Rv) 2x2 solves, fixed
        # unrolled budget.  Like the reference, EVERY model is updated
        # every iteration (fitting.py:173-237); only the stopping rule
        # differs (fixed budget instead of the global tolerance test,
        # which would cost a vector->scalar sync per iteration).
        rvec = r0 + rv[None] * dr                       # (F, G, T)
        resid = mags - (mag0 + av[None] * rvec)

        s_den_m = jnp.sum(wtm, axis=0)                  # (G, 1)
        rp_den = fsum(dr * dr * wtm)                    # (G, T)
        srp = fsum(dr * wtm)

        for _ in range(cfg.kernel_mag_iters):
            a_den = fsum(rvec * rvec * wtm) + avvi
            sa = fsum(rvec * wtm)
            rs = fsum(resid * wtm)
            ra = fsum(resid * rvec * wtm) + (avm - av) * avvi
            dav = (s_den_m * ra - sa * rs) / (s_den_m * a_den - sa * sa)
            dav = jnp.clip(dav, avmin - av, avmax - av)
            av = av + dav
            resid = resid - dav[None] * rvec

            r_den = rp_den * av * av + rvvi
            sr = srp * av
            rs = fsum(resid * wtm)
            rr = av * fsum(resid * dr * wtm) + (rvm - rv) * rvvi
            drv = (s_den_m * rr - sr * rs) / (s_den_m * r_den - sr * sr)
            drv = jnp.clip(drv, rvmin - rv, rvmax - rv)
            rv = rv + drv
            resid = resid - (av * drv)[None] * dr
            rvec = rvec + drv[None] * dr

        # ---- phase B: flux-space damped polish, fixed unrolled budget.
        # The freeze set is the tile-local equivalent of the reference's
        # init-threshold cull (fitting.py:743-768): models below the
        # tile's best phase-A fit by more than ln(init_thresh) keep
        # their phase-A (Av, Rv) and are never polished, exactly like
        # the reference's culled models (fitting.py:805-810).
        models, rvecs, drvecs, scale, residf = mle(av, rv)
        chi2 = fsum(residf * residf * wtf)
        lnl = -0.5 * chi2
        active = jnp.where(lnl < lmax(lnl) + ln_init_thresh, 0.0, 1.0)
        stepsize = active
        lnl_old = lnl

        for _ in range(cfg.kernel_flux_iters):
            a_num = fsum(rvecs * residf * wtf) + (avm - av) * avvi
            a_den = fsum(rvecs * rvecs * wtf) + avvi
            dav = stepsize * a_num / a_den
            r_num = fsum(drvecs * residf * wtf) + (rvm - rv) * rvvi
            r_den = fsum(drvecs * drvecs * wtf) + rvvi
            drv = stepsize * r_num / r_den
            dav = jnp.clip(dav, avmin - av, avmax - av)
            drv = jnp.clip(drv, rvmin - rv, rvmax - rv)
            av = av + dav
            rv = rv + drv
            models, rvecs, drvecs, scale, residf = mle(av, rv)
            chi2 = fsum(residf * residf * wtf)
            lnl = -0.5 * chi2
            # Per-model damping on log-likelihood decrease
            # (fitting.py:802, rescaling = 1.2).
            stepsize = jnp.where(lnl < lnl_old,
                                 stepsize / cfg.stepsize_rescale, stepsize)
            lnl_old = lnl

        # ---- final MLE expansion + outputs ----
        (models, rvecs, drvecs, scale, residf,
         s_den, a_den, r_den, sa, sr, ar) = mle(av, rv, want_icov=True)
        chi2 = fsum(residf * residf * wtf)

        if stacked is None:
            lnl_ref[:] = -0.5 * chi2
            chi2_ref[:] = chi2
            scale_ref[:] = scale
            av_ref[:] = av
            rv_ref[:] = rv
            sden_ref[:] = s_den
            aden_ref[:] = a_den
            rden_ref[:] = r_den
            sa_ref[:] = sa
            sr_ref[:] = sr
            ar_ref[:] = ar
            return

        # ---- stacked mode: `_post`'s epilogue in-kernel, then ONE
        # pack-ready (G, n_rows, T) store (see `_make_kernel` doc) ----
        n_aux, n_rows, mask_n_real = stacked
        gidx = gidx_ref[:]                               # (G, T) f32
        if mask_n_real is not None:
            # Tile-padding models inside selected slabs (same masking
            # `_post` applies via `bad=(idx >= n_real)`).
            badf = gidx >= float(mask_n_real)
            chi2 = jnp.where(badf, 1e30, chi2)
        lnl = -0.5 * chi2
        if mask_n_real is not None:
            lnl = jnp.where(badf, -1e30, lnl)
        sc2 = srow_ref[:]                                # (G, 8)
        lnl = lnl + sc2[:, 0:1]                          # Gaussian const
        if cfg.dim_prior:
            # chi2_logpdf(chi2, ndim-3) with the per-star constants
            # cA = -(k/2 ln2 + lgamma(k/2)), cB = k/2 - 1 precomputed
            # host-side (Mosaic has no lgamma); same op order as
            # `utils.chi2_logpdf`.
            safe_y = jnp.where(chi2 > 0, chi2, 1.0)
            ans = sc2[:, 1:2] + sc2[:, 2:3] * jnp.log(safe_y) \
                - safe_y / 2.0
            lnl = jnp.where(chi2 > 0, ans, -jnp.inf)
        rows = [lnl, chi2, scale, av, rv,
                s_den, a_den, r_den, sa, sr, ar]
        rows += [aux_ref[i] for i in range(n_aux)]
        rows.append(gidx)
        zero = jnp.zeros_like(chi2)
        rows += [zero] * (n_rows - len(rows))
        out_ref[:] = jnp.stack(rows, axis=1)

    return kernel


# Magnitude zero point subtracted from both the data and the model
# magnitudes before the screening matmuls: the bilinear terms are
# accumulated from bf16 products, and centering shrinks |mag0| from
# ~8-16 to ~±4, cutting the b0 = C0 - mag0^T.w cancellation noise ~3x.
SCREEN_MAG_CENTER = 12.0
SCREEN_FP = 8        # filter-group width (one K-packed dot per group)
SCREEN_KP = 48       # packed contraction width: 6 split cross-terms x 8
N_SCREEN_W = 6       # w-dot terms: r0, dr, m0, r0^2, r0*dr, dr^2
N_SCREEN_C = 3       # [mw|w]-dot terms: rss0 part, b1 part, b2 part


def screen_score_from_sums(A01, A02, Bm0, A11, A12, A22, RS, b1r, b2,
                           a00, C0, q0, plx, plxw, cfg: FitConfig):
    """Screening score from the 9 per-(star, model) bilinear sums.

    Solves the clamped direct 3x3 WLS system of `(mu-offset, Av,
    Av*Rv)` (the Av term carries its Gaussian prior) and evaluates the
    chi2 of the clamped solution via the quadratic-form expansion of
    the explicit residual, plus the parallax chi2 at the implied flux
    scale — the exact ranking quantity of the reference's init-
    threshold cull (`brutus/fitting.py:743-768`).  Shared by the MXU
    screening kernel (`_make_screen_kernel`) and the plain-XLA funnel
    (`ops.screen_xla`): pure jnp ops on broadcastable arrays.

    Inputs: `A01..A22` the weight-contracted model sums
    (`sum w r0`, `sum w dr`, `sum w m0`, `sum w r0^2`, `sum w r0 dr`,
    `sum w dr^2`), `RS/b1r/b2` the folded data sums
    (`sum w (-2 m m0 + m0^2)`, `sum w (m - m0) r0`,
    `sum w (m - m0) dr`) with magnitudes centered by
    `SCREEN_MAG_CENTER`; `a00/C0/q0` the star-only scalars
    (`sum w`, `sum w m`, `sum w m^2`); `plx/plxw` the parallax mean
    and weight (0 when absent).  Returns `-chi2/2`.
    """
    avm, av_sig = cfg.av_gauss
    rvm, _ = cfg.rv_gauss
    avvi = 1.0 / av_sig ** 2
    avmin, avmax = cfg.avlim
    rvmin, rvmax = cfg.rvlim

    if cfg.screen_score == "debug_lin":
        # Diagnostic: consume every sum (so no matmul is DCE'd) with
        # ~no VPU work — isolates the matmul/streaming cost.
        return -(A01 + A02 + Bm0 + A11 + A12 + A22 + RS + b1r + b2
                 + a00 + C0 + q0 + plx + plxw)

    # Normal equations carry the Av Gaussian prior; the chi2
    # expansion below uses the RAW sums (explicit residuals).
    # v2 of this score: the screen kernel is VPU-bound on exactly this
    # math (~75 elementwise ops x B x M pairs dominate the stage, not
    # the MXU matmuls — the old 6x-pass HIGHEST-precision matmuls only
    # doubled it), so the 3x3 solve goes through the SCHUR COMPLEMENT
    # of the always-well-conditioned pivot a00 = sum w: eliminating
    # the mu offset first costs ~26 ops vs ~37 for three adjugate
    # determinant expansions, with the identical solution.
    b0 = C0 - Bm0                  # sum w resid0
    b1 = b1r + avm * avvi
    ra00 = 1.0 / a00               # (B, 1) column — ~free per tile
    k1 = A01 * ra00
    k2 = A02 * ra00
    s11 = (A11 + avvi) - k1 * A01  # Schur block of (Av, Av*Rv)
    s12 = A12 - k1 * A02
    s22 = A22 - k2 * A02
    c1 = b1 - k1 * b0
    c2 = b2 - k2 * b0
    det = s11 * s22 - s12 * s12
    rdet = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    av = jnp.clip((c1 * s22 - s12 * c2) * rdet, avmin, avmax)
    avrv = (s11 * c2 - s12 * c1) * rdet
    av_ok = jnp.abs(av) > 1e-10
    rv = jnp.where(av_ok, avrv / jnp.where(av_ok, av, 1.0), rvm)
    rv = jnp.clip(rv, rvmin, rvmax)
    avrv = av * rv
    # Re-solve the (linear, unbounded) mu offset at the clamped
    # (Av, Av*Rv), then score on the quadratic-form expansion of
    # the explicit-residual chi2:
    #   r = resid0 - u - av r0 - avrv dr;  chi2 = sum w r^2.
    # u is exactly optimal given (av, avrv), so the u-terms of the
    # expansion collapse: u^2 a00 - 2 u (b0 - av A01 - avrv A02)
    # = u^2 a00 - 2 u (u a00) = -u^2 a00 = -u s0.
    s0 = b0 - av * A01 - avrv * A02          # = u * a00
    u = s0 * ra00
    rss0 = q0 + RS                 # sum w resid0^2
    chi2 = (rss0 - u * s0
            + av * (av * A11 - 2.0 * b1r)
            + avrv * (avrv * A22 - 2.0 * b2)
            + 2.0 * (av * avrv) * A12)
    # Parallax chi2 at the implied flux scale s = 10**(-0.4 mu)
    # (the centering shift cancels inside resid0, so u is the true
    # mu offset; reference fitting.py:752-768).  plxw is 0 when no
    # parallax is given.
    par = jnp.exp(-0.2 * LN10 * u)
    chi2 = chi2 + (par - plx) ** 2 * plxw
    return -0.5 * chi2


def _split3(x):
    """3-way bf16 split: `x == h + m + l` to full f32 precision.

    Each bf16 part carries 8 mantissa bits, so the three parts
    reproduce all 24 f32 mantissa bits, and every bf16*bf16 partial
    product (<=16 mantissa bits) is EXACT in the MXU's f32
    accumulator — a bf16 matmul over K-stacked split pairs therefore
    reproduces the true-f32 contraction.  The kernel packs the SIX
    dominant cross-terms `hh, hm, hl, mh, mm, lh` (`Precision.
    HIGHEST`'s exact bf16x6 set; the dropped `ml, lm, ll` terms are
    <= 2^-32 relative, below the f32 rounding of the result).
    """
    # Each bf16 part MUST pass through an optimization barrier before
    # being upcast for the residual subtraction: XLA-TPU folds the
    # f32->bf16->f32 convert pair back to the original f32 value
    # (excess precision is allowed), which turns `x - f32(bf16(x))`
    # into exactly 0 and silently zeroes the m/l correction parts.
    # Measured on hardware: the jitted split gave |m| = |l| = 0 and
    # single-bf16 score noise of +-2-40 chi2 that scrambled the
    # funnel shortlist (worst-star recall 0.006); the same code run
    # eagerly, or on CPU, is exact.
    h = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    r = x - h.astype(x.dtype)
    m = jax.lax.optimization_barrier(r.astype(jnp.bfloat16))
    l = (r - m.astype(x.dtype)).astype(jnp.bfloat16)
    return h, m, l


@lru_cache(maxsize=32)
def _make_screen_kernel(cfg: FitConfig, n_g, sblock):
    """Cheap magnitude-space screening pass over the full grid — MXU
    formulation, v3.

    Scores, per (star, model), the chi2 of the clamped direct 3x3
    weighted least-squares solution of `(mu-offset, Av, Av*Rv)` plus
    the parallax chi2 at the implied scale — the same quantity the
    reference's init-threshold cull ranks on
    (`brutus/fitting.py:743-768`).  Every bilinear term of the normal
    equations and of the chi2 quadratic-form expansion is a
    `(B, F) @ (F, T)` contraction over the ~8 filters, and the kernel
    emits only the per-`sblock` score MAXIMA `(B, T // sblock)` — the
    only thing block selection consumes — instead of the raw `(B, M)`
    score plane (~770 MB/batch of HBM write+read at M=750k, B=128).

    Precision: `rss0 = q0 - 2 Cm + Q2` cancels sums of magnitude
    ~ SNR^2 x mag^2 x F (~7e5 at SNR 40) down to the ~1-10 residual
    chi2, so the contractions need true-f32 products (default-precision
    bf16 operand noise injects +-O(1e3) chi2 noise — measured to
    scramble the shortlist on a correlated 750k-model SEDmaker grid,
    posterior recall 0.07; see RECALL.json).  v2 used
    `Precision.HIGHEST` (bf16x6: SIX MXU passes per product, each with
    the K=8 contraction padded to the 128-deep systolic array — 16x
    depth waste x 6 passes made the screen the largest pipeline stage
    at 17.7 ms/batch).  v3 instead packs a manual 3-way bf16 split of
    BOTH operands along K (`_split3`; the six bf16x6 cross-terms are
    each exact in the f32 accumulator), so one SINGLE-PASS bf16
    matmul with K=48 <= 128 reproduces HIGHEST's result — the
    systolic-depth padding that v2 wasted now absorbs the entire
    decomposition for free.

    Column budget (v4): the MXU streams ~one output column per cycle
    and B=128 stars already fill the systolic rows, so wall time is
    set by TOTAL OUTPUT COLUMNS = (#terms) x M — measured invariant
    to tile width, K-depth, and even mostly to B.  Two cuts: (1) the
    three data-side sums fold their `C - Bm` pairs into single
    contractions with the lhs `[mw | w]` stacked along K (12 -> 9
    terms); (2) all terms of a kind issue as ONE wide matmul over
    column-concatenated tables ((B,48)@(48,6T) + (B,96)@(96,3T) per
    tile instead of 12 narrow dots), amortizing MXU fill/dispatch.
    """
    def kernel(wb_ref, cb_ref, srow_ref, maskrow_ref, tabw_ref,
               tabc_ref, score_ref):
        # wb: (n_g, B, 48) bf16 packed weight splits ([h h h m m l]
        # blocks of 8); cb: (n_g, B, 96) = [mw-splits | w-splits];
        # srow: (B, 8) f32 per-star scalars; tabw: (n_g, 48, 6T) bf16
        # per-model row splits ([h; m; l; h; m; h] per group —
        # positional pairing with the lhs gives exactly the bf16x6
        # cross-terms hh, hm, hl, mh, mm, lh) with the 6 w-terms
        # column-concatenated per tile; tabc: (n_g, 96, 3T), rows
        # [mw-side splits; w-side splits] for the 3 folded data sums;
        # score: per-sblock maxima.
        def contract(lhs_ref, tref, sl=None):
            acc = None
            for g in range(n_g):
                rhs = tref[g] if sl is None else tref[g, :, sl]
                d = jax.lax.dot_general(
                    lhs_ref[g], rhs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            return acc

        if cfg.screen_matmul == "split":
            # Nine INDEPENDENT per-term dots: independent narrow dots
            # stream output columns in parallel across the MXUs,
            # where the wide pair serializes on one (see FitConfig).
            T = tabw_ref.shape[2] // N_SCREEN_W
            ws = [contract(wb_ref, tabw_ref,
                           pl.ds(k * T, T)) for k in range(N_SCREEN_W)]
            cs = [contract(cb_ref, tabc_ref,
                           pl.ds(k * T, T)) for k in range(N_SCREEN_C)]
            A01, A02, Bm0, A11, A12, A22 = ws
            RS, b1r, b2 = cs
        else:
            outw = contract(wb_ref, tabw_ref)      # (B, 6T)
            outc = contract(cb_ref, tabc_ref)      # (B, 3T)
            T = outw.shape[1] // N_SCREEN_W
            A01 = outw[:, 0 * T:1 * T]     # sum w r0
            A02 = outw[:, 1 * T:2 * T]     # sum w dr
            Bm0 = outw[:, 2 * T:3 * T]     # sum w m0
            A11 = outw[:, 3 * T:4 * T]     # sum w r0^2
            A12 = outw[:, 4 * T:5 * T]     # sum w r0 dr
            A22 = outw[:, 5 * T:6 * T]     # sum w dr^2
            RS = outc[:, 0 * T:1 * T]      # sum w (-2 m m0 + m0^2)
            b1r = outc[:, 1 * T:2 * T]     # sum w (m - m0) r0
            b2 = outc[:, 2 * T:3 * T]      # sum w (m - m0) dr

        a00 = jnp.maximum(srow_ref[:, 0:1], 1e-30)   # (B, 1)
        C0 = srow_ref[:, 1:2]          # sum w m
        q0 = srow_ref[:, 2:3]          # sum w m^2
        plx = srow_ref[:, 3:4]
        plxw = srow_ref[:, 4:5]

        # Clamped direct 3x3 solve + explicit-residual chi2 + parallax
        # (shared with the plain-XLA funnel, `ops.screen_xla`).
        # maskrow kills the tile-padding models (-1e30 on padded
        # lanes); emit only the per-sblock maxima (all that block
        # selection reads) — the raw (B, M) score plane never leaves
        # VMEM.  The output carries the tile index as a LEADING axis
        # ((num_tiles, B, tile//sblock)) because a (B, tile//sblock)
        # lane-minor block would violate the 128-lane block quantum.
        score = screen_score_from_sums(A01, A02, Bm0, A11, A12, A22,
                                       RS, b1r, b2, a00, C0, q0,
                                       plx, plxw, cfg) + maskrow_ref[:, :]
        Bk, T = score.shape
        score_ref[0] = jnp.max(score.reshape(Bk, T // sblock, sblock),
                               axis=-1)

    return kernel


@lru_cache(maxsize=32)
def _make_screen_call(cfg, B, M, tile, n_g, dtype, interpret, sblock):
    """`B` is the screen-padded star count (multiple of 8: the star
    matrices put stars in sublanes); `n_g` the number of 8-filter
    contraction groups; `sblock` the score-block width of the emitted
    maxima."""
    num_tiles = M // tile
    starw_spec = pl.BlockSpec((n_g, B, SCREEN_KP), lambda t: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    starc_spec = pl.BlockSpec((n_g, B, 2 * SCREEN_KP),
                              lambda t: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    srow_spec = pl.BlockSpec((B, 8), lambda t: (0, 0),
                             memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, tile), lambda t: (0, t),
                             memory_space=pltpu.VMEM)
    tabw_spec = pl.BlockSpec((n_g, SCREEN_KP, N_SCREEN_W * tile),
                             lambda t: (0, 0, t),
                             memory_space=pltpu.VMEM)
    tabc_spec = pl.BlockSpec((n_g, 2 * SCREEN_KP, N_SCREEN_C * tile),
                             lambda t: (0, 0, t),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, B, tile // sblock), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    # Wide tiles (>= 1024) overflow the 16 MB default scoped-VMEM
    # budget with the (B, tile)-sized f32 contraction outputs.
    params = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))
    return pl.pallas_call(
        _make_screen_kernel(cfg, n_g, sblock),
        grid=(num_tiles,),
        in_specs=[starw_spec, starc_spec, srow_spec, mask_spec,
                  tabw_spec, tabc_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, B, tile // sblock),
                                       dtype),
        interpret=interpret,
        **params,
    )


def _pack_splits(x, n_g):
    """`(Bs, n_g*8) f32 -> (n_g, Bs, 48) bf16` K-packed split blocks
    `[h h h m m l]` (see `_make_screen_kernel`: positional pairing
    with the rhs `[h; m; l; h; m; h]`-per-group stacking accumulates
    the six bf16x6 cross-products)."""
    Bs = x.shape[0]
    h, m, l = _split3(x)
    g = lambda s: s.reshape(Bs, n_g, 8)
    h, m, l = g(h), g(m), g(l)
    packed = jnp.concatenate([h, h, h, m, m, l],
                             axis=-1)                  # (Bs, n_g, 48)
    return jnp.swapaxes(packed, 0, 1)


@partial(jax.jit, static_argnames=("n_pad", "fp"))
def _screen_star_mats(mags, wt_mag, plx, plxw, n_pad, fp):
    """Star-side inputs for the MXU screening kernel.

    Returns `(wb, cb, srow)`: bf16 `(n_g, Bs, 48)` K-packed 3-way
    split weight matrix, the `(n_g, Bs, 96)` `[mw-splits | w-splits]`
    stack for the folded data-sum dot (`_pack_splits`), plus the f32
    `(Bs, 8)` per-star scalar rows `[a00, C0, q0, plx, plxw, 0, 0, 0]`.
    `Bs = B + n_pad` pads stars to the sublane quantum.
    """
    B, F = mags.shape
    mc = (mags - SCREEN_MAG_CENTER) * jnp.sign(wt_mag)  # 0 where wt==0
    mcw = mc * wt_mag
    a00 = jnp.sum(wt_mag, axis=1)
    C0 = jnp.sum(mcw, axis=1)
    q0 = jnp.sum(mc * mcw, axis=1)
    zero = jnp.zeros_like(a00)
    srow = jnp.stack([a00, C0, q0, plx[:, 0], plxw[:, 0],
                      zero, zero, zero], axis=1)
    pad_f = fp - F
    wb = jnp.pad(wt_mag, ((0, n_pad), (0, pad_f))).astype(jnp.float32)
    mwb = jnp.pad(mcw, ((0, n_pad), (0, pad_f))).astype(jnp.float32)
    srow = jnp.pad(srow, ((0, n_pad), (0, 0)))
    n_g = fp // 8
    wbp = _pack_splits(wb, n_g)
    cb = jnp.concatenate([_pack_splits(mwb, n_g), wbp], axis=-1)
    return wbp, cb, srow


def prepare_coeffs(mag_coeffs, tile=2048):
    """Transpose `(M, F, 3)` -> `(3, F, M_padded)` with faint padding."""
    import numpy as np
    mc = np.asarray(mag_coeffs, dtype=np.float32)
    M = mc.shape[0]
    rem = (-M) % tile
    if rem:
        pad = np.repeat(mc[-1:], rem, axis=0).copy()
        pad[..., 0] += 60.0
        mc = np.concatenate([mc, pad], axis=0)
    return jnp.asarray(np.ascontiguousarray(mc.transpose(2, 1, 0))), M


from .optimize import prepare_star_data

_prep = partial(jax.jit, static_argnames=("cfg",))(prepare_star_data)


@partial(jax.jit, static_argnames=("cfg", "n_real"))
def _post(outs, mask, ndim, tot_var, cfg: FitConfig, n_real=None,
          bad=None):
    (lnl, chi2, scale, av, rv, s_den, a_den, r_den, sa, sr, ar) = outs
    M = lnl.shape[1]
    # Tile-padding models are *not* inherently bad fits (the free flux
    # scale absorbs any overall magnitude offset), so exclude them
    # explicitly — contiguous trailing padding (dense path) or by
    # boolean mask (funnel path: padding scattered inside slabs).
    if n_real is not None and n_real < M:
        lnl = lnl.at[:, n_real:].set(-1e30)
        chi2 = chi2.at[:, n_real:].set(1e30)
    if bad is not None:
        lnl = jnp.where(bad, -1e30, lnl)
        chi2 = jnp.where(bad, 1e30, chi2)

    # Gaussian constant + dimensionality prior (per star).
    safe_var = jnp.where(mask, tot_var, 1.0)
    const = -0.5 * (ndim * LN2PI + jnp.sum(jnp.log(safe_var) * mask,
                                           axis=1))
    lnl = lnl + const[:, None]
    if cfg.dim_prior:
        lnl = chi2_logpdf(chi2, (ndim - 3)[:, None])

    # The 3x3 precisions are carried as their 6 unique components;
    # assembling a (B, M, 3, 3) tensor here would cost ~50% more HBM
    # traffic than the whole kernel.  `lnpost_grid` gathers the top-k
    # rows first and `icov_from_parts` assembles those only.
    return dict(lnlike=lnl, ndim=ndim, chi2=chi2, scale=scale,
                av=av, rv=rv,
                icov_parts=(s_den, a_den, r_den, sa, sr, ar))


def icov_from_parts(parts):
    """Assemble `(..., 3, 3)` precisions from the 6 unique components
    `(s_den, a_den, r_den, sa, sr, ar)`."""
    s_den, a_den, r_den, sa, sr, ar = parts
    return jnp.stack([
        jnp.stack([s_den, sa, sr], axis=-1),
        jnp.stack([sa, a_den, ar], axis=-1),
        jnp.stack([sr, ar, r_den], axis=-1),
    ], axis=-2)


def loglike_grid_fused(flux, fluxerr, mask, coeffs_t,
                       parallax=None, parallax_err=None,
                       cfg: FitConfig = FitConfig(), tile=512,
                       interpret=None, n_real=None):
    """Batched per-star grid log-likelihood via the fused Pallas kernel.

    NOTE: deliberately NOT wrapped in `jax.jit` — the `pallas_call` is
    dispatched eagerly because jit-wrapping a Mosaic kernel is
    pathologically slow to lower on the remote-compile TPU backend
    (~1000x; measured 527 s vs 0.6 s).  The pre/post stages are jitted
    separately, and eager `pallas_call` dispatches hit the C++ cache
    after the first call.

    Parameters
    ----------
    flux, fluxerr, mask : (B, F) star batch (B is padded up to a
        multiple of GROUP=8 internally).
    coeffs_t : (3, F, M) transposed coefficient grid from
        `prepare_coeffs` (M a multiple of `tile`).

    Returns
    -------
    Same dict as the XLA path (`lnlike, ndim, chi2, scale, av, rv,
    icov_parts`) with a batch axis.
    """
    B, F = flux.shape
    _, _, M = coeffs_t.shape
    dtype = coeffs_t.dtype
    flux = flux.astype(dtype)
    fluxerr = fluxerr.astype(dtype)
    if interpret is None:
        # Mosaic kernels only compile for TPU; everywhere else (CPU
        # tests, the virtual multi-device mesh) run interpreted.
        interpret = jax.default_backend() != "tpu"

    # Pad the star batch to a whole number of GROUP-star programs.
    # Padding stars carry zero weight in every band; their outputs are
    # sliced off below (they produce NaNs from a singular direct init,
    # which never mix with real lanes).
    Bp = -(-B // GROUP) * GROUP
    if Bp != B:
        pad = ((0, Bp - B), (0, 0))
        flux = jnp.pad(flux, pad)
        fluxerr = jnp.pad(fluxerr, pad, constant_values=1.0)
        mask = jnp.pad(mask, pad, constant_values=False)

    flux_p, wt_flux, mags, wt_mag, mask, ndim, tot_var = _prep(
        flux, fluxerr, mask, cfg)

    call = _make_call(cfg, Bp, F, M, tile, str(dtype), interpret)
    # Star data rides the kernel as (n_groups, F, GROUP): filters outer,
    # the group's 8 stars innermost (matching the kernel's (F, G, T)
    # work layout and the TPU block-tiling constraint that trailing
    # block dims cover the full array dims).
    grp = lambda x: x.reshape(Bp // GROUP, GROUP, F).swapaxes(1, 2)
    outs = call(grp(flux_p), grp(wt_flux), grp(mags), grp(wt_mag),
                coeffs_t)
    if Bp != B:
        outs = [o[:B] for o in outs]
        mask, ndim, tot_var = mask[:B], ndim[:B], tot_var[:B]
    return _post(tuple(outs), mask, ndim, tot_var, cfg, n_real=n_real)


@lru_cache(maxsize=32)
def _make_call(cfg, B, F, M, tile, dtype, interpret, per_star=False,
               stacked=None, n_auxp=0):
    """Cached `pallas_call` callable — a fresh kernel closure per call
    would miss the trace cache and re-lower the Mosaic kernel every
    dispatch (~0.65 s each on the remote-compile backend).

    `stacked=(n_aux, n_rows, mask_n_real)` (funnel mode only): single
    pack-ready `(B, n_rows, M)` output; extra inputs `aux (n_auxp, B,
    M)`, `gidx_f32 (B, M)`, `srow (B, 8)` — see `_make_kernel`.
    """
    num_tiles = M // tile
    n_groups = B // GROUP
    star_spec = pl.BlockSpec((1, F, GROUP), lambda t, g: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    if stacked is not None:
        n_rows = stacked[1]
        out_shape = [jax.ShapeDtypeStruct((B, n_rows, M), dtype)]
        out_specs = [pl.BlockSpec((GROUP, n_rows, tile),
                                  lambda t, g: (g, 0, t),
                                  memory_space=pltpu.VMEM)]
    else:
        out_shape = [jax.ShapeDtypeStruct((B, M), dtype)] * 11
        out_specs = [pl.BlockSpec((GROUP, tile), lambda t, g: (g, t),
                                  memory_space=pltpu.VMEM)] * 11
    if per_star:
        # Funnel stage 2: coefficients are per-star shortlists in the
        # slab gather's native (3F, B, M) row layout (a pure bitcast
        # of its (3F, B*M) output — see `_unpack_split`), with a GROUP
        # slice along the star axis.
        coef_spec = pl.BlockSpec((3 * F, GROUP, tile),
                                 lambda t, g: (0, g, t),
                                 memory_space=pltpu.VMEM)
    else:
        coef_spec = pl.BlockSpec((3, F, tile), lambda t, g: (0, 0, t),
                                 memory_space=pltpu.VMEM)
    in_specs = [star_spec] * 4 + [coef_spec]
    if stacked is not None:
        in_specs += [
            pl.BlockSpec((n_auxp, GROUP, tile), lambda t, g: (0, g, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, tile), lambda t, g: (g, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 8), lambda t, g: (g, 0),
                         memory_space=pltpu.VMEM),
        ]
    return pl.pallas_call(
        _make_kernel(cfg, per_star, stacked),
        grid=(num_tiles, n_groups),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Two-stage funnel: screen all models cheaply, fully optimize a shortlist
# ---------------------------------------------------------------------------

def _slab_block(screen_block, tile, interpret):
    """Slab granularity of the funnel gather: must tile both the
    screening tiles and Mp, and (on hardware) be lane-aligned for the
    DMA slab copies.  Shared by `prepare_screen` (table layout) and
    `loglike_grid_screened` (selection) so the two always agree."""
    block = min(screen_block, tile)
    while tile % block:
        block //= 2
    if not interpret:
        block = max(block, 128)
    return block


def prepare_screen(mag_coeffs, aux=None, tile=512, n_shards=1,
                   gather_layout="bm", screen_block=None,
                   interpret=None):
    """Device tables for the screened (funnel) likelihood path.

    Parameters
    ----------
    mag_coeffs : (M, F, 3) grid coefficients.
    aux : optional dict of name -> (M,) float arrays (grid log-prior,
        feh, loga, ...) gathered alongside the coefficients at shortlist
        selection — the posterior stage then needs NO full-grid gathers
        at all.
    tile : model-tile width (M is padded up to a multiple).
    n_shards : model-axis mesh size; M is padded to a multiple of
        `tile * n_shards` so each shard's slice tiles evenly.

    Returns
    -------
    (screen_tab, packed, aux_names, n_real, maskrow): `screen_tab` is
    the PAIR `(tab_w, tab_c)` of bf16 MXU screening tables —
    `tab_w (n_g, 48, 6*Mp)` holds the six weight-contracted rows
    `r0, dr, m0, r0^2, r0*dr, dr^2` (centered magnitudes) and
    `tab_c (n_g, 96, 3*Mp)` the three folded data-sum rows
    `(-2 m0; m0^2), (r0; -m0 r0), (dr; -m0 dr)` against the
    `[mw | w]` star stack; each 8-filter group is stored as the 3-way
    bf16 split stack `[h; m; l; h; m; h]` and each tile's terms are
    column-concatenated so the kernel issues ONE wide matmul per
    (tile, lhs) — see `_make_screen_kernel`.  `packed` is the
    COLUMN-MAJOR `(3F + n_aux, Mp)` slab-gather table (row `k*F + f`
    holds coefficient `k` of filter `f`, so gathered slabs land
    directly in the stage-2 kernel's `(3, F, B, P)` layout with a free
    reshape); then the aux row order, the real model count, and the
    `(1, Mp)` screening mask row (`-1e30` on tile padding).

    `gather_layout` controls the physical layout of `packed`:
    `"bm"` (default) stores it BLOCK-MAJOR — `(Mp // gb * C, gb)`
    where `gb = _slab_block(screen_block, tile, interpret)` and rows
    `[i*C, (i+1)*C)` hold gather block `i` — so every slab-gather DMA
    reads ONE CONTIGUOUS `C * gb * 4`-byte chunk instead of `C`
    separate Mp-strided rows of `4*gb` bytes each; `"cm"` keeps the
    plain `(C, Mp)` column-major table (measurement control).  The
    layout is inferred from `packed.shape` downstream.
    """
    import numpy as np
    import ml_dtypes
    coeffs_t, n_real = prepare_coeffs(mag_coeffs, tile * n_shards)
    Mp = coeffs_t.shape[-1]
    mc = np.asarray(mag_coeffs, np.float32)
    M, F, _ = mc.shape

    # MXU screening tables from the PADDED grid (padding models carry
    # +60 mag; the maskrow kills them regardless).
    ct = np.asarray(coeffs_t)                      # (3, F, Mp) f32
    m0 = ct[0] - SCREEN_MAG_CENTER
    r0, dr = ct[1], ct[2]
    n_g = -(-F // SCREEN_FP)
    fp = n_g * SCREEN_FP
    bf16 = ml_dtypes.bfloat16
    nt = Mp // tile

    def split48(row):
        """(F, Mp) f32 -> (n_g, 48, Mp) bf16 `[h; m; l; h; m; h]`
        split stack (pairs with the lhs `[h h h m m l]` blocks to
        accumulate exactly the bf16x6 cross-terms)."""
        rp = np.zeros((fp, Mp), np.float32)
        rp[:F] = row
        h = rp.astype(bf16)
        rem = rp - h.astype(np.float32)
        mm = rem.astype(bf16)
        ll = (rem - mm.astype(np.float32)).astype(bf16)
        out = np.empty((n_g, SCREEN_KP, Mp), bf16)
        for g in range(n_g):
            sl = slice(g * SCREEN_FP, (g + 1) * SCREEN_FP)
            for j, part in enumerate((h, mm, ll, h, mm, h)):
                out[g, 8 * j:8 * (j + 1)] = part[sl]
        return out

    def tile_cat(splits):
        """list of (n_g, R, Mp) -> (n_g, R, n_terms*Mp) with each
        tile's terms column-concatenated (term-major inside a tile),
        matching the kernel's static output slices."""
        s = np.stack(splits, axis=2)               # (n_g, R, nterm, Mp)
        ng_, R, nterm, _ = s.shape
        s = s.reshape(ng_, R, nterm, nt, tile).swapaxes(2, 3)
        return np.ascontiguousarray(s.reshape(ng_, R, nterm * Mp))

    tab_w = tile_cat([split48(x) for x in
                      (r0, dr, m0, r0 * r0, r0 * dr, dr * dr)])
    catc = lambda a, b: np.concatenate([split48(a), split48(b)], axis=1)
    tab_c = tile_cat([catc(-2.0 * m0, m0 * m0),
                      catc(r0, -m0 * r0),
                      catc(dr, -m0 * dr)])
    screen_tab = (jnp.asarray(tab_w), jnp.asarray(tab_c))
    rows = [np.ascontiguousarray(mc.transpose(2, 1, 0)).reshape(3 * F, M)]
    names = []
    if aux:
        for k, v in aux.items():
            names.append(k)
            rows.append(np.asarray(v, np.float32).reshape(1, M))
    packed = np.concatenate(rows, axis=0)
    if Mp > M:
        packed = np.concatenate(
            [packed, np.zeros((packed.shape[0], Mp - M), np.float32)],
            axis=1)
    # DMA slab shapes must be sublane-aligned (multiple-of-8 rows).
    pad_c = (-packed.shape[0]) % 8
    if pad_c:
        packed = np.concatenate(
            [packed, np.zeros((pad_c, Mp), np.float32)])
    if gather_layout == "bm":
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        gb = _slab_block(FitConfig.screen_block if screen_block is None
                         else screen_block, tile, interpret)
        C = packed.shape[0]
        packed = np.ascontiguousarray(
            packed.reshape(C, Mp // gb, gb).swapaxes(0, 1)
        ).reshape(Mp // gb * C, gb)
    elif gather_layout != "cm":
        raise ValueError(f"unknown gather_layout {gather_layout!r}")
    maskrow = np.zeros((1, Mp), np.float32)
    maskrow[0, n_real:] = -1e30
    return (screen_tab, jnp.asarray(packed), tuple(names), n_real,
            jnp.asarray(maskrow))


def gather_table_columns(packed, Mp):
    """View a `prepare_screen` gather table as column-major `(C, Mp)`
    regardless of its physical layout (host-side inspection helper;
    the kernels consume the physical layout directly)."""
    import numpy as np
    p = np.asarray(packed)
    if p.shape[1] == Mp:
        return p
    gb = p.shape[1]
    C = p.shape[0] // (Mp // gb)
    return np.ascontiguousarray(
        p.reshape(Mp // gb, C, gb).swapaxes(0, 1)).reshape(C, Mp)


@partial(jax.jit, static_argnames=("nb", "block", "approx"))
def _select_blocks(bscore, nb, block, approx=False):
    """Per-star top-`nb` score blocks of `block` models each
    (`bscore` is the `(B, Mp // block)` per-block score maxima the
    screening kernel emits).

    Block-level selection (max score per block) instead of exact
    model-level top-k: XLA's general gather runs at ~1 us per slice on
    this TPU regardless of slice size, so per-model gathers of the
    shortlist cost more than the entire screened fit.  Contiguous
    `block`-wide slabs move through the DMA gather kernel at memory
    bandwidth instead, and on real (label-ordered) grids the
    high-likelihood models cluster into contiguous bands anyway, so
    block selection *improves* effective recall at fixed P.

    `approx` replaces the exact `top_k` (a full sort — 1.2 ms/batch of
    the round-4 device trace) with `approx_max_k` at a high recall
    target over the block-maxima plane (`FitConfig.screen_select`).
    """
    B = bscore.shape[0]
    if approx:
        _, bidx = lax.approx_max_k(bscore, nb, recall_target=0.99)
    else:
        _, bidx = lax.top_k(bscore, nb)
    bidx = bidx.astype(jnp.int32)
    idx = (bidx[:, :, None] * block
           + jnp.arange(block, dtype=jnp.int32)[None, None, :]
           ).reshape(B, nb * block)
    return bidx, idx


def _select_blocks_sharded(bscore, nb, block, model_axis, n_shards):
    """Cross-shard top-`nb` block selection for the model-sharded
    funnel (called inside `shard_map`; `bscore` is the LOCAL
    `(B, M_local // block)` per-block screening score maxima).

    Each shard ranks its own blocks, the per-shard candidates are
    `all_gather`ed over the `model` mesh axis (`n_shards * nb` block
    scores + GLOBAL block ids — a few kB, rides ICI), and every shard
    re-ranks the union to the same global top-`nb`.  Returns
    `(bidx_global (B, nb), idx_global (B, P), mine (B, nb))` where
    `mine` marks the blocks this shard owns (for the local slab
    gather + psum merge).
    """
    B, nblocks_l = bscore.shape
    nb_l = min(nb, nblocks_l)
    bsc, bix = lax.top_k(bscore, nb_l)
    s_idx = lax.axis_index(model_axis)
    bix_g = bix.astype(jnp.int32) + s_idx * nblocks_l
    # (B, n_shards * nb_l) candidate union, identical on every shard.
    cand_sc = lax.all_gather(bsc, model_axis, axis=1, tiled=True)
    cand_ix = lax.all_gather(bix_g, model_axis, axis=1, tiled=True)
    _, sel = lax.top_k(cand_sc, nb)
    bidx = jnp.take_along_axis(cand_ix, sel, axis=1)
    idx = (bidx[:, :, None] * block
           + jnp.arange(block, dtype=jnp.int32)[None, None, :]
           ).reshape(B, nb * block)
    lo = s_idx * nblocks_l
    mine = (bidx >= lo) & (bidx < lo + nblocks_l)
    return bidx, idx, mine


@lru_cache(maxsize=32)
def _make_gather_call(C, Mp, B, nb, block, interpret, src_bm=False,
                      n_coef=None):
    """DMA slab-gather kernel: `out[:, b, j*block:(j+1)*block] =
    packed[:, bidx[b, j]*block : +block]`.

    One program per star; each issues its `nb` HBM->HBM slab copies
    through a ring of `NSEM` in-flight DMAs.  ~50x faster than XLA's
    gather lowering for this access pattern.

    `src_bm`: the source is BLOCK-MAJOR `(Mp // block * C, block)`
    (see `prepare_screen`), so each slab read is one contiguous
    `C * block * 4`-byte chunk instead of `C` strided rows.

    `n_coef`: when set (the 3F coefficient row count) the slab is
    SPLIT into two outputs — coeff rows `(n_coef, B*P)` and aux rows
    `(C - n_coef, B*P)` — with one DMA each per slab.  Both pallas
    outputs are layout-pinned row-major, so the downstream reshape of
    the coeff table to the fit kernel's `(3, F, B, P)` operand is a
    pure bitcast; emitting ONE `(C, B*P)` output instead left XLA a
    row-slice + two layout copies between the gather and fit
    custom-calls (~1.5 ms/batch of the round-5 device trace).
    """
    NSEM = min(8, nb)
    P = nb * block
    split = n_coef is not None and 0 < n_coef < C

    parts = (((0, n_coef), (n_coef, C)) if split else ((0, C),))

    def kernel(bidx_ref, src_ref, *out_refs):
        b = pl.program_id(0)

        def body(sems):
            def get_dma(j, part):
                # part 0: coeff rows [0, n_coef); part 1: aux rows
                # [n_coef, C) (or the whole slab when not splitting).
                # `part` is a PYTHON int (the per-slab loop body is
                # unrolled over parts), so the row slice is static.
                i = bidx_ref[b, j]
                r0, r1 = parts[part]
                nr = r1 - r0
                # 2-D (rows, B*P) output: every slab is a lane-aligned
                # (rows, block) slice (a 3-D layout would put B in the
                # tiled sublane dim, where size-1 slices are illegal).
                if src_bm:
                    src = src_ref.at[pl.ds(i * C + r0, nr), :]
                else:
                    src = src_ref.at[pl.ds(r0, nr),
                                     pl.ds(i * block, block)]
                return pltpu.make_async_copy(
                    src,
                    out_refs[part].at[:, pl.ds(b * P + j * block,
                                               block)],
                    sems.at[j % NSEM, part])

            def issue(j, c):
                @pl.when(j >= NSEM)
                def _():
                    for part in range(len(parts)):
                        get_dma(j - NSEM, part).wait()
                for part in range(len(parts)):
                    get_dma(j, part).start()
                return c

            lax.fori_loop(0, nb, issue, 0)

            def drain(j, c):
                for part in range(len(parts)):
                    get_dma(j, part).wait()
                return c

            lax.fori_loop(max(nb - NSEM, 0), nb, drain, 0)

        pl.run_scoped(body,
                      pltpu.SemaphoreType.DMA((NSEM, len(parts))))

    if split:
        out_shape = [jax.ShapeDtypeStruct((n_coef, B * P), jnp.float32),
                     jax.ShapeDtypeStruct((C - n_coef, B * P),
                                          jnp.float32)]
        out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
    else:
        out_shape = jax.ShapeDtypeStruct((C, B * P), jnp.float32)
        out_specs = pl.BlockSpec(memory_space=pl.ANY)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )


@jax.jit
def _screen_parallax(parallax, parallax_err):
    ok = (jnp.isfinite(parallax) & jnp.isfinite(parallax_err)
          & (parallax_err > 0))
    plx = jnp.where(ok, parallax, 0.0)
    plxw = jnp.where(ok, 1.0 / jnp.where(ok, parallax_err, 1.0) ** 2, 0.0)
    return plx, plxw


@partial(jax.jit, static_argnames=("n_coef", "B"))
def _unpack_split(out, n_coef, B):
    """Reshape the slab gather's output(s) for the fit kernel — pure
    bitcasts when the gather emitted coeff and aux rows as separate
    layout-pinned outputs (see `_make_gather_call(n_coef=...)`); falls
    back to the row-slice unpack for a single combined output (the
    split is only legal when `n_coef % 8 == 0` — Mosaic HBM slices
    need sublane-aligned row offsets/counts)."""
    if isinstance(out, (tuple, list)):
        out_c, out_a = out
    else:
        out_c, out_a = out[:n_coef], out[n_coef:]
    BP = out_c.shape[1]
    P = BP // B
    coeffs = out_c.reshape(n_coef, B, P)
    aux = out_a.reshape(out_a.shape[0], B, P)
    return coeffs, aux


def loglike_grid_screened(flux, fluxerr, mask, screen_tab, packed,
                          maskrow,
                          n_real, parallax=None, parallax_err=None,
                          cfg: FitConfig = FitConfig(), tile=512,
                          screen_k=16384, screen_block=256,
                          aux_names=(), interpret=None, stop_after=None,
                          model_axis=None, n_model_shards=1):
    """Funnel likelihood: screen all M models, fully fit the top-P.

    Stage 1 scores every model with a direct magnitude-space 3x3 WLS
    solve (+ parallax chi2) — the ranking quantity of the reference's
    init-threshold cull (`brutus/fitting.py:743-768`).  Stage 2 runs
    the full two-phase kernel on the gathered per-star shortlists
    (top `screen_k // screen_block` blocks of `screen_block`
    contiguous models each — see `_select_blocks`), so ~98% of the
    optimizer FLOPs are spent only on models that can actually survive
    the posterior culls.

    Returns the `loglike_grid_fused` dict with `(B, P)` fields plus
    `global_idx` (the (B, P) shortlist -> grid index map) and `aux`
    (dict of the gathered per-star columns from `prepare_screen`,
    `(B, P)` each).

    Model-sharded mode (`model_axis` set, called inside `shard_map`):
    `screen_tab`/`packed`/`maskrow` are this shard's slice of the grid
    (contiguous global chunk `[s*M_local, (s+1)*M_local)`) and `n_real`
    the GLOBAL real model count.  Each shard screens its own models,
    the block shortlists merge across the mesh `model` axis
    (`_select_blocks_sharded`), each shard slab-gathers the selected
    blocks it owns, and one `psum` assembles the full per-star
    shortlist on every shard (each slab has exactly one owner).  The
    shortlist fit then runs shard-redundantly (cheap; it keeps the
    posterior stage collective-free).  SURVEY §2's tensor-parallel
    requirement for grids beyond per-chip HBM.
    """
    B, F = flux.shape
    tab_w, tab_c = screen_tab
    M = tab_w.shape[-1] // N_SCREEN_W
    dtype = jnp.float32        # screen tables are bf16; compute is f32
    flux = flux.astype(dtype)
    fluxerr = fluxerr.astype(dtype)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Slab granularity must tile both the screening tiles and Mp, and
    # (on hardware) be lane-aligned for the DMA slab copies.
    block = _slab_block(screen_block, tile, interpret)
    # Gather-table layout, inferred from `packed`'s shape (see
    # `prepare_screen`): block-major tables must have been built for
    # exactly this slab width.  (When M == block the two layouts
    # coincide bit-for-bit and either branch is correct.)
    src_bm = packed.shape[1] != M
    if src_bm:
        if packed.shape[1] != block:
            raise ValueError(
                f"block-major gather table was prepared for slab "
                f"width {packed.shape[1]} but this call selects "
                f"{block}-wide slabs; pass the same screen_block/tile "
                f"to prepare_screen and loglike_grid_screened")
        C_pack = packed.shape[0] // (M // block)
    else:
        C_pack = packed.shape[0]
    # Sharded mode: M is the LOCAL model count; the shortlist width is
    # still capped by the GLOBAL grid.
    nb = max(1, min(screen_k // block, (M * n_model_shards) // block))
    P = nb * block
    tile2 = tile
    while P % tile2:
        tile2 //= 2

    Bp = -(-B // GROUP) * GROUP
    if Bp != B:
        pad = ((0, Bp - B), (0, 0))
        flux = jnp.pad(flux, pad)
        fluxerr = jnp.pad(fluxerr, pad, constant_values=1.0)
        mask = jnp.pad(mask, pad, constant_values=False)

    flux_p, wt_flux, mags, wt_mag, mask, ndim, tot_var = _prep(
        flux, fluxerr, mask, cfg)
    if parallax is None:
        parallax = jnp.full((Bp,), jnp.nan, dtype)
        parallax_err = jnp.full((Bp,), jnp.nan, dtype)
    else:
        parallax = jnp.pad(jnp.broadcast_to(
            jnp.asarray(parallax, dtype), (B,)), (0, Bp - B),
            constant_values=jnp.nan)
        parallax_err = jnp.pad(jnp.broadcast_to(
            jnp.asarray(parallax_err, dtype), (B,)), (0, Bp - B),
            constant_values=jnp.nan)
    plx, plxw = _screen_parallax(parallax, parallax_err)

    grp = lambda x: x.reshape(Bp // GROUP, GROUP, F).swapaxes(1, 2)
    # MXU screening: stars in sublanes (padded to the sublane quantum).
    Bs = -(-Bp // 8) * 8
    n_g = tab_w.shape[0]
    fp = n_g * SCREEN_FP
    wb, cb, srow = _screen_star_mats(mags, wt_mag, plx[:, None],
                                     plxw[:, None], Bs - Bp, fp)
    screen = _make_screen_call(cfg, Bs, M, tile, n_g, "float32",
                               interpret, block)
    # (num_tiles, Bs, tile//block) -> (Bs, M//block) block maxima.
    bscore = screen(wb, cb, srow, maskrow, tab_w, tab_c)
    bscore = jnp.swapaxes(bscore, 0, 1).reshape(Bs, M // block)
    if Bs != Bp:
        bscore = bscore[:Bp]
    if stop_after == "screen":     # bench --breakdown probe
        return bscore

    n_coef = 3 * F
    # Split coeff/aux gather outputs only when the boundary is
    # sublane-aligned: Mosaic HBM memref slices need multiple-of-8 row
    # offsets AND counts (at F=49 n_coef=147 — unsplittable; the
    # single-output path's row-slice unpack handles it).
    has_aux = (C_pack > n_coef and n_coef % 8 == 0 and C_pack % 8 == 0)
    if model_axis is None:
        bidx, idx = _select_blocks(bscore, nb, block,
                                   approx=(cfg.screen_select == "approx"
                                           and not interpret))
        gather = _make_gather_call(C_pack, M, Bp, nb, block,
                                   interpret, src_bm,
                                   n_coef=n_coef if has_aux else None)
        slabs = gather(bidx, packed)
    else:
        bidx, idx, mine = _select_blocks_sharded(bscore, nb, block,
                                                 model_axis,
                                                 n_model_shards)
        # Gather locally (clamped ids for non-owned slots), zero the
        # slots this shard doesn't own, and merge: every slab has
        # exactly one owner, so the psum is a scatter-free union.
        bidx_l = jnp.where(mine, bidx - lax.axis_index(model_axis)
                           * (M // block), 0)
        gather = _make_gather_call(C_pack, M, Bp, nb, block,
                                   interpret, src_bm,
                                   n_coef=n_coef if has_aux else None)
        slabs = gather(bidx_l, packed)
        keepf = jnp.broadcast_to(mine[:, :, None],
                                 (Bp, nb, block)).reshape(1, Bp * nb
                                                          * block)
        kf = keepf.astype(jnp.float32)
        slabs = jax.tree_util.tree_map(
            lambda s: lax.psum(s * kf, model_axis), slabs)
    coeffs2, aux = _unpack_split(slabs, n_coef, Bp)
    if stop_after == "gather":     # bench --breakdown probe
        return coeffs2, aux, idx

    use_stacked = (cfg.kernel_pack and has_aux and bool(aux_names)
                   and M * n_model_shards < 2 ** 24)
    if use_stacked:
        # Pack-ready stacked kernel output (see `_make_kernel`): the
        # `_post` epilogue runs in-kernel from per-star constants, the
        # aux/global-index rows ride along, and the posterior's
        # prefilter pack gathers straight from this buffer
        # (`posterior._select_stage` `pack_rows` path) — no XLA
        # restack/relayout/deinterleave between the two kernels.
        n_aux = len(aux_names)
        n_auxp = aux.shape[0]
        n_rows = -(-(11 + n_aux + 1) // 8) * 8
        mask_nr = n_real if n_real < M else None
        ndim_f = ndim.astype(jnp.float32)
        halfdf = (ndim_f - 3.0) / 2.0
        safe_var = jnp.where(mask, tot_var, 1.0)
        const = -0.5 * (ndim_f * LN2PI
                        + jnp.sum(jnp.log(safe_var) * mask, axis=1))
        srow = jnp.zeros((Bp, 8), jnp.float32)
        srow = srow.at[:, 0].set(const)
        srow = srow.at[:, 1].set(-(halfdf * math.log(2.0)
                                   + gammaln(halfdf)))
        srow = srow.at[:, 2].set(halfdf - 1.0)
        gidx_f = idx.astype(jnp.float32)
        call = _make_call(cfg, Bp, F, P, tile2, "float32", interpret,
                          per_star=True,
                          stacked=(n_aux, n_rows, mask_nr),
                          n_auxp=n_auxp)
        out, = call(grp(flux_p), grp(wt_flux), grp(mags), grp(wt_mag),
                    coeffs2, aux, gidx_f, srow)
        if Bp != B:
            out, idx, ndim = out[:B], idx[:B], ndim[:B]
        res = dict(lnlike=out[:, 0, :], ndim=ndim, chi2=out[:, 1, :],
                   scale=out[:, 2, :], av=out[:, 3, :],
                   rv=out[:, 4, :],
                   icov_parts=tuple(out[:, 5 + i, :] for i in range(6)))
        res["global_idx"] = idx
        res["aux"] = {name: out[:, 11 + i, :]
                      for i, name in enumerate(aux_names)}
        # `pack_rows` is a plain array leaf (safe through any user
        # jit/vmap); the static row-name map is derived by the caller
        # via `pack_row_names(aux_names)` and passed to `lnpost_batch`.
        res["pack_rows"] = out
        return res

    call = _make_call(cfg, Bp, F, P, tile2, "float32", interpret,
                      per_star=True)
    outs = call(grp(flux_p), grp(wt_flux), grp(mags), grp(wt_mag), coeffs2)
    if Bp != B:
        outs = [o[:B] for o in outs]
        mask, ndim, tot_var = mask[:B], ndim[:B], tot_var[:B]
        idx, aux = idx[:B], aux[:, :B]
    # Tile-padding models inside selected slabs are all-zero rows that
    # can fit well; kill them by global index.
    res = _post(tuple(outs), mask, ndim, tot_var, cfg, n_real=None,
                bad=(idx >= n_real) if n_real < M else None)
    res["global_idx"] = idx
    res["aux"] = {name: aux[i] for i, name in enumerate(aux_names)}
    return res


def pack_row_names(aux_names):
    """Static row-name map of the funnel kernel's stacked pack output
    (`FitConfig.kernel_pack`): the 11 fit fields, the aux rows in
    `aux_names` order, then the global model index.  Pass to
    `posterior.lnpost_batch(pack_names=...)` alongside a results dict
    carrying `pack_rows` to let the prefilter pack gather straight
    from the kernel output."""
    return ("lnlike", "chi2", "scale", "av", "rv",
            "i00", "i11", "i22", "i01", "i02", "i12",
            *aux_names, "gidx")


__all__ = ["loglike_grid_fused", "loglike_grid_screened",
           "prepare_coeffs", "prepare_screen", "pack_row_names"]
