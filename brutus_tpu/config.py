"""
Typed configuration objects.

The reference configures everything through keyword arguments with
scientific defaults scattered across call sites (e.g. `fitting.py:579-585`,
`fitting.py:1426-1437`).  Here the defaults are centralized into frozen
(hashable) dataclasses so they can be passed as static arguments to
jitted functions.  Every default value preserves the reference's.
"""

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """Controls the per-star likelihood optimization.

    Parity: defaults follow reference `brutus/fitting.py:579-585` and
    `brutus/fitting.py:34-40` (mag phase), `274-278` (flux phase),
    `430-433` (MLE expansion).
    """

    # Bounds + Gaussian priors on extinction parameters.
    avlim: tuple = (0.0, 20.0)
    av_gauss: tuple = (0.0, 1e6)       # essentially flat over avlim
    rvlim: tuple = (1.0, 8.0)
    rv_gauss: tuple = (3.32, 0.18)     # Schlafly et al. (2016)

    # Regularization inside the MLE re-expansion (fitting.py:433).
    av_reg: float = 0.05
    rv_reg: float = 0.1

    # Convergence controls (fitting.py:583).
    ltol: float = 3e-2                 # flux-phase weighted log-like tol
    ltol_subthresh: float = 1e-2       # subset threshold for convergence
    init_thresh: float = 5e-3          # post-mag-fit cull threshold
    apply_init_cull: bool = True       # None-equivalent switch in reference

    # Dimensionality prior: lnl -> chi2 logpdf with Ndim-3 dof.
    dim_prior: bool = True

    # Clamp on the MLE flux scale (fitting.py:517-518).
    scale_min: float = 1e-20

    # Loop safety bounds (the reference iterates unboundedly; these are
    # generous static caps for `lax.while_loop`).
    max_iter_mag: int = 100
    max_iter_flux: int = 100

    # Stepsize damping factor when the log-likelihood decreases
    # (fitting.py:779 `rescaling = 1.2`).
    stepsize_rescale: float = 1.2

    # Initial guesses (fitting.py:700-703 defaults to the prior means).
    av_init: float = None              # default: av_gauss[0]
    rv_init: float = None              # default: rv_gauss[0]

    # Restrict the flux-space polish loop to the top `polish_k` models
    # by post-magnitude-phase likelihood (gathered to a fixed-size
    # block, scattered back), mirroring the reference's init-threshold
    # cull (fitting.py:743-768).  Disabled by default: on TPU the
    # gather/scatter of the coefficient block costs more than the dense
    # flux loop saves (measured 60 vs 86 stars/s on a 750k grid), but
    # the option wins on gather-friendly backends and small-memory
    # settings.  0 = dense polish.
    polish_k: int = 0

    # Seed the alternating magnitude-phase solves with
    # one direct 3x3 weighted least-squares solve of
    # (mu-offset, Av, Av*Rv) per model (a batched closed-form 3x3
    # inverse), which cuts the iteration count several-fold.  The
    # alternating loop still runs to the same tolerance afterwards, so
    # converged results are unchanged; disable for strict step-by-step
    # parity with the reference trajectory.  Affects the XLA engine
    # only: the fused Pallas kernel ALWAYS direct-seeds, because its
    # fixed iteration budgets (below) are sized assuming the seed —
    # without it some stars exhaust the budget under-converged
    # (round 2's multi-nat cross-engine evidence divergence).
    # `BruteForce.fit` defaults this ON (production path); the bare
    # default here stays False so `loglike_grid` keeps reference
    # semantics for oracle golden tests.
    mag_direct_init: bool = False

    # Large-but-float32-safe stand-in for the reference's 1e50 variance
    # flag on unusable magnitudes (fitting.py:725).
    big_var: float = 1e30

    # Fused-kernel iteration budget: the Pallas engine runs a FIXED,
    # fully unrolled number of magnitude-phase and flux-phase updates
    # per model (with per-model freeze masks) instead of the XLA path's
    # `lax.while_loop` convergence predicate.  A data-dependent `cond`
    # inside a Mosaic kernel costs a vector->scalar reduction + branch
    # stall every iteration (~2 us), which dominated the kernel; the
    # budgets below exceed the iteration counts ever observed at
    # convergence on the XLA path (<=6 mag, <=5 flux with direct init).
    kernel_mag_iters: int = 6
    kernel_flux_iters: int = 6

    # Two-stage funnel (fused engine): a cheap screening kernel scores
    # every model with a direct magnitude-space 3x3 WLS solve (+
    # parallax chi2 — the reference's init-cull ranking quantity,
    # fitting.py:743-768), and the full two-phase optimization then
    # runs only on the top `screen_k` models per star.  ~95% of the
    # optimizer FLOPs (and ALL full-grid posterior gathers) disappear;
    # models outside the shortlist could never have survived the
    # posterior's relative-weight culls.  0 disables (dense fit).
    # Sized for worst-star recall on CORRELATED (real SEDmaker) grids:
    # at block=256, screen_k=8192 leaves worst-star posterior-mass
    # recall at 0.818 while 12288 reaches 0.960 and true-model-on-list
    # 1.00 (RECALL.json, 758k-model grid, 64 stars); measured cost on
    # one v5e chip was 6157 -> 5241 stars/s (-15%) — the cheapest
    # qualifying (>= 0.95 worst-star) configuration of the sweep
    # (12288/128: 0.986 at 5026; 10240/128: 0.963 at 5092).
    #
    # END-TO-END funnel-vs-dense A/B (FUNNEL_AB.json, round 5; same
    # 128-star batch, 750k models, MC normals pinned so deltas isolate
    # shortlist loss):
    #   * uncorrelated (iid) grid — the funnel at this default is
    #     LOSSLESS: worst-star dist delta 0.05%, logz delta 0.001
    #     nats, both far below the MC noise floor (0.55% / 0.06).
    #   * deliberately DEGENERATE lattice (thousands of near-identical
    #     models, the worst case for any shortlist) — worst-star dist
    #     delta 7.6% / logz 3.9 nats at 12288; 3.2% / 3.1 at 24576;
    #     p90 0.67% / 0.15 at 49152.  block=128 does NOT help end to
    #     end (7.7% / 4.4 — the shortlist-mass recall metric that
    #     favored it conflated dropped duplicate mass with posterior
    #     effect), so 256 stays.  On such grids much of the logz
    #     delta is duplicated likelihood mass the shortlist cannot
    #     keep; raise `screen_k` (2-4x) when fitting grids with
    #     near-duplicate models AND absolute evidences matter.
    screen_k: int = 12288

    # Screening-score variant (diagnostic / experimental):
    #   "full"      — the production clamped 3x3 WLS chi2 (+ parallax).
    #   "debug_lin" — a meaningless linear combination of all nine
    #                 bilinear sums; same matmuls, ~no VPU score math.
    #                 Used to attribute screen wall time between the
    #                 MXU/HBM streaming and the per-(star, model) VPU
    #                 solve (bench --screen-score debug_lin).
    screen_score: str = "full"

    # Screening-matmul issue shape:
    #   "wide"  — one (B,48)@(48,6T) + one (B,96)@(96,3T) per tile
    #             (v4; minimizes dispatch count).
    #   "split" — nine INDEPENDENT per-term dots per tile.  The v2->v3
    #             history implies independent narrow dots stream
    #             columns in parallel across the chip's MXUs (v2's 72
    #             narrow passes ran ~4 Gcol/s; v3's wide pair ~0.75),
    #             while a single wide dot serializes on one MXU.
    screen_matmul: str = "split"

    # Funnel block-shortlist selection op:
    #   "exact"  — `lax.top_k` over the (B, M/block) block maxima (a
    #              full sort; 1.2 ms/batch of the round-4 16.8 ms
    #              device budget).
    #   "approx" — `lax.approx_max_k` (TPU PartialReduce) at recall
    #              target 0.99 over block maxima.  Block-level recall
    #              loss only touches mid-rank blocks whose posterior
    #              mass is already marginal; measured end to end
    #              before shipping (see FUNNEL_AB.json / README).
    screen_select: str = "exact"

    # Funnel shortlist selection granularity: models are selected as
    # contiguous `screen_block`-wide slabs (the screening kernel emits
    # per-block score maxima; the gather stage moves whole slabs at
    # memory bandwidth).  Narrower blocks raise worst-star shortlist
    # MASS recall at fixed `screen_k` (more, smaller slabs track the
    # ridge of the chi2 landscape more tightly — see RECALL.json) for
    # slightly more gather/selection work, but the round-5 END-TO-END
    # A/B (FUNNEL_AB.json) showed no posterior/evidence benefit from
    # 128 vs 256 even on the degenerate worst-case lattice — the extra
    # mass 128 retains is near-duplicate models that don't move the
    # posterior.  On TPU hardware the fused path clamps to >= 128
    # (DMA lane alignment).
    screen_block: int = 256

    # Funnel fit kernel emits ONE pack-ready (B, n_rows, P) output
    # (lnl/chi2/scale/av/rv/6 precision parts + aux rows + global
    # index, with the Gaussian-constant/dim-prior epilogue applied
    # in-kernel) instead of 11 separate planes — the prefilter pack
    # then gathers straight from the kernel output (a bitcast handoff)
    # with no XLA restacking (~1.7 ms/batch of update-slice/relayout
    # fusions on the round-5 device trace).  Auto-disabled when the
    # gather outputs can't split coeff/aux on a sublane boundary
    # (F=49) or the global grid exceeds f32-exact indexing (2^24).
    kernel_pack: bool = True

    @property
    def mtol(self):
        """Mag-phase tolerance, `2.5 * ltol` (fitting.py:732)."""
        return 2.5 * self.ltol

    @property
    def av0(self):
        return self.av_gauss[0] if self.av_init is None else self.av_init

    @property
    def rv0(self):
        return self.rv_gauss[0] if self.rv_init is None else self.rv_init


@dataclasses.dataclass(frozen=True)
class PosteriorConfig:
    """Controls the Monte-Carlo posterior integration + resampling.

    Parity: defaults follow reference `brutus/fitting.py:823-827` and
    `brutus/fitting.py:1426-1437`.
    """

    n_mc_prior: int = 50               # MC draws per model (fit() default)
    wt_thresh: float = 1e-3            # relative-weight cull threshold
    cdf_thresh: float = 2e-3           # CDF cull (used when wt_thresh None)
    n_draws: int = 250                 # posterior realizations saved
    avlim: tuple = (0.0, 20.0)
    rvlim: tuple = (1.0, 8.0)
    # Fixed-size top-k replacing the reference's dynamic memory cap
    # Nsel_max = mem_lim / Nmc_prior / 4e-4 (fitting.py:968-970).  A dense
    # TPU program needs a static shape; 2048 models retains far more
    # posterior mass than the reference's 1e-3 relative-weight cutoff
    # (the reference's own default memory cap truncates to the top ~400
    # models: mem_lim=8000, Nmc_prior=50).  Measured exactly lossless vs
    # 4096 on a full-size correlated SEDmaker grid — zero deltas in
    # log-evidence and posterior medians over 32 stars; the cull
    # survivor count there maxes at 1643 (scratch/nsel_accuracy.py) —
    # and worth +28% full-fit throughput (bench --nsel 2048).
    n_sel_max: int = 2048
    apply_av_prior: bool = True
    apply_dlabels: bool = True
    # Likelihood-rank prefilter applied before the (expensive) Galactic
    # and dust priors are evaluated.  The reference's cull #1
    # (fitting.py:987-997) already guarantees models far below the
    # maximum likelihood cannot survive, so evaluating priors for the
    # top `prefilter_k` candidates only (selected with the TPU-optimized
    # `approx_max_k`) is equivalent up to the reference's own memory-cap
    # truncation.  When equal to `n_sel_max` (the default) the prefilter
    # IS the top-K selection and the exact in-between sort is skipped —
    # post-prior culls then only mask, never reorder, which matches the
    # reference semantics whenever <= n_sel_max models survive cull #1
    # (see README divergences).  Set to 0 to disable.
    prefilter_k: int = 2048
    # Prefilter ranking-key precision.  At `prefilter_k / shortlist`
    # ratios like 2048/12288, `approx_max_k`'s TPU PartialReduce
    # lowering falls back to a FULL variadic sort (1.16 ms/batch of
    # the round-5 device trace).  With this flag the sort key is the
    # per-star max-shifted log-probability cast to bf16 (half the
    # sort bandwidth): after the shift the interesting range is
    # [-30, 0] where bf16 resolves ~0.1 nats — candidates that close
    # at the rank-2048 boundary are interchangeable (the cull
    # thresholds re-apply exactly afterwards, and the prefilter
    # already runs at recall_target=0.95).  The selected VALUES are
    # still gathered at full f32 from the pack; only the ranking key
    # is quantized.
    prefilter_bf16: bool = True
    # Prefilter selection granularity: pick `prefilter_k / block` BLOCKS
    # of `block` consecutive shortlist slots (ranked by block-max) instead
    # of `prefilter_k` single candidates.  The prefilter's field-pack
    # gather is slice-RATE bound on TPU (262k single-row slices = 1.9
    # ms/batch of the round-5 device trace); block granularity cuts the
    # slice count by `block`x and shrinks the ranking sort the same way.
    # The shortlist is screen-block-ordered, so block selection trades
    # slots for grid-adjacent neighbours of high-rank candidates.
    # MEASURED AND REJECTED as a default (scratch/
    # prefilter_block_recall.py, RECALL.json "prefilter_block"): on the
    # correlated SEDmaker grid the cull-survivor set spreads over more
    # distinct blocks than K1/blk covers — worst-star posterior-mass
    # recall collapses 0.960 -> 0.871 (blk=4) -> 0.609 (blk=8), echoing
    # the round-3 subsampled-screen rejection: the lnprob landscape is
    # sharp at single-model granularity.  1 = exact single-candidate
    # selection (the only survey-safe setting on correlated grids).
    prefilter_block: int = 1
    # PSD repair (fitting.py:1042-1065): escalating diagonal Gaussian
    # priors, doubled each pass; fixed pass count for static control flow.
    psd_width: float = 0.02
    psd_max_passes: int = 8
    # Diagnostic-only knockouts for in-pipeline cost attribution
    # (comma-set, e.g. "gal,dust"): skips that prior IN PLACE in the
    # select stage.  Results are scientifically wrong; never set in
    # production (scratch/profile_select_knockout.py).
    debug_skip: str = ""
    # Ride the local->grid index map through the prefilter pack as an
    # f32 field (saves the most expensive gather of the select stage,
    # see ops/posterior.py).  f32 represents integers exactly only
    # below 2**24 (~16.7M models); `BruteForce.fit` auto-disables this
    # when the grid exceeds that, falling back to the explicit int
    # gather so indices are never silently rounded.
    pack_gidx_f32: bool = True
    mvn_eps: float = 1e-30             # Cholesky jitter (utils.py:845)
    # Generate the MC draws inside the fused kernel (Box-Muller from
    # the TPU hardware PRNG) instead of feeding threefry normals in:
    # skips the normal generation and a (B, 3, NMC_PAD, K) HBM round
    # trip.  Draw-level results then differ from `lnpost_grid` (same
    # distribution; the stateless-RNG divergence already applies vs
    # the reference).  Ignored in interpret mode (no `prng_seed`
    # there) — CPU runs always use the threefry path.
    kernel_rng: bool = True


@dataclasses.dataclass(frozen=True)
class GalPriorConfig:
    """Galactic 3-D prior parameters.

    Parity: reference `brutus/pdf.py:476-486` defaults (thin/thick disk +
    halo number density, metallicity and age mixtures), themselves based
    on Bland-Hawthorn & Gerhard (2016).
    """

    R_solar: float = 8.2
    Z_solar: float = 0.025
    R_thin: float = 2.6
    Z_thin: float = 0.3
    Rs_thin: float = 2.0
    R_thick: float = 2.0
    Z_thick: float = 0.9
    f_thick: float = 0.04
    Rs_thick: float = 2.0
    Rs_halo: float = 2.0
    q_halo_ctr: float = 0.2
    q_halo_inf: float = 0.8
    r_q_halo: float = 6.0
    eta_halo: float = 4.2
    f_halo: float = 0.005
    feh_thin: float = -0.2
    feh_thin_sigma: float = 0.3
    feh_thick: float = -0.7
    feh_thick_sigma: float = 0.4
    feh_halo: float = -1.6
    feh_halo_sigma: float = 0.5
    max_age: float = 13.8
    min_age: float = 0.0
    feh_age_ctr: float = -0.5
    feh_age_scale: float = 0.5
    nsigma_from_max_age: float = 2.0
    max_sigma: float = 4.0
    min_sigma: float = 1.0


@dataclasses.dataclass(frozen=True)
class DustPriorConfig:
    """3-D dust prior knobs (reference `brutus/pdf.py:752-754`)."""

    offset: float = 0.0
    scale: float = 1.0
    smooth: float = 1.0
    scatter: float = 0.2


LN2PI = math.log(2.0 * math.pi)

__all__ = ["FitConfig", "PosteriorConfig", "GalPriorConfig",
           "DustPriorConfig", "LN2PI"]
