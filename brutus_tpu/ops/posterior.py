"""
Posterior integration and resampling for one star.

Parity: reference `brutus/fitting.py:823-1107` (`lnpost`) plus the
resampling tail of `BruteForce._fit` (`brutus/fitting.py:2024-2061`).

TPU-first redesign of the reference's dynamic-shape pipeline:
  * The two relative-weight culls become masks.
  * The dynamic memory cap (`Nsel_max = mem_lim/Nmc/4e-4`,
    fitting.py:968-970) becomes a fixed-size `lax.top_k` selection of
    the `n_sel_max` best models — everything downstream is dense
    `(K,)` / `(K, Nmc)` tensors.
  * The PSD-repair `while` loop (fitting.py:1042-1065) becomes a fixed
    number of masked escalation passes with a branch-free 3x3
    positive-definiteness test.
  * numpy RNG draws become stateless `jax.random` calls (threefry).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from ..config import PosteriorConfig, GalPriorConfig, DustPriorConfig
from ..utils import (psd_repair_parts, cholesky3_parts, sym3_from_parts)
from ..priors import (gal_lnprior, dust_lnprior, parallax_lnprior,
                      scale_parallax_lnprior)

NEG_BIG = -1e30

# NEG_BIG is deliberately finite (float32-safe), which means a bare
# `jnp.isfinite` test PASSES invalidated entries.  Every validity check
# must therefore also threshold: anything at or below VALID_MIN is a
# flag value, not a log-probability (real log-posteriors are > -1e6).
VALID_MIN = 0.5 * NEG_BIG


def _is_valid(x):
    """True where `x` is a real log-probability (finite and not a
    NEG_BIG flag)."""
    return jnp.isfinite(x) & (x > VALID_MIN)


def _categorical_cdf(key, logits, n):
    """`n` categorical draws by inverse-CDF sampling.

    Statistically identical to `jax.random.categorical` but ~10x
    cheaper on TPU: the gumbel construction materializes `(n, K)`
    noise (log+add) and argmax-reduces it, while the CDF inversion is
    one cumsum plus an `(n, K)` compare-and-count.  (Different use of
    the key than the gumbel version — draw-level results differ,
    distributions match.)
    """
    wt = jax.nn.softmax(logits)
    cdf = jnp.cumsum(wt)
    u = jax.random.uniform(key, (n,), logits.dtype) * cdf[-1]
    idx = jnp.sum(cdf[None, :] < u[:, None], axis=1)
    return jnp.clip(idx, 0, logits.shape[0] - 1).astype(jnp.int32)


def _cull_mask(lnp, wt_thresh, cdf_thresh, base_mask=None):
    """Relative-weight or CDF threshold culling mask.

    Parity: reference `brutus/fitting.py:987-997` / `:1012-1022`:
    either keep models within `wt_thresh` of the max weight, or (when
    `wt_thresh` is None) keep the models covering all but `cdf_thresh`
    of the cumulative probability.  NOTE: the reference accumulates the
    CDF over an *ascending* sort, which literally drops the
    highest-weight models; this implements the documented intent
    (descending sort: the smallest model set containing `1-cdf_thresh`
    of the posterior mass always includes the best model).
    """
    if base_mask is not None:
        lnp = jnp.where(base_mask, lnp, -jnp.inf)
    if wt_thresh is not None:
        # Floor the threshold above the NEG_BIG flag: when EVERY model
        # is invalid, max(lnp) + log(wt_thresh) < NEG_BIG and the naive
        # comparison would pass all of them (the round-2 real-Orion
        # degenerate-star bug).
        mask = lnp > jnp.maximum(jnp.max(lnp) + math.log(wt_thresh),
                                 VALID_MIN)
    else:
        order = jnp.argsort(-lnp)
        prob = jax.nn.softmax(lnp[order])
        cdf = jnp.cumsum(prob)
        keep_sorted = (cdf - prob) <= (1.0 - cdf_thresh)  # include crosser
        mask = jnp.zeros_like(keep_sorted).at[order].set(keep_sorted)
        mask = mask & (lnp > VALID_MIN)   # never keep NEG_BIG flags
    if base_mask is not None:
        mask = mask & base_mask
    return mask


# The escalating PSD repair (reference `brutus/fitting.py:1042-1065`)
# lives in `utils.psd_repair_parts` / `utils.cholesky3_parts`, shared
# verbatim by this module's XLA path and the fused MC kernel (which
# runs it in-kernel per model tile, skipping culled tiles) so the two
# paths remain bit-identical in interpret mode.


def _pack_usable(cfg: PosteriorConfig, M, pack_names, has_pack,
                 has_feh, has_loga):
    """Static predicate: can the select stage gather straight from the
    fit kernel's packed rows?  Requires the prefilter to BE the
    selection (merge_tail), model-granular selection (blk == 1), and
    every needed field present in the pack.  Shared by `_select_stage`
    and `lnpost_batch` (which derives the MC kernel's row map from the
    same answer)."""
    if not has_pack or pack_names is None:
        return False
    K = min(cfg.n_sel_max, M)
    K1 = cfg.prefilter_k
    if not (K1 and K1 < M) or K1 != min(K, K1):
        return False
    blk = max(1, cfg.prefilter_block)
    if M % blk or K1 % blk:
        blk = 1
    if blk != 1:
        return False
    if "lnprior" not in pack_names:
        return False
    if has_feh and "feh" not in pack_names:
        return False
    if has_loga and "loga" not in pack_names:
        return False
    return True


def _pack_row_map(pack_names):
    """MC-kernel table-row remap (see `pallas_mc._make_mc_kernel`
    `row_map`) for a kernel-packed table passed through untouched."""
    col = {n: i for i, n in enumerate(pack_names)}
    return (col["scale"], col["av"], col["rv"],
            col["i00"], col["i11"], col["i22"],
            col["i01"], col["i02"], col["i12"],
            col.get("feh", 0), col.get("loga", 0))


def _select_stage(results, lnprior_grid, coord,
                  parallax, parallax_err, feh, loga, dust_profile,
                  cfg: PosteriorConfig, gal_cfg: GalPriorConfig,
                  dust_cfg: DustPriorConfig, apply_av_prior,
                  lngalprior=None, lndustprior=None, global_idx=None,
                  pack_names=None):
    """Culls + priors + top-K selection + PSD repair — everything of
    `lnpost_grid` before the Monte-Carlo integration (reference
    `brutus/fitting.py:823-1065` + the chi2/Ndim bookkeeping of
    `:2024-2030`).  Shared by the XLA path (`lnpost_grid`) and the
    fused-kernel batch path (`lnpost_batch`)."""
    lnlike = results["lnlike"]
    chi2 = results["chi2"]
    scale = results["scale"]
    av = results["av"]
    rv = results["rv"]
    # Precisions arrive either assembled (XLA path, API parity) or as
    # their 6 unique components (fused path; avoids materializing a
    # (M, 3, 3) tensor before the top-k gather).
    icov_parts = results.get("icov_parts")
    icov = results.get("icov_sar")
    ndim = results["ndim"]
    dtype = lnlike.dtype
    M = lnlike.shape[0]
    K = min(cfg.n_sel_max, M)
    Nmc = cfg.n_mc_prior

    # --- rough parallax prior in scale space for clipping
    # (fitting.py:975-985) ---
    s_den0 = icov_parts[0] if icov_parts is not None else icov[:, 0, 0]
    scale_err = 1.0 / jnp.sqrt(jnp.abs(s_den0))
    lnprob = lnlike + scale_parallax_lnprior(scale, scale_err,
                                             parallax, parallax_err)
    lnprob = jnp.where(jnp.isfinite(lnprob), lnprob, NEG_BIG)
    lnprob_max = jnp.max(lnprob)

    # --- likelihood-rank prefilter: restrict the expensive prior
    # evaluations to the top candidates (see PosteriorConfig.prefilter_k;
    # models below cull #1's threshold can never survive anyway).  Only
    # the 7 fields the prior/cull stage reads are gathered at prefilter
    # width; everything else (chi2, rv, the 6 precision components) is
    # gathered once at the final top-K with global indices — gathers
    # dominate this stage on TPU, so each saved array matters. ---
    K1 = cfg.prefilter_k
    rv_pre = chi2_pre = icov_pre = packed_pass = None
    if K1 and K1 < M:
        # Block-granular selection (PosteriorConfig.prefilter_block):
        # rank `blk`-candidate blocks by block-max and keep K1/blk of
        # them — the pack gather below then fetches blk-row slices
        # (slice-RATE bound on TPU) and the ranking sort shrinks blk x.
        blk = max(1, cfg.prefilter_block)
        if M % blk or K1 % blk:
            blk = 1
        if cfg.prefilter_bf16:
            # Max-shifted bf16 ranking key: halves the sort bandwidth
            # of the full-sort fallback this selection lowers to at
            # K1/M ratios like 2048/12288 (see
            # PosteriorConfig.prefilter_bf16).  Values are still
            # gathered at f32; only the ranking key is quantized.
            key = jnp.maximum(lnprob - lnprob_max,
                              -3e4).astype(jnp.bfloat16)
        else:
            key = lnprob
        if blk > 1:
            kb = jnp.max(key.reshape(M // blk, blk), axis=1)
            _, blk_idx = jax.lax.approx_max_k(kb, K1 // blk,
                                              recall_target=0.95)
            pre_idx = (blk_idx[:, None] * blk
                       + jnp.arange(blk, dtype=blk_idx.dtype)).reshape(-1)
        else:
            _, pre_idx = jax.lax.approx_max_k(key, K1,
                                              recall_target=0.95)
        # Gathers dominate this stage on TPU: pack the needed fields
        # into one (M, C) matrix and fetch contiguous rows ONCE instead
        # of issuing one scattered gather per field.
        # With prefilter width == K the prefilter IS the selection
        # (sel_idx == pre_idx below): fold the fit-output tail fields
        # (rv, chi2, 6 precision components) into the SAME pack, which
        # removes the second full-width stack + row gather entirely.
        merge_tail = (K1 == min(K, K1))
        # Kernel-packed rows (funnel fused engine, `FitConfig.
        # kernel_pack`): the fit kernel already emitted every pack
        # field as one (n_rows, M) buffer whose bytes ARE the gather's
        # plane-major input — gather straight from it and skip the
        # whole stack/relayout below.  `lnprior_grid`/`feh`/`loga`
        # must be the SAME arrays the kernel packed (they are for
        # every in-package caller: all come from `loglike_grid_
        # screened`'s aux rows).
        pack_rows = results.get("pack_rows")
        use_pack = _pack_usable(cfg, M, pack_names,
                                pack_rows is not None,
                                feh is not None, loga is not None)
        pack_gidx = global_idx is not None and cfg.pack_gidx_f32
        if use_pack:
            # Gather straight from the kernel-packed rows: `pack_rows`
            # is (n_rows, M) whose bytes are already the plane-major
            # layout this row gather compiles to (the logical
            # transpose is a bitcast under XLA layout assignment).
            col = {n: i for i, n in enumerate(pack_names)}
            packed = pack_rows.T[pre_idx]
            packed_pass = packed
            g = lambda n: packed[:, col[n]]
            lnlike, scale, av = g("lnlike"), g("scale"), g("av")
            lnprior_grid = g("lnprior")
            feh_s = g("feh") if feh is not None else None
            loga_s = g("loga") if loga is not None else None
            rv_pre, chi2_pre = g("rv"), g("chi2")
            icov_pre = tuple(g(n) for n in
                             ("i00", "i11", "i22", "i01", "i02", "i12"))
            gidx_pre = g("gidx") if pack_gidx else None
        else:
            # `lnprob` only rides the pack when the s-precision part
            # does NOT (merge_tail=False): otherwise it is recomputed
            # post-gather from the packed lnlike/scale/s_den — the
            # identical elementwise function on identical values
            # (bitwise-equal result), one less full-width field in the
            # gather.
            fields = [lnlike, scale, av, lnprior_grid.astype(dtype)]
            if not merge_tail:
                fields.insert(3, lnprob)
            if feh is not None:
                fields.append(feh)
            if loga is not None:
                fields.append(loga)
            if merge_tail:
                if icov_parts is not None:
                    parts_full = tuple(icov_parts)
                else:
                    parts_full = (icov[:, 0, 0], icov[:, 1, 1],
                                  icov[:, 2, 2], icov[:, 0, 1],
                                  icov[:, 0, 2], icov[:, 1, 2])
                fields.extend((rv, chi2) + parts_full)
            if pack_gidx:
                # Ride the local->grid index map through the SAME pack
                # as an f32 field (exact below 2^24; `cfg.pack_gidx_f32`
                # is auto-disabled by `BruteForce.fit` for larger
                # grids): the standalone `global_idx[sel_idx]`
                # element-gather was the single most expensive op of
                # the posterior stage on a device trace (2.7 ms/batch
                # vs 1.9 for this whole pack fusion).
                fields.append(global_idx.astype(dtype))
            stacked = jnp.stack(fields, axis=-1)
            if blk > 1:
                # blk-row slices via a (M/blk, blk*C) row gather: same
                # bytes, blk x fewer slices (the reshapes are bitcasts).
                C = stacked.shape[-1]
                packed = stacked.reshape(M // blk,
                                         blk * C)[blk_idx].reshape(K1, C)
            else:
                packed = stacked[pre_idx]
            if merge_tail:
                lnlike, scale, av, lnprior_grid = (
                    packed[:, 0], packed[:, 1], packed[:, 2],
                    packed[:, 3])
                c = 4
            else:
                lnlike, scale, av, lnprob, lnprior_grid = (
                    packed[:, 0], packed[:, 1], packed[:, 2],
                    packed[:, 3], packed[:, 4])
                c = 5
            feh_s = loga_s = None
            if feh is not None:
                feh_s, c = packed[:, c], c + 1
            if loga is not None:
                loga_s, c = packed[:, c], c + 1
            if merge_tail:
                rv_pre, chi2_pre = packed[:, c], packed[:, c + 1]
                icov_pre = tuple(packed[:, c + 2 + i] for i in range(6))
                c += 8
            gidx_pre = packed[:, c] if pack_gidx else None
        if merge_tail:
            # Recompute lnprob from packed fields (see above:
            # bitwise-equal to gathering it).
            scale_err_pre = 1.0 / jnp.sqrt(jnp.abs(icov_pre[0]))
            lnprob = lnlike + scale_parallax_lnprior(
                scale, scale_err_pre, parallax, parallax_err)
            lnprob = jnp.where(jnp.isfinite(lnprob), lnprob, NEG_BIG)
    else:
        pre_idx = None
        gidx_pre = None
        feh_s, loga_s = feh, loga
    K = min(K, lnprob.shape[0])

    # --- cull #1 on likelihood (+parallax) (fitting.py:987-997) ---
    if cfg.wt_thresh is not None:
        # Same VALID_MIN floor as `_cull_mask`: all-invalid stars must
        # produce an all-False mask, not an all-True one.
        mask1 = lnprob > jnp.maximum(lnprob_max + math.log(cfg.wt_thresh),
                                     VALID_MIN)
    else:
        mask1 = _cull_mask(lnprob, None, cfg.cdf_thresh)

    # --- MLE-solution priors (fitting.py:999-1010) ---
    # 1e-30 floor (not 1e-300, which underflows to 0 in float32 and
    # turns `dist` into inf); matches the fused MC kernel's clamp.
    dist = 1.0 / jnp.sqrt(jnp.maximum(scale, 1e-30))
    lnp_mle = lnlike + lnprior_grid
    # Custom prior callables (reference fitting.py:859-876,999-1010):
    # jax-traceable `lngalprior(dist, coord, feh=, loga=)` /
    # `lndustprior(dist, av, av_dist, av_mean, av_std)` replace the
    # built-ins (the reference passes `labels`/`dustfile`; here labels
    # arrive as feh/loga arrays and the sightline profile is
    # pre-queried — see README divergences).
    skip = set(cfg.debug_skip.split(",")) if cfg.debug_skip else set()
    if "gal" in skip:
        pass                           # diagnostic knockout only
    elif lngalprior is not None:
        lnp_mle = lnp_mle + lngalprior(dist, coord, feh=feh_s,
                                       loga=loga_s)
    else:
        lnp_mle = lnp_mle + gal_lnprior(dist, coord, feh=feh_s,
                                        loga=loga_s, cfg=gal_cfg)
    if "dust" in skip:
        pass
    elif apply_av_prior and dust_profile is not None:
        av_dist, av_mean, av_std = dust_profile
        if lndustprior is not None:
            lnp_mle = lnp_mle + lndustprior(dist, av, av_dist, av_mean,
                                            av_std)
        else:
            lnp_mle = lnp_mle + dust_lnprior(dist, av, av_dist, av_mean,
                                             av_std, dust_cfg)
    lnp_mle = jnp.where(mask1 & _is_valid(lnp_mle), lnp_mle, NEG_BIG)

    # --- cull #2 on posterior, then re-base to lnlike + static prior
    # (fitting.py:1012-1023) ---
    mask2 = _cull_mask(lnp_mle, cfg.wt_thresh, cfg.cdf_thresh,
                       base_mask=mask1)
    score = jnp.where(mask2, lnlike + lnprior_grid, -jnp.inf)

    # --- fixed-size top-K selection (replaces the memory cap,
    # fitting.py:1029-1036) ---
    if K == score.shape[0]:
        # Prefilter width == K: the prefilter IS the selection; skip the
        # redundant exact sort and its gathers entirely.
        lnp_sel = score
        sel_idx = pre_idx if pre_idx is not None else jnp.arange(K)
        take_local = lambda x: x
    else:
        lnp_sel, sel_loc = jax.lax.top_k(score, K)
        # Global model indices for the outputs; local for the gathers.
        sel_idx = pre_idx[sel_loc] if pre_idx is not None else sel_loc
        take_local = lambda x: x[sel_loc]
    valid = _is_valid(lnp_sel)
    lnp_sel = jnp.where(valid, lnp_sel, NEG_BIG)
    scale_k, av_k = take_local(scale), take_local(av)
    # Fields the prior stage never read are gathered here for the first
    # time, by global index — packed into one row gather (see above).
    # The precisions stay as their 6 unique PARTS `(s_den, a_den,
    # r_den, sa, sr, ar)`: the inverse + PSD repair + Cholesky run
    # downstream on parts (in the MC kernel on the fused path), never
    # materializing (K, 3, 3) stacks here.
    if rv_pre is not None:
        # Tail fields rode the prefilter pack (sel_idx == pre_idx):
        # no second full-width stack/gather.
        rv_k, chi2_k, icov_p = rv_pre, chi2_pre, icov_pre
    elif icov_parts is not None:
        packed_k = jnp.stack((rv, chi2) + tuple(icov_parts),
                             axis=-1)[sel_idx]
        rv_k, chi2_k = packed_k[:, 0], packed_k[:, 1]
        icov_p = tuple(packed_k[:, 2 + i] for i in range(6))
    else:
        packed_k = jnp.stack([rv, chi2], axis=-1)[sel_idx]
        rv_k, chi2_k = packed_k[:, 0], packed_k[:, 1]
        icov_k = icov[sel_idx]
        icov_p = (icov_k[:, 0, 0], icov_k[:, 1, 1], icov_k[:, 2, 2],
                  icov_k[:, 0, 1], icov_k[:, 0, 2], icov_k[:, 1, 2])
    if K == score.shape[0]:
        feh_k, loga_k = feh_s, loga_s    # already gathered by prefilter
    else:
        feh_k = feh[sel_idx] if feh is not None else None
        loga_k = loga[sel_idx] if loga is not None else None

    # --- evidence-independent chi2/Ndim bookkeeping (fitting.py:
    # 2024-2030) ---
    have_plx = jnp.isfinite(parallax) & jnp.isfinite(parallax_err)
    perr_safe = jnp.where(have_plx, parallax_err, 1.0)
    chi2_k = chi2_k + jnp.where(
        have_plx, (jnp.sqrt(scale_k) - parallax) ** 2 / perr_safe ** 2, 0.0)
    ndim_out = ndim + have_plx.astype(ndim.dtype)
    # When no model survives the culls (degenerate star), fall back to
    # the best finite chi2 over the selection so the bookkeeping output
    # stays defined.
    chi2_fin = jnp.where(jnp.isfinite(chi2_k), chi2_k, jnp.inf)
    chi2min_v = jnp.min(jnp.where(valid, chi2_fin, jnp.inf))
    chi2min = jnp.where(jnp.isfinite(chi2min_v), chi2min_v,
                        jnp.min(chi2_fin))

    # Local-to-grid index map of the selection: from the pack when it
    # rode the prefilter, else the explicit (expensive) gather.
    if gidx_pre is not None:
        sel_gidx = jnp.round(take_local(gidx_pre)).astype(jnp.int32)
    elif global_idx is not None:
        sel_gidx = global_idx[sel_idx]
    else:
        sel_gidx = sel_idx

    out = dict(lnp_sel=lnp_sel, valid=valid, sel_idx=sel_idx,
               sel_gidx=sel_gidx,
               scale_k=scale_k, av_k=av_k, rv_k=rv_k, icov_p=icov_p,
               chi2_k=chi2_k, ndim=ndim_out, chi2min=chi2min,
               feh_k=feh_k, loga_k=loga_k)
    if packed_pass is not None:
        # Kernel-packed table pass-through (`lnpost_batch` hands it to
        # the MC kernel with a row map instead of restacking).
        out["packed"] = packed_pass
    return out


@partial(jax.jit,
         static_argnames=("cfg", "gal_cfg", "dust_cfg", "apply_av_prior",
                          "lngalprior", "lndustprior"))
def lnpost_grid(key, results, lnprior_grid, coord,
                parallax=jnp.nan, parallax_err=jnp.nan,
                feh=None, loga=None,
                dust_profile=None, global_idx=None,
                cfg: PosteriorConfig = PosteriorConfig(),
                gal_cfg: GalPriorConfig = GalPriorConfig(),
                dust_cfg: DustPriorConfig = DustPriorConfig(),
                apply_av_prior=True,
                lngalprior=None, lndustprior=None):
    """Posterior weights + Monte-Carlo `(dist, Av, Rv)` draws for one star.

    Parameters
    ----------
    key : PRNG key.
    results : dict from `loglike_grid` (`lnlike, ndim, chi2, scale, av,
        rv, icov_sar`), shapes `(M, ...)`.
    lnprior_grid : (M,) static grid log-prior (IMF/LF + age/grad weights).
    coord : (2,) galactic `(l, b)` degrees.
    feh, loga : optional (M,) model labels for the Galactic mixture priors.
    dust_profile : optional tuple `(av_dist, av_mean, av_std)` of the
        line-of-sight dust profile from `dustmap.Bayestar.query`.
    global_idx : optional (M,) map from the local model axis to grid
        indices (funnel path: `results` covers a per-star shortlist
        from `loglike_grid_screened`); applied to the emitted
        `model_idx`/`sel_idx` only — all internal gathers stay local.

    Returns
    -------
    dict with per-draw outputs (`model_idx, scale, av, rv, cov_sar,
    lnprob, dist, red, dred, logwt` of leading dim `n_draws`) and
    per-star scalars (`log_evidence, chi2min, ndim`), plus the top-K
    diagnostics (`sel_idx, lnp_sel, valid_sel`).
    """
    sel = _select_stage(results, lnprior_grid, coord, parallax,
                        parallax_err, feh, loga, dust_profile,
                        cfg, gal_cfg, dust_cfg, apply_av_prior,
                        lngalprior=lngalprior, lndustprior=lndustprior,
                        global_idx=global_idx)
    (lnp_sel, valid, sel_idx, scale_k, av_k, rv_k, icov_p, chi2_k,
     ndim_out, chi2min, feh_k, loga_k) = (
        sel["lnp_sel"], sel["valid"], sel["sel_idx"], sel["scale_k"],
        sel["av_k"], sel["rv_k"], sel["icov_p"], sel["chi2_k"],
        sel["ndim"], sel["chi2min"], sel["feh_k"], sel["loga_k"])
    dtype = lnp_sel.dtype
    K = lnp_sel.shape[0]
    Nmc = cfg.n_mc_prior
    if dust_profile is not None:
        av_dist, av_mean, av_std = dust_profile

    # --- covariances: stable inverse + PSD repair (fitting.py:
    # 1039-1065), on parts (see utils.psd_repair_parts) ---
    cov_p = psd_repair_parts(icov_p, scale_k, valid, cfg.psd_width,
                             cfg.psd_max_passes, mvn_eps=cfg.mvn_eps)
    cov_k = sym3_from_parts(cov_p)

    # --- MC integration over the (s, Av, Rv) Gaussians
    # (fitting.py:1068-1098) ---
    kmvn, kidx, kmc = jax.random.split(key, 3)
    l00, l10, l11, l20, l21, l22 = cholesky3_parts(cov_p)
    z = jax.random.normal(kmvn, (K, 3, Nmc), dtype=dtype)
    z0, z1, z2 = z[:, 0], z[:, 1], z[:, 2]                    # (K, Nmc)
    s_mc = scale_k[:, None] + l00[:, None] * z0
    a_mc = av_k[:, None] + l10[:, None] * z0 + l11[:, None] * z1
    r_mc = (rv_k[:, None] + l20[:, None] * z0 + l21[:, None] * z1
            + l22[:, None] * z2)

    # 1e-30 floor, not 1e-300: the latter underflows to 0 in float32,
    # making `dist_mc` inf (matches the fused kernel's clamp).
    par_mc = jnp.sqrt(jnp.maximum(s_mc, 1e-30))
    dist_mc = 1.0 / par_mc
    feh_mc = feh_k[:, None] if feh_k is not None else None
    loga_mc = loga_k[:, None] if loga_k is not None else None
    if lngalprior is not None:     # custom callable (fitting.py:870)
        lnp_mc = lngalprior(dist_mc, coord, feh=feh_mc, loga=loga_mc)
    else:
        lnp_mc = gal_lnprior(dist_mc, coord, feh=feh_mc, loga=loga_mc,
                             cfg=gal_cfg)
    if apply_av_prior and dust_profile is not None:
        if lndustprior is not None:   # custom callable (fitting.py:876)
            lnp_mc = lnp_mc + lndustprior(dist_mc, a_mc, av_dist,
                                          av_mean, av_std)
        else:
            lnp_mc = lnp_mc + dust_lnprior(dist_mc, a_mc, av_dist,
                                           av_mean, av_std, dust_cfg)
    lnp_mc = lnp_mc + parallax_lnprior(par_mc, parallax, parallax_err)
    inbounds = ((s_mc >= 1e-20) &
                (a_mc >= cfg.avlim[0]) & (a_mc <= cfg.avlim[1]) &
                (r_mc >= cfg.rvlim[0]) & (r_mc <= cfg.rvlim[1]))
    lnp_mc = jnp.where(inbounds & jnp.isfinite(lnp_mc), lnp_mc, NEG_BIG)
    n_eff = jnp.sum(inbounds, axis=1)
    lnp_sel = lnp_sel + logsumexp(lnp_mc, axis=1) - jnp.log(
        jnp.maximum(n_eff, 1))
    lnp_sel = jnp.where(valid & _is_valid(lnp_sel) & (n_eff > 0),
                        lnp_sel, NEG_BIG)

    # --- evidence (fitting.py:2024-2034; chi2/Ndim bookkeeping lives
    # in `_select_stage`) ---
    log_evid = logsumexp(lnp_sel)

    # --- weighted categorical resampling (fitting.py:2035-2057) ---
    # Degenerate-star fallback: if EVERY model was invalidated (the
    # reference errors out of such stars; we emit defined output), draw
    # proportional to exp(-chi2/2) over the selection instead of the
    # uniform-categorical garbage an all-NEG_BIG softmax produces.
    # `log_evidence` stays ~NEG_BIG, flagging the star.
    chi2_draw = jnp.where(jnp.isfinite(chi2_k), chi2_k, 1e30)
    any_ok = jnp.any(_is_valid(lnp_sel))
    draw_logits = jnp.where(any_ok, lnp_sel, -0.5 * chi2_draw)
    idxs = _categorical_cdf(kidx, draw_logits, cfg.n_draws)
    imc = jax.random.categorical(kmc, lnp_mc[idxs], axis=-1)
    gat = lambda x: x[idxs]
    draw = lambda x: x[idxs, imc]

    sel_out = sel['sel_gidx']
    return dict(
        model_idx=sel_out[idxs],
        scale=gat(scale_k), av=gat(av_k), rv=gat(rv_k),
        cov_sar=gat(cov_k), lnprob=gat(lnp_sel),
        dist=draw(dist_mc), red=draw(a_mc), dred=draw(r_mc),
        logwt=draw(lnp_mc),
        log_evidence=log_evid, chi2min=chi2min, ndim=ndim_out,
        sel_idx=sel_out, lnp_sel=lnp_sel, valid_sel=valid,
    )


# ---------------------------------------------------------------------------
# Batched posterior with the fused MC-integration Pallas kernel
# ---------------------------------------------------------------------------

from functools import lru_cache


@lru_cache(maxsize=32)
def _batch_fns(cfg: PosteriorConfig, gal_cfg: GalPriorConfig,
               dust_cfg: DustPriorConfig, apply_av_prior,
               has_feh, has_loga, has_dust, has_global,
               use_krng=False, pack_names=None):
    """Cached jitted pre/post halves of `lnpost_batch` (the MC kernel
    dispatches eagerly in between)."""
    from .pallas_mc import N_TAB_ROWS, N_SCALARS, NL_PAD, AGG_COV
    from ..coords import _M

    nmc = cfg.n_mc_prior
    nmcp = -(-nmc // 8) * 8
    use_dust = has_dust and apply_av_prior

    def pre(key, results, lnprior_grid, coord, parallax, parallax_err,
            feh, loga, av_mean, av_std, av_dist, global_idx):
        feh = feh if has_feh else None
        loga = loga if has_loga else None
        profile = (av_dist, av_mean, av_std) if has_dust else None
        sel = _select_stage(results, lnprior_grid, coord, parallax,
                            parallax_err, feh, loga, profile,
                            cfg, gal_cfg, dust_cfg, apply_av_prior,
                            global_idx=global_idx if has_global
                            else None, pack_names=pack_names)
        dtype = sel["lnp_sel"].dtype
        K = sel["lnp_sel"].shape[0]
        kmvn, kidx, kmc = jax.random.split(key, 3)

        if use_krng:
            # Hardware-PRNG path: only a per-star seed leaves the host
            # of this stage.
            zt = None
            seeds = jax.random.randint(kmvn, (2,), 0, 2 ** 31 - 1,
                                       dtype=jnp.int32)
        else:
            # Same draw layout/keys as the XLA path (`lnpost_grid`),
            # so the two paths agree beyond float association.
            z = jax.random.normal(kmvn, (K, 3, nmc), dtype=dtype)
            zt = jnp.transpose(z, (1, 2, 0))         # (3, nmc, K)
            if nmcp != nmc:
                zt = jnp.pad(zt, ((0, 0), (0, nmcp - nmc), (0, 0)))
            seeds = None

        if "packed" in sel:
            # Kernel-packed pass-through: the gathered pack IS the MC
            # table (its bytes already lie fields-major; the transpose
            # is a bitcast) — the kernel reads rows via `row_map` and
            # validity rides its own plane.  Kills the (B, 16, K)
            # restack below.
            tab = sel.pop("packed").T                # (n_rows, K)
        else:
            zero = jnp.zeros((K,), dtype)
            # Rows 3-8: precision PARTS — the inverse + PSD repair +
            # Cholesky run inside the MC kernel (skipped for dead
            # tiles).
            rows = [sel["scale_k"], sel["av_k"], sel["rv_k"]] \
                + list(sel["icov_p"]) \
                + [sel["feh_k"] if has_feh else zero,
                   sel["loga_k"] if has_loga else zero,
                   sel["valid"].astype(dtype)]
            rows += [zero] * (N_TAB_ROWS - len(rows))
            tab = jnp.stack(rows, axis=0)            # (16, K)

        lr = jnp.deg2rad(coord[0])
        br = jnp.deg2rad(coord[1])
        cb = jnp.cos(br)
        uvec = jnp.stack([cb * jnp.cos(lr), cb * jnp.sin(lr),
                          jnp.sin(br)]).astype(dtype)
        v = jnp.matmul(jnp.asarray(_M, dtype), uvec,
                       precision=jax.lax.Precision.HIGHEST)

        have = (jnp.isfinite(parallax) & jnp.isfinite(parallax_err)
                & (parallax_err > 0))
        perr = jnp.where(have, parallax_err, 1.0)
        pm = jnp.where(have, parallax, 0.0).astype(dtype)
        pw = jnp.where(have, 1.0 / perr ** 2, 0.0).astype(dtype)
        pln = jnp.where(have, jnp.log(2.0 * jnp.pi * perr ** 2),
                        0.0).astype(dtype)

        if use_dust:
            nl = av_mean.shape[0]
            if nl > NL_PAD:
                raise ValueError(
                    f"dust ladder has {nl} rungs > NL_PAD={NL_PAD}; "
                    f"resample with dustmap.uniform_profile(n={NL_PAD}) "
                    f"(longer ladders would be silently truncated)")
            covered = jnp.all(jnp.isfinite(av_mean)
                              & jnp.isfinite(av_std)).astype(dtype)
            safe_mean = jnp.where(jnp.isfinite(av_mean), av_mean,
                                  0.0).astype(dtype)
            safe_std = jnp.where(jnp.isfinite(av_std), av_std,
                                 1.0).astype(dtype)
            d0 = av_dist[0].astype(dtype)
            idx_s = (1.0 / (av_dist[1] - av_dist[0])).astype(dtype)
            umax = jnp.asarray(float(nl - 1), dtype)
            dusttab = jnp.zeros((NL_PAD, 8), dtype)
            dusttab = dusttab.at[:nl, 0].set(safe_mean)
            dusttab = dusttab.at[:nl, 1].set(safe_std)
        else:
            covered = jnp.asarray(0.0, dtype)
            d0 = jnp.asarray(0.0, dtype)
            idx_s = jnp.asarray(1.0, dtype)
            umax = jnp.asarray(0.0, dtype)
            dusttab = jnp.zeros((NL_PAD, 8), dtype)

        scal = jnp.zeros((N_SCALARS,), dtype)
        scal = scal.at[0].set(v[0]).at[1].set(v[1]).at[2].set(v[2])
        scal = scal.at[3].set(pm).at[4].set(pw).at[5].set(pln)
        scal = scal.at[6].set(d0).at[7].set(idx_s)
        scal = scal.at[8].set(covered).at[9].set(umax)

        sel["kidx"], sel["kmc"] = kidx, kmc
        sel["tab"], sel["scal"] = tab, scal[None, :]
        sel["dusttab"], sel["z"] = dusttab, zt
        sel["seeds"] = seeds
        if not has_feh:
            sel.pop("feh_k")
        if not has_loga:
            sel.pop("loga_k")
        return sel

    def post(sel, lnmc, dist_k, red_k, dred_k, agg, global_idx):
        lnp_sel, valid = sel["lnp_sel"], sel["valid"]
        lse, neff = agg[0], agg[1]
        lnp_sel = lnp_sel + lse - jnp.log(jnp.maximum(neff, 1.0))
        lnp_sel = jnp.where(valid & _is_valid(lnp_sel) & (neff > 0),
                            lnp_sel, NEG_BIG)
        log_evid = logsumexp(lnp_sel)
        # Degenerate-star fallback (see `lnpost_grid`): all-invalid
        # stars resample by exp(-chi2/2) instead of uniform garbage.
        chi2_draw = jnp.where(jnp.isfinite(sel["chi2_k"]),
                              sel["chi2_k"], 1e30)
        any_ok = jnp.any(_is_valid(lnp_sel))
        draw_logits = jnp.where(any_ok, lnp_sel, -0.5 * chi2_draw)
        idxs = _categorical_cdf(sel["kidx"], draw_logits, cfg.n_draws)
        # Resampling WITHOUT gathers: TPU batched gathers run at
        # ~25k slices/ms regardless of slice size, and this stage's
        # ~10 per-field idxs-gathers dominated its 13+ ms cost.  A
        # one-hot selection matrix turns every gather into an MXU
        # matmul — EXACT (each one-hot row has a single 1.0; the
        # bf16x3 f32 decomposition reproduces x*1+0+...+0 bit-exactly)
        # — and the (nmc, K) kernel outputs contract directly over K,
        # which also kills the big (K, nmc) transpose.
        K = lnp_sel.shape[0]
        dtype = lnp_sel.dtype
        ndraws = idxs.shape[0]
        hi = jax.lax.Precision.HIGHEST
        # bf16 one-hot: EXACT (every entry is 0.0 or 1.0, and jax
        # promotes it back to f32 inside the matmuls) at half the HBM
        # footprint of the (ndraws, K) selection matrix.
        oh = (idxs[:, None]
              == jnp.arange(K, dtype=jnp.int32)[None, :]).astype(
                  jnp.bfloat16)
        mlev = jnp.concatenate(
            [sel["scale_k"][:, None], sel["av_k"][:, None],
             sel["rv_k"][:, None], lnp_sel[:, None]], axis=1)  # (K, 4)
        rows = jnp.matmul(oh, mlev, precision=hi)   # (ndraws, 4)
        # Repaired covariance parts come back through the MC kernel's
        # aggregate rows (AGG_COV..+5: c00, c11, c22, c01, c02, c12).
        covd = jnp.matmul(agg[AGG_COV:AGG_COV + 6], oh.T,
                          precision=hi)             # (6, ndraws)
        cov_sar = sym3_from_parts((covd[0], covd[1], covd[2],
                                   covd[3], covd[4], covd[5]))
        dm = jnp.concatenate(
            [lnmc[:nmc], dist_k[:nmc], red_k[:nmc], dred_k[:nmc]],
            axis=0)                                 # (4*nmc, K)
        dmr = jnp.matmul(dm, oh.T, precision=hi).T  # (ndraws, 4*nmc)
        lr = dmr[:, :nmc]                           # == lnmcT[idxs]
        imc = jax.random.categorical(sel["kmc"], lr, axis=-1)
        ohm = (imc[:, None]
               == jnp.arange(nmc, dtype=jnp.int32)[None, :]).astype(dtype)
        pick = lambda lo: jnp.sum(dmr[:, lo:lo + nmc] * ohm, axis=1)
        sel_out = sel["sel_gidx"]
        # int32 indices ride the one-hot matmul as f32 (exact < 2^24).
        midx = jnp.matmul(oh, sel_out.astype(dtype)[:, None],
                          precision=hi)[:, 0]
        return dict(
            model_idx=jnp.round(midx).astype(sel_out.dtype),
            scale=rows[:, 0], av=rows[:, 1],
            rv=rows[:, 2], cov_sar=cov_sar,
            lnprob=rows[:, 3],
            dist=pick(nmc), red=pick(2 * nmc), dred=pick(3 * nmc),
            logwt=jnp.sum(lr * ohm, axis=1),
            log_evidence=log_evid, chi2min=sel["chi2min"],
            ndim=sel["ndim"],
            sel_idx=sel_out, lnp_sel=lnp_sel, valid_sel=valid,
        )

    pre_v = jax.jit(jax.vmap(
        pre, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None, 0)))
    post_v = jax.jit(jax.vmap(post, in_axes=(0, 0, 0, 0, 0, 0, 0)))
    return pre_v, post_v


def lnpost_batch(keys, results, lnprior_grid, coord,
                 parallax=None, parallax_err=None,
                 feh=None, loga=None, dust_profile=None, global_idx=None,
                 pack_names=None,
                 cfg: PosteriorConfig = PosteriorConfig(),
                 gal_cfg: GalPriorConfig = GalPriorConfig(),
                 dust_cfg: DustPriorConfig = DustPriorConfig(),
                 apply_av_prior=True, tile=512, interpret=None,
                 stop_after=None, lngalprior=None, lndustprior=None):
    """Batched `lnpost_grid` with the Monte-Carlo integration fused
    into one Pallas kernel (`ops.pallas_mc`).

    Same math and same RNG keys/draw layout as `jax.vmap(lnpost_grid)`
    — results agree to float32 association error — but the MC stage
    (MVN transform + Galactic/dust/parallax priors on every draw +
    per-model logsumexp) runs register-resident instead of through
    ~10 HBM-sized XLA temporaries.  NOT jittable as a whole (the
    Mosaic kernel dispatches eagerly); per-star arrays carry a leading
    batch axis.

    Parameters mirror `lnpost_grid` with leading batch dims:
    `keys (B, 2)`, `results` fields `(B, M, ...)`, `lnprior_grid
    (B, M)`, `coord (B, 2)` (or `(2,)`, broadcast), `dust_profile =
    (av_dist (Nd,), av_mean (B, Nd), av_std (B, Nd))`.
    """
    from .pallas_mc import mc_integrate, NL_PAD

    if lngalprior is not None or lndustprior is not None:
        # Custom prior callables: the fused MC kernel hard-codes the
        # built-in Galactic/dust models, so route through the XLA MC
        # integration (vmapped `lnpost_grid`) — same math, ~2-3x
        # slower posterior stage; documented tradeoff for custom
        # priors (reference fitting.py:870-881 accepts arbitrary
        # python callables and is ~1000x slower throughout).
        fn = partial(lnpost_grid, cfg=cfg, gal_cfg=gal_cfg,
                     dust_cfg=dust_cfg, apply_av_prior=apply_av_prior,
                     lngalprior=lngalprior, lndustprior=lndustprior)
        B = keys.shape[0]
        coord_b = jnp.broadcast_to(
            jnp.asarray(coord, results["lnlike"].dtype), (B, 2))
        if parallax is None:
            parallax = jnp.full((B,), jnp.nan)
            parallax_err = jnp.full((B,), jnp.nan)
        if dust_profile is not None:
            # Same shared-profile broadcast as the fused branch below:
            # av_mean/av_std may be per-star (B, Nd) or shared (Nd,).
            av_dist, av_mean, av_std = dust_profile
            nd = av_dist.shape[0]
            dust_profile = (av_dist,
                            jnp.broadcast_to(jnp.atleast_2d(av_mean),
                                             (B, nd)),
                            jnp.broadcast_to(jnp.atleast_2d(av_std),
                                             (B, nd)))
        dp_axes = ((None, 0, 0) if dust_profile is not None else None)
        return jax.vmap(
            lambda key, res, lp, co, px, pe, f_, la, gi, dp: fn(
                key, res, lp, co, parallax=px, parallax_err=pe,
                feh=f_, loga=la, dust_profile=dp, global_idx=gi),
            in_axes=(0, 0, 0, 0, 0, 0,
                     0 if feh is not None else None,
                     0 if loga is not None else None,
                     0 if global_idx is not None else None,
                     dp_axes),
        )(keys, results, lnprior_grid, coord_b, parallax, parallax_err,
          feh, loga, global_idx, dust_profile)

    # Kernel-packed rows (results["pack_rows"] + the static
    # `pack_names` map from `pallas_loglike.pack_row_names`): the
    # prefilter pack gathers straight from the fit kernel's stacked
    # output.  `lnprior_grid`/`feh`/`loga` must then be the SAME
    # arrays the kernel packed (true for every in-package caller).
    pack_names = tuple(pack_names) if pack_names else None

    B = keys.shape[0]
    lnp = results["lnlike"]
    dtype = lnp.dtype
    has_feh = feh is not None
    has_loga = loga is not None
    has_dust = dust_profile is not None
    has_global = global_idx is not None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Interpret mode lacks `prng_seed`; fall back to threefry normals.
    use_krng = bool(cfg.kernel_rng) and not interpret

    coord = jnp.broadcast_to(jnp.asarray(coord, dtype), (B, 2))
    if parallax is None:
        parallax = jnp.full((B,), jnp.nan, dtype)
        parallax_err = jnp.full((B,), jnp.nan, dtype)
    else:
        parallax = jnp.broadcast_to(jnp.asarray(parallax, dtype), (B,))
        parallax_err = jnp.broadcast_to(jnp.asarray(parallax_err, dtype),
                                        (B,))
    zeros_m = jnp.zeros(lnp.shape, dtype)
    feh_a = feh if has_feh else zeros_m
    loga_a = loga if has_loga else zeros_m
    if has_dust:
        av_dist, av_mean, av_std = dust_profile
        av_mean = jnp.broadcast_to(jnp.atleast_2d(av_mean),
                                   (B, av_dist.shape[0]))
        av_std = jnp.broadcast_to(jnp.atleast_2d(av_std),
                                  (B, av_dist.shape[0]))
    else:
        av_dist = jnp.zeros((2,), dtype)
        av_mean = jnp.zeros((B, 2), dtype)
        av_std = jnp.zeros((B, 2), dtype)
    gidx_a = global_idx if has_global else jnp.zeros(lnp.shape, jnp.int32)

    pre_v, post_v = _batch_fns(cfg, gal_cfg, dust_cfg, bool(apply_av_prior),
                               has_feh, has_loga, has_dust, has_global,
                               use_krng, pack_names)
    sel = pre_v(keys, results, lnprior_grid, coord, parallax,
                parallax_err, feh_a, loga_a, av_mean, av_std, av_dist,
                gidx_a)
    if stop_after == "select":     # bench --breakdown probe
        return sel
    nmcp = -(-cfg.n_mc_prior // 8) * 8
    use_pack = _pack_usable(cfg, results["lnlike"].shape[1], pack_names,
                            "pack_rows" in results, has_feh, has_loga)
    lnmc, dist_k, red_k, dred_k, agg = mc_integrate(
        sel["tab"], sel["scal"], sel["dusttab"],
        cfg.n_mc_prior, nmcp, cfg, gal_cfg, dust_cfg,
        use_feh=has_feh, use_loga=has_loga,
        use_dust=has_dust and apply_av_prior, tile=tile,
        interpret=interpret, z=sel["z"], seeds=sel["seeds"],
        valid=sel["valid"],
        row_map=_pack_row_map(pack_names) if use_pack else None)
    if stop_after == "mc":         # bench --breakdown probe
        return (sel, lnmc, dist_k, red_k, dred_k, agg)
    return post_v(sel, lnmc, dist_k, red_k, dred_k, agg, gidx_a)


__all__ = ["lnpost_grid", "lnpost_batch"]
