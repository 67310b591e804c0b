"""
Plain-XLA two-stage funnel: screen all models, fully fit a shortlist.

The algorithmic win of the fused engine's funnel (screen every model
with the reference's init-cull ranking score, then run the expensive
two-phase optimizer only on the top `screen_k` models per star —
`brutus/fitting.py:743-768` is the ranking quantity, `:579-820` the
full per-star semantics) is engine-independent math.  This module
expresses it in plain XLA so that

  * non-TPU backends (CPU/GPU) get the ~2-orders-of-magnitude cut in
    optimizer FLOPs without Mosaic kernels, and
  * the model-sharded GSPMD path (grids beyond per-chip HBM) screens
    each shard locally and merges shortlists over the mesh `model`
    axis with the same tiny collectives as the fused sharded funnel.

Stage 1 scores every model with the shared clamped direct 3x3 WLS
solve + parallax chi2 (`ops.pallas_loglike.screen_score_from_sums` —
bit-identical formulas to the MXU screening kernel), expressed as nine
`(B, 6F) @ (6F, M)` bf16 contractions over the SAME manual 3-way
bf16 split as the Pallas v3 screen (`_split3` + positional pairing:
lhs `[h h h m m l]` against rhs `[h; m; l; h; m; h]` accumulates
exactly `Precision.HIGHEST`'s six bf16 cross-terms in ONE
default-precision pass — on TPU that is 6x fewer MXU passes than the
HIGHEST einsums this module used through round 4, for identical
ranking math; the split tables are byte-for-byte the same size as
the old f32 ones).  Selection is at contiguous
`block`-model granularity (`_select_blocks`), so stage 2's coefficient
gather is `B * nb` big contiguous slices — the access pattern XLA's
gather lowering handles at bandwidth — instead of `B * P` tiny ones.
Stage 2 runs the exact dense engine (`ops.optimize._loglike_grid_body`,
the `lax.while_loop`-to-tolerance reference semantics) vmapped over the
per-star `(P, F, 3)` shortlists: `(B, P, F)` intermediates replace the
dense engine's `(B, M, F)` ones, which removes the HBM pressure that
forced sub-batching.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..config import FitConfig
from .optimize import _loglike_grid_body, prepare_star_data
from .pallas_loglike import (SCREEN_MAG_CENTER, screen_score_from_sums,
                             _select_blocks, _select_blocks_sharded,
                             _screen_parallax, _split3)


def _split_rows_np(row):
    """`(F, Mp) f32 -> (6F, Mp) bf16` rhs split stack
    `[h; m; l; h; m; h]` (pairs positionally with the lhs
    `[h h h m m l]` blocks of `_split_lhs` to accumulate exactly the
    bf16x6 cross-terms hh, hm, hl, mh, mm, lh — the dropped ml/lm/ll
    terms are <= 2^-32 relative; see `pallas_loglike._split3`)."""
    import numpy as np
    import ml_dtypes
    bf16 = ml_dtypes.bfloat16
    h = row.astype(bf16)
    rem = row - h.astype(np.float32)
    m = rem.astype(bf16)
    l = (rem - m.astype(np.float32)).astype(bf16)
    return np.concatenate([h, m, l, h, m, h], axis=0)


def _split_lhs(x):
    """`(B, F) f32 -> (B, 6F) bf16` lhs split blocks `[h h h m m l]`
    (through `_split3`'s optimization barriers — XLA-TPU otherwise
    constant-folds the f32->bf16->f32 round trip and zeroes the
    correction parts; see `_split3`)."""
    h, m, l = _split3(x)
    return jnp.concatenate([h, h, h, m, m, l], axis=1)


def prepare_screen_xla(mag_coeffs, aux=None, block=256, n_shards=1):
    """Device tables for the plain-XLA funnel.

    Parameters
    ----------
    mag_coeffs : (M, F, 3) grid coefficients.
    aux : optional dict of name -> (M,) float arrays (grid log-prior,
        feh, loga, ...) gathered alongside the coefficients.
    block : selection granularity (M is padded up to a multiple).
    n_shards : model-axis mesh size; M is padded to a multiple of
        `block * n_shards` so each shard's slice blocks evenly.

    Returns
    -------
    (tabw, tabc, packed_blocks, aux_names, n_real):
      tabw : (6, 6F, Mp) bf16 weight-contracted model rows
          `[r0, dr, m0, r0^2, r0*dr, dr^2]` (centered magnitudes),
          each as the `[h; m; l; h; m; h]` 3-way split stack
          (`_split_rows_np`; same bytes as the round-4 f32 table).
      tabc : (3, 12F, Mp) bf16 folded data-sum rows
          `[(-2 m0; m0^2), (r0; -m0 r0), (dr; -m0 dr)]` against the
          star-side `[mw-splits | w-splits]` stack, split like tabw.
      packed_blocks : (Mp // block, block, 3F + n_aux) f32 slab-gather
          table (per-model row = flattened (F, 3) coefficients then the
          aux columns), so one block-index gather fetches everything
          stage 2 and the posterior need.
      aux_names : aux row order;  n_real : real model count.
    """
    import numpy as np
    mc = np.asarray(mag_coeffs, np.float32)
    M, F, _ = mc.shape
    quantum = block * n_shards
    Mp = -(-M // quantum) * quantum
    if Mp > M:
        pad = np.repeat(mc[-1:], Mp - M, axis=0).copy()
        pad[..., 0] += 60.0          # faint padding (never wins)
        mc = np.concatenate([mc, pad], axis=0)
    m0 = np.ascontiguousarray(mc[..., 0].T) - SCREEN_MAG_CENTER  # (F, Mp)
    r0 = np.ascontiguousarray(mc[..., 1].T)
    dr = np.ascontiguousarray(mc[..., 2].T)
    tabw = np.stack([_split_rows_np(x) for x in
                     (r0, dr, m0, r0 * r0, r0 * dr, dr * dr)])
    cat = lambda a, b: np.concatenate([_split_rows_np(a),
                                       _split_rows_np(b)], axis=0)
    tabc = np.stack([cat(-2.0 * m0, m0 * m0),
                     cat(r0, -m0 * r0),
                     cat(dr, -m0 * dr)])
    rows = [mc.reshape(Mp, 3 * F)]           # row f*3 + k = coef k of f
    names = []
    if aux:
        for k, v in aux.items():
            names.append(k)
            col = np.zeros(Mp, np.float32)
            col[:M] = np.asarray(v, np.float32)
            rows.append(col[:, None])
    packed = np.concatenate(rows, axis=1)    # (Mp, 3F + n_aux)
    packed_blocks = packed.reshape(Mp // block, block, packed.shape[1])
    return (jnp.asarray(tabw), jnp.asarray(tabc),
            jnp.asarray(packed_blocks), tuple(names), M)


def _screen_block_scores(mags, wt_mag, plx, plxw, tabw, tabc, n_real,
                         cfg: FitConfig, block):
    """Per-block maxima of the screening score: `(B, Mp // block)`.

    Same quantity as the MXU screening kernel (shared epilogue); the
    nine bilinear sums are `(B, 6F) @ (6F, M)` single-pass bf16
    contractions over the 3-way split operands (the score cancels
    ~SNR^2 x mag^2 x F sums down to the residual chi2 — the split's
    six exact cross-terms reproduce `Precision.HIGHEST` at 1/6 the
    MXU passes; plain bf16 noise would scramble the ranking, see
    `_make_screen_kernel`).
    """
    Mp = tabw.shape[-1]
    mc = (mags - SCREEN_MAG_CENTER) * jnp.sign(wt_mag)   # 0 where wt==0
    mcw = mc * wt_mag
    a00 = jnp.maximum(jnp.sum(wt_mag, axis=1, keepdims=True), 1e-30)
    C0 = jnp.sum(mcw, axis=1, keepdims=True)
    q0 = jnp.sum(mc * mcw, axis=1, keepdims=True)
    wt_s = _split_lhs(wt_mag)                            # (B, 6F) bf16
    lhs_c = jnp.concatenate([_split_lhs(mcw), wt_s], axis=1)
    f32 = jnp.float32
    outw = jnp.einsum("bf,kfm->kbm", wt_s, tabw,
                      preferred_element_type=f32)        # (6, B, Mp)
    outc = jnp.einsum("bf,kfm->kbm", lhs_c, tabc,
                      preferred_element_type=f32)        # (3, B, Mp)
    score = screen_score_from_sums(
        outw[0], outw[1], outw[2], outw[3], outw[4], outw[5],
        outc[0], outc[1], outc[2], a00, C0, q0,
        plx[:, None], plxw[:, None], cfg)
    if n_real < Mp:
        score = jnp.where(jnp.arange(Mp) < n_real, score, -1e30)
    B = score.shape[0]
    return jnp.max(score.reshape(B, Mp // block, block), axis=-1)


def loglike_grid_screened_xla(flux, fluxerr, mask, tabw, tabc,
                              packed_blocks, n_real,
                              parallax=None, parallax_err=None,
                              cfg: FitConfig = FitConfig(),
                              screen_k=8192, aux_names=(),
                              model_axis=None, n_model_shards=1):
    """Batched funnel likelihood in plain XLA.

    Returns the `loglike_grid` dict with `(B, P)` fields plus
    `global_idx` (the (B, P) shortlist -> grid index map) and `aux`
    (dict of gathered per-star columns, `(B, P)` each).  Stage 2 is
    the exact dense engine (`lax.while_loop` to tolerance) vmapped
    over per-star shortlists, so values match `loglike_grid` exactly
    for every shortlisted model.

    Model-sharded mode (`model_axis` set, called inside `shard_map`):
    the tables are this shard's contiguous slice of the grid and
    `n_real` the GLOBAL count; shortlists merge across the mesh
    `model` axis exactly like the fused funnel (per-shard screen ->
    `all_gather` block-candidate union -> owner-only slab gather ->
    `psum` union; see `_select_blocks_sharded`).
    """
    B, F = flux.shape
    nblocks, block, W = packed_blocks.shape
    dtype = jnp.float32
    flux = flux.astype(dtype)
    fluxerr = fluxerr.astype(dtype)
    M = nblocks * block          # local (per-shard) padded model count
    nb = max(1, min(screen_k // block, (M * n_model_shards) // block))

    (_fluxp, _wtf, mags, wt_mag, _mask, _ndim,
     _tv) = prepare_star_data(flux, fluxerr, mask, cfg)
    if parallax is None:
        parallax = jnp.full((B,), jnp.nan, dtype)
        parallax_err = jnp.full((B,), jnp.nan, dtype)
    else:
        parallax = jnp.broadcast_to(jnp.asarray(parallax, dtype), (B,))
        parallax_err = jnp.broadcast_to(
            jnp.asarray(parallax_err, dtype), (B,))
    plx, plxw = _screen_parallax(parallax, parallax_err)

    bscore = _screen_block_scores(mags, wt_mag, plx, plxw, tabw, tabc,
                                  n_real if model_axis is None else M,
                                  cfg, block)
    if model_axis is None:
        bidx, idx = _select_blocks(bscore, nb, block)
        slabs = packed_blocks[bidx]              # (B, nb, block, W)
    else:
        bidx, idx, mine = _select_blocks_sharded(bscore, nb, block,
                                                 model_axis,
                                                 n_model_shards)
        bidx_l = jnp.where(mine, bidx - lax.axis_index(model_axis)
                           * nblocks, 0)
        slabs = packed_blocks[bidx_l]
        slabs = jnp.where(mine[:, :, None, None], slabs, 0.0)
        slabs = lax.psum(slabs, model_axis)      # one owner per slab
    P = nb * block
    slabs = slabs.reshape(B, P, W)
    coeffs = slabs[..., :3 * F].reshape(B, P, F, 3)
    aux = {name: slabs[..., 3 * F + i] for i, name in
           enumerate(aux_names)}

    def body(f, e, m, mc_star, p, pe):
        return _loglike_grid_body(f, e, m, mc_star, p, pe, None, None,
                                  cfg)

    with jax.default_matmul_precision("highest"):
        res = jax.vmap(body)(flux, fluxerr, mask, coeffs,
                             parallax, parallax_err)
    res.pop("n_iter", None)
    # Tile-padding models inside selected slabs are all-zero/faint rows
    # that can still fit well (the free flux scale absorbs offsets);
    # kill them by global index.
    n_real_g = n_real
    if jnp.ndim(idx) and n_real_g < M * n_model_shards:
        bad = idx >= n_real_g
        res["lnlike"] = jnp.where(bad, -1e30, res["lnlike"])
        res["chi2"] = jnp.where(bad, 1e30, res["chi2"])
    res["global_idx"] = idx
    res["aux"] = aux
    return res


__all__ = ["prepare_screen_xla", "loglike_grid_screened_xla"]
