"""
Fused Pallas TPU kernel for the posterior Monte-Carlo integration.

Replaces the XLA chain of `lnpost_grid`'s MC stage — MVN transform of
the `(s, Av, Rv)` draws, Galactic 3-D prior, 3-D dust prior
(hat-function ladder interpolation), parallax prior, bounds mask, and
the per-model logsumexp over draws (reference `brutus/fitting.py:
1068-1098`) — with ONE kernel pass in which every intermediate lives in
registers/VMEM.

Why: the dust hat interpolation alone costs ~480 flops per draw and in
XLA materializes a `(B, K, Nmc, Nladder)` weight tensor (~6 GB/batch,
measured 40-60 ms); the full fused kernel runs the entire stage in a
few ms.  Math parity is exact (same formulas as `priors.gal_lnprior`
/ `priors.dust_lnprior` / `priors.parallax_lnprior`, same `z` draws —
the standard normals are generated outside and fed in, so results
match the XLA path to float32 association error).

Layout: models ride the 128-wide lanes (tile T), the Nmc draws ride
the sublane axis in chunks of 8; per-model constants arrive as a
16-row table `(B, 16, K)`, per-star scalars as `(B, 1, 16)`, the dust
ladder as `(B, 128, 8)` (column 0 = mean, 1 = std).

Cite: reference brutus/fitting.py:1068-1098 (MC prior integration),
brutus/pdf.py:476-749 (gal prior), brutus/pdf.py:752-840 (dust prior),
brutus/pdf.py:144-175 (parallax prior).
"""

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import PosteriorConfig, GalPriorConfig, DustPriorConfig
from ..coords import _M, _T
from ..utils import psd_repair_parts, cholesky3_parts

NEG_BIG = -1e30
LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)

# Table row layout (matches `posterior._batch_fns.pre`).  Rows 3-8
# carry the PRECISION parts (s_den, a_den, r_den, sa, sr, ar); the
# covariance repair + Cholesky runs IN-KERNEL (`utils.psd_repair_parts`
# / `cholesky3_parts` — the same functions the XLA path uses, so the
# two paths stay bit-identical in interpret mode), which (a) removes
# the (B, K, 3, 3) inverse/repair/Cholesky chains from the select
# stage and (b) lets the tile-skip below skip that work for culled
# tiles too.  The repaired covariance parts come back through the
# spare aggregate rows (AGG_COV) for the resampled `cov_sar` output.
ROW_MEAN_S, ROW_MEAN_A, ROW_MEAN_R = 0, 1, 2
ROW_I00, ROW_I11, ROW_I22, ROW_I01, ROW_I02, ROW_I12 = 3, 4, 5, 6, 7, 8
ROW_FEH, ROW_LOGA = 9, 10
ROW_VALID = 11
N_TAB_ROWS = 16
AGG_COV = 2                         # agg rows 2-7: cov parts

# Per-star scalar layout.
SC_V0, SC_V1, SC_V2 = 0, 1, 2        # M @ unit(l, b) direction
SC_PM, SC_PW, SC_PLN = 3, 4, 5      # parallax mean / weight / lnorm
SC_D0, SC_IDX = 6, 7                # dust ladder origin / 1/dx
SC_COV = 8                          # dust coverage flag (1.0 / 0.0)
SC_UMAX = 9                         # dust ladder clip bound (n_real - 1)
N_SCALARS = 16

NL_PAD = 128                        # padded dust-ladder length


def _age_consts(gal_cfg, feh_mean):
    """Scalar constants of the truncated-normal age prior for one
    Galactic component (reference `brutus/pdf.py:410-473`)."""
    c = gal_cfg
    age_mean = ((c.max_age - c.min_age)
                / (1.0 + math.exp((feh_mean - c.feh_age_ctr)
                                  / c.feh_age_scale)) + c.min_age)
    age_sigma = (c.max_age - age_mean) / c.nsigma_from_max_age
    age_sigma = min(max(age_sigma, c.min_sigma), c.max_sigma)
    a = (c.min_age - age_mean) / age_sigma
    b = (c.max_age - age_mean) / age_sigma
    lo = age_sigma * a + age_mean
    hi = age_sigma * b + age_mean
    lndenom = (math.log(age_sigma / 2.0)
               + math.log(math.erf(b / math.sqrt(2.0))
                          - math.erf(a / math.sqrt(2.0))))
    return age_mean, age_sigma, lo, hi, lndenom


def _bits_to_uniform(bits):
    """int32 random bits -> float32 uniforms in [0, 1) via the
    exponent trick (Mosaic has no uint32->float cast): put 23 random
    mantissa bits under exponent 127 => [1, 2), subtract 1."""
    m = lax.shift_right_logical(bits, 9)
    fb = jnp.bitwise_or(m, jnp.int32(0x3F800000))
    return pltpu.bitcast(fb, jnp.float32) - 1.0


@lru_cache(maxsize=32)
def _make_mc_kernel(cfg: PosteriorConfig, gal_cfg: GalPriorConfig,
                    dust_cfg: DustPriorConfig, n_mc, nmc_pad,
                    use_feh, use_loga, use_dust, use_gal,
                    kernel_rng=False, row_map=None):
    """`row_map` (static tuple, len 11) remaps the table-row indices
    `(mean_s, mean_a, mean_r, i00, i11, i22, i01, i02, i12, feh,
    loga)` into the caller's table layout.  Used by the funnel's
    kernel-packed path: the fit kernel's stacked pack IS the table
    (its bytes already lie fields-major), so the select stage passes
    it through untouched and model validity rides a separate one-row
    input instead of ROW_VALID."""
    g = gal_cfg
    t0, t1, t2 = (float(x) for x in _T)
    avmin, avmax = cfg.avlim
    rvmin, rvmax = cfg.rvlim
    z_sol = abs(g.Z_solar)
    # Halo solar normalization (reference brutus/pdf.py:349-360).
    rp_sol = math.sqrt(g.R_solar ** 2 + g.Z_solar ** 2 + g.r_q_halo ** 2)
    q_sol = g.q_halo_inf - (g.q_halo_inf - g.q_halo_ctr) * math.exp(
        1.0 - rp_sol / g.r_q_halo)
    reff_sol_halo = math.sqrt(g.R_solar ** 2 + (g.Z_solar / q_sol) ** 2
                              + g.Rs_halo ** 2)
    ln_f_thick = math.log(g.f_thick)
    ln_f_halo = math.log(g.f_halo)
    comps = [
        (g.feh_thin, g.feh_thin_sigma),
        (g.feh_thick, g.feh_thick_sigma),
        (g.feh_halo, g.feh_halo_sigma),
    ]
    age_c = [_age_consts(g, mu) for mu, _ in comps]
    LN10 = math.log(10.0)

    def kernel(*refs):
        flag_ref = refs[0]
        lnmc_ref, dist_ref, red_ref, dred_ref, agg_ref = refs[-5:]
        b = pl.program_id(0)
        t_id = pl.program_id(1)
        # Tile-skip: `top_k` sorts the selection best-first, so culled
        # (NEG_BIG) models form a SUFFIX of the K axis and whole model
        # tiles are typically dead (realistic grids keep ~750 of 4096
        # selected models past the culls).  Skipped tiles write flag
        # constants instead of integrating 50 draws x T models; exact
        # semantics because an invalid model can never be resampled
        # (the all-invalid fallback star keeps every tile active —
        # see `mc_integrate`).
        active = flag_ref[b, t_id] > 0

        @pl.when(jnp.logical_not(active))
        def _skipped():
            shp = lnmc_ref.shape[1:]
            dt = lnmc_ref.dtype
            lnmc_ref[0] = jnp.full(shp, NEG_BIG, dt)
            dist_ref[0] = jnp.ones(shp, dt)
            red_ref[0] = jnp.zeros(shp, dt)
            dred_ref[0] = jnp.zeros(shp, dt)
            agg_ref[0] = jnp.concatenate(
                [jnp.full((1, shp[1]), NEG_BIG, dt),
                 jnp.zeros((7, shp[1]), dt)], axis=0)

        @pl.when(active)
        def _active():
            _body(*refs)

    def _body(*refs):
        i = 1
        if kernel_rng:
            seed_ref = refs[i]
            i += 1
        tab_ref, scal_ref, dust_ref = refs[i:i + 3]
        i += 3
        valid_ref = None
        if row_map is not None:
            valid_ref = refs[i]
            i += 1
        if not kernel_rng:
            z_ref = refs[i]
        else:
            b = pl.program_id(0)
            # Distinct stream per (star, model tile); Mosaic's
            # prng_seed takes at most two values, so fold the tile
            # index into the second word.
            pltpu.prng_seed(seed_ref[b, 0],
                            seed_ref[b, 1] + pl.program_id(1))
        lnmc_ref, dist_ref, red_ref, dred_ref, agg_ref = refs[-5:]
        tab = tab_ref[0]                       # (n_tab_rows, T)
        rm = row_map if row_map is not None else (
            ROW_MEAN_S, ROW_MEAN_A, ROW_MEAN_R, ROW_I00, ROW_I11,
            ROW_I22, ROW_I01, ROW_I02, ROW_I12, ROW_FEH, ROW_LOGA)
        row = lambda i: tab[i:i + 1, :]        # (1, T)
        sc = scal_ref[0]                       # (1, 16)
        scv = lambda i: sc[:, i:i + 1]         # (1, 1)

        mean_s, mean_a, mean_r = row(rm[0]), row(rm[1]), row(rm[2])
        # In-kernel covariance: stable inverse + escalating PSD repair
        # + Cholesky of the (s, Av, Rv) precision parts (reference
        # brutus/fitting.py:1039-1065 + utils.py:845).  Same functions
        # as the XLA path (utils parts toolkit) => bit-identical there;
        # dead tiles skip all of it.
        icov_p = tuple(row(rm[3 + j]) for j in range(6))
        validm = (valid_ref[0] if valid_ref is not None
                  else row(ROW_VALID)) > 0.5
        cov_p = psd_repair_parts(icov_p, mean_s, validm, cfg.psd_width,
                                 cfg.psd_max_passes,
                                 mvn_eps=cfg.mvn_eps)
        L00, L10, L11, L20, L21, L22 = cholesky3_parts(cov_p)

        v0, v1, v2 = scv(SC_V0), scv(SC_V1), scv(SC_V2)
        pm, pw, pln = scv(SC_PM), scv(SC_PW), scv(SC_PLN)
        d0, idx_s, covered = scv(SC_D0), scv(SC_IDX), scv(SC_COV)
        umax = scv(SC_UMAX)

        if use_dust:
            dt = dust_ref[0]                                  # (128, 8)
            mean_lad = dt[:, 0:1][:, :, None]                 # (128,1,1)
            std_lad = dt[:, 1:2][:, :, None]
            iota_l = lax.broadcasted_iota(jnp.int32, (NL_PAD, 1, 1),
                                          0).astype(tab.dtype)

        # Per-model (draw-independent) mixture-weight ingredients.
        if use_feh:
            feh = row(rm[9])
            feh_g = [(-0.5 * ((mu - feh) ** 2 / sig ** 2)
                      - 0.5 * math.log(2.0 * math.pi * sig ** 2))
                     for mu, sig in comps]
        if use_loga:
            age = jnp.exp(LN10 * row(rm[10])) * 1e-9
            age_g = []
            for mu_a, sig_a, lo, hi, lden in age_c:
                xi = (age - mu_a) / sig_a
                ans = -LOG_SQRT_2PI - 0.5 * xi * xi - lden
                age_g.append(jnp.where((age < lo) | (age > hi),
                                       NEG_BIG, ans))

        m_acc = jnp.full((1, tab.shape[1]), NEG_BIG, tab.dtype)
        s_acc = jnp.zeros((1, tab.shape[1]), tab.dtype)
        n_acc = jnp.zeros((1, tab.shape[1]), tab.dtype)

        n_chunks = nmc_pad // 8
        for c in range(n_chunks):
            sl = slice(c * 8, (c + 1) * 8)
            if kernel_rng:
                # Box-Muller from in-kernel random bits: no threefry
                # generation nor a (B, 3, NMC_PAD, K) HBM round trip.
                shp = (8, tab.shape[1])
                u1 = jnp.maximum(
                    _bits_to_uniform(pltpu.prng_random_bits(shp)), 1e-7)
                u2 = _bits_to_uniform(pltpu.prng_random_bits(shp))
                u3 = jnp.maximum(
                    _bits_to_uniform(pltpu.prng_random_bits(shp)), 1e-7)
                u4 = _bits_to_uniform(pltpu.prng_random_bits(shp))
                r1 = jnp.sqrt(-2.0 * jnp.log(u1))
                a1 = (2.0 * math.pi) * u2
                r2 = jnp.sqrt(-2.0 * jnp.log(u3))
                a2 = (2.0 * math.pi) * u4
                z0 = r1 * jnp.cos(a1)
                z1 = r1 * jnp.sin(a1)
                z2 = r2 * jnp.cos(a2)
            else:
                z0 = z_ref[0, 0, sl, :]        # (8, T)
                z1 = z_ref[0, 1, sl, :]
                z2 = z_ref[0, 2, sl, :]
            # MVN transform (utils.mvn3_transform).
            s = mean_s + L00 * z0
            a = mean_a + L10 * z0 + L11 * z1
            r = mean_r + L20 * z0 + L21 * z1 + L22 * z2

            s_pos = jnp.maximum(s, 1e-30)
            par = jnp.sqrt(s_pos)
            dist = 1.0 / par

            lnp = jnp.zeros_like(s)
            if use_gal:
                # Galactocentric (R, Z) via the per-star direction
                # vector (coords.galactic_to_galactocentric).
                X = dist * v0 + t0
                Y = dist * v1 + t1
                Zg = dist * v2 + t2
                R2 = X * X + Y * Y
                R = jnp.sqrt(R2)
                vol = 2.0 * jnp.log(dist)
                # thin + thick disks (priors.logn_disk).
                reff_t = jnp.sqrt(R2 + g.Rs_thin ** 2)
                lt = -((reff_t - g.R_solar) / g.R_thin
                       + (jnp.abs(Zg) - z_sol) / g.Z_thin) + vol
                reff_k = jnp.sqrt(R2 + g.Rs_thick ** 2)
                lk = -((reff_k - g.R_solar) / g.R_thick
                       + (jnp.abs(Zg) - z_sol) / g.Z_thick) \
                    + vol + ln_f_thick
                # halo (priors.logn_halo).
                r2 = R2 + Zg * Zg
                rp = jnp.sqrt(r2 + g.r_q_halo ** 2)
                q = g.q_halo_inf - (g.q_halo_inf - g.q_halo_ctr) \
                    * jnp.exp(1.0 - rp / g.r_q_halo)
                reff_h = jnp.sqrt(R2 + (Zg / q) ** 2 + g.Rs_halo ** 2)
                lh = -g.eta_halo * jnp.log(reff_h / reff_sol_halo) \
                    + vol + ln_f_halo
                mx = jnp.maximum(jnp.maximum(lt, lk), lh)
                et, ek, eh = (jnp.exp(lt - mx), jnp.exp(lk - mx),
                              jnp.exp(lh - mx))
                lnden = mx + jnp.log(et + ek + eh)
                lnp = lnp + lnden
                if use_feh or use_loga:
                    lw = [lt - lnden, lk - lnden, lh - lnden]
                if use_feh:
                    t_ = [feh_g[i] + lw[i] for i in range(3)]
                    mf = jnp.maximum(jnp.maximum(t_[0], t_[1]), t_[2])
                    lnp = lnp + mf + jnp.log(
                        jnp.exp(t_[0] - mf) + jnp.exp(t_[1] - mf)
                        + jnp.exp(t_[2] - mf))
                if use_loga:
                    t_ = [age_g[i] + lw[i] for i in range(3)]
                    ma = jnp.maximum(jnp.maximum(t_[0], t_[1]), t_[2])
                    lnp = lnp + ma + jnp.log(
                        jnp.exp(t_[0] - ma) + jnp.exp(t_[1] - ma)
                        + jnp.exp(t_[2] - ma))

            if use_dust:
                # Gather-free hat interpolation (priors.dust_lnprior),
                # ladder processed in 16-point slices so the live
                # (16, 8, T) weight block stays register-sized (the
                # full (128, 8, T) block blew the scoped-VMEM limit).
                u = jnp.clip((dist - d0) * idx_s, 0.0, umax)
                mean_i = jnp.zeros_like(u)
                std_i = jnp.zeros_like(u)
                for ls in range(0, NL_PAD, 16):
                    w = jnp.maximum(
                        0.0, 1.0 - jnp.abs(u[None]
                                           - iota_l[ls:ls + 16]))
                    mean_i = mean_i + jnp.sum(
                        w * mean_lad[ls:ls + 16], axis=0)
                    std_i = std_i + jnp.sum(
                        w * std_lad[ls:ls + 16], axis=0)
                mean_d = dust_cfg.scale * mean_i + dust_cfg.offset
                err2 = ((dust_cfg.smooth * dust_cfg.scale * std_i) ** 2
                        + dust_cfg.scatter ** 2)
                dchi2 = (a - mean_d) ** 2 / err2
                dpdf = -0.5 * (dchi2 + jnp.log(2.0 * math.pi * err2))
                lnp = lnp + jnp.where(covered > 0.5, dpdf, 0.0)

            # parallax prior (priors.parallax_lnprior; pw/pln pre-gated)
            lnp = lnp - 0.5 * ((par - pm) ** 2 * pw + pln)

            inb = ((s >= 1e-20) & (a >= avmin) & (a <= avmax)
                   & (r >= rvmin) & (r <= rvmax))
            if (c + 1) * 8 > n_mc:
                rows = lax.broadcasted_iota(jnp.int32, s.shape, 0) \
                    + c * 8
                inb = inb & (rows < n_mc)
            lnp = jnp.where(inb & jnp.isfinite(lnp), lnp, NEG_BIG)

            lnmc_ref[0, sl, :] = lnp
            dist_ref[0, sl, :] = dist
            red_ref[0, sl, :] = a
            dred_ref[0, sl, :] = r

            # online logsumexp + effective-sample count over draws
            cmax = jnp.max(lnp, axis=0, keepdims=True)
            nmax = jnp.maximum(m_acc, cmax)
            s_acc = s_acc * jnp.exp(m_acc - nmax) + jnp.sum(
                jnp.exp(lnp - nmax), axis=0, keepdims=True)
            m_acc = nmax
            n_acc = n_acc + jnp.sum(inb.astype(tab.dtype), axis=0,
                                    keepdims=True)

        lse = m_acc + jnp.log(jnp.maximum(s_acc, 1e-37))
        agg_ref[0] = jnp.concatenate(
            [lse, n_acc] + [c for c in cov_p], axis=0)

    return kernel


@lru_cache(maxsize=32)
def _make_mc_call(cfg, gal_cfg, dust_cfg, n_mc, nmc_pad, use_feh,
                  use_loga, use_dust, use_gal, B, K, tile, dtype,
                  interpret, kernel_rng=False, row_map=None,
                  n_tab_rows=N_TAB_ROWS):
    num_tiles = K // tile
    kern = _make_mc_kernel(cfg, gal_cfg, dust_cfg, n_mc, nmc_pad,
                           use_feh, use_loga, use_dust, use_gal,
                           kernel_rng, row_map)
    draw_spec = pl.BlockSpec((1, nmc_pad, tile), lambda b, t, *_: (b, 0, t),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, n_tab_rows, tile), lambda b, t, *_: (b, 0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, N_SCALARS), lambda b, t, *_: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NL_PAD, 8), lambda b, t, *_: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if row_map is not None:
        # Model validity rides its own one-row plane (the packed table
        # has no VALID row).
        in_specs.append(
            pl.BlockSpec((1, 1, tile), lambda b, t, *_: (b, 0, t),
                         memory_space=pltpu.VMEM))
    out_specs = [draw_spec, draw_spec, draw_spec, draw_spec,
                 pl.BlockSpec((1, 8, tile), lambda b, t, *_: (b, 0, t),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B, nmc_pad, K), dtype)] * 4 \
        + [jax.ShapeDtypeStruct((B, 8, K), dtype)]
    # The fully-unrolled chunk loop sits right at the 16 MB default
    # scoped-VMEM limit (v5e has 128 MB); give Mosaic headroom.
    params = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024))
    if not kernel_rng:
        in_specs.append(
            pl.BlockSpec((1, 3, nmc_pad, tile),
                         lambda b, t, *_: (b, 0, 0, t),
                         memory_space=pltpu.VMEM))
    # Scalar prefetch (SMEM): (B, num_tiles) int32 tile-active flags,
    # plus the (B, 2) int32 PRNG seeds in kernel_rng mode.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if kernel_rng else 1,
        grid=(B, num_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    return pl.pallas_call(kern, grid_spec=grid_spec,
                          out_shape=out_shape, interpret=interpret,
                          **params)


def mc_integrate(tab, scal, dusttab, n_mc, nmc_pad,
                 cfg: PosteriorConfig, gal_cfg: GalPriorConfig,
                 dust_cfg: DustPriorConfig, use_feh, use_loga, use_dust,
                 use_gal=True, tile=256, interpret=None, z=None,
                 seeds=None, valid=None, row_map=None):
    """Run the fused MC-integration kernel (eager dispatch).

    Parameters
    ----------
    tab : (B, 16, K) per-model rows (see ROW_* layout).
    scal : (B, 1, 16) per-star scalars (see SC_* layout).
    dusttab : (B, 128, 8) dust ladder (col 0 mean, col 1 std).
    z : (B, 3, NMC_PAD, K) standard-normal draws, or None with
        `seeds` (B, 2) int32 to generate draws in-kernel (Box-Muller
        from the hardware PRNG; TPU only — interpret mode lacks
        `prng_seed`).
    valid : optional (B, K) bool validity of each selected model
        (post-cull).  Model tiles with no valid model skip the whole
        integration (see the kernel's tile-skip) — culled models'
        outputs are never consumed, EXCEPT for all-invalid stars whose
        chi2-fallback resampling reads every model: those stars keep
        all tiles active.

    Returns
    -------
    (lnmc, dist, red, dred, agg): `(B, NMC_PAD, K)` draw fields plus
    the `(B, 8, K)` aggregate (row 0 = logsumexp over draws, row 1 =
    in-bounds count, rows 2-7 = the repaired covariance parts
    `c00, c11, c22, c01, c02, c12` computed in-kernel from the
    precision rows).
    """
    B, n_tab, K = tab.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t = tile
    while K % t:
        t //= 2
    kernel_rng = seeds is not None
    call = _make_mc_call(cfg, gal_cfg, dust_cfg, int(n_mc), int(nmc_pad),
                         bool(use_feh), bool(use_loga), bool(use_dust),
                         bool(use_gal), B, K, t, str(tab.dtype),
                         interpret, kernel_rng,
                         tuple(row_map) if row_map is not None else None,
                         int(n_tab))
    if valid is None:
        flags = jnp.ones((B, K // t), jnp.int32)
    else:
        tile_any = jnp.any(valid.reshape(B, K // t, t), axis=-1)
        star_dead = ~jnp.any(valid, axis=1)
        flags = (tile_any | star_dead[:, None]).astype(jnp.int32)
    args = [tab, scal, dusttab]
    if row_map is not None:
        # (B, 1, K) f32 validity plane (see _make_mc_call).
        vplane = (valid if valid is not None
                  else jnp.ones((B, K), bool))
        args.append(vplane[:, None, :].astype(tab.dtype))
    if kernel_rng:
        return call(flags, seeds, *args)
    return call(flags, *args, z)


__all__ = ["mc_integrate", "N_TAB_ROWS", "N_SCALARS", "NL_PAD"]
