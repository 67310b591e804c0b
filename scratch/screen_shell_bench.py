"""DEPRECATED — DO NOT TRUST: both the plain and the scan-chained
variants read physically impossible numbers through the tunnel backend
(executions elided; a warmup sharing inputs with the timed run is
always served from cache).  The question was settled IN-PIPELINE
instead: `bench.py --loglike-only --screen-score debug_lin` == full
(VPU score math is free) and `--screen-matmul split` vs `wide` (+8%).

Original docstring: What bounds the screening kernel: MXU column
streaming, the VPU score math, or HBM table reads?

Times three Pallas variants at the production shapes (B=128 stars,
M=750k models, tile=512, bf16 tables identical in layout to
`prepare_screen`'s):

  shell    — ONLY the two wide matmuls per tile ((B,48)@(48,6T) and
             (B,96)@(96,3T)) + a trivial max so nothing is DCE'd.
             = the screen's MXU + HBM cost, no score math.
  score    — shell + the full `screen_score_from_sums` + block max
             (functionally the real screen v4; cross-checked against
             `_make_screen_call` timing).
  halfk    — shell with K halved (24/48): detects K-depth sensitivity
             (column streaming should be invariant to K <= 128).

Timing: jitted, distinct staged inputs per iteration, one
block_until_ready at the end (CLAUDE.md benchmarking rules).

Run on TPU:  python scratch/screen_shell_bench.py [n_iter]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, M, TILE = 128, 750_080, 512
N_ITER = int(sys.argv[1]) if len(sys.argv) > 1 else 8
NT = M // TILE


def make_call(kw, kc, score_math):
    def kernel(wb_ref, cb_ref, tabw_ref, tabc_ref, out_ref):
        outw = jax.lax.dot_general(
            wb_ref[0], tabw_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (B, 6T)
        outc = jax.lax.dot_general(
            cb_ref[0], tabc_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (B, 3T)
        T = outw.shape[1] // 6
        if score_math:
            from brutus_tpu.ops.pallas_loglike import (
                screen_score_from_sums)
            from brutus_tpu.config import FitConfig
            a = [outw[:, i * T:(i + 1) * T] for i in range(6)]
            c = [outc[:, i * T:(i + 1) * T] for i in range(3)]
            ones = jnp.ones((B, 1), jnp.float32)
            score = screen_score_from_sums(
                a[0], a[1], a[2], a[3], a[4], a[5], c[0], c[1], c[2],
                ones * 37.0, ones * 2.0, ones * 900.0, ones,
                ones * 25.0, FitConfig())
        else:
            score = outw[:, :T] + outc[:, :T]
        out_ref[0] = jnp.max(score.reshape(B, T // 256, 256), axis=-1)

    wspec = pl.BlockSpec((1, B, kw), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, B, kc), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    tw = pl.BlockSpec((1, kw, 6 * TILE), lambda t: (0, 0, t),
                      memory_space=pltpu.VMEM)
    tc = pl.BlockSpec((1, kc, 3 * TILE), lambda t: (0, 0, t),
                      memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, B, TILE // 256), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(NT,),
        in_specs=[wspec, cspec, tw, tc],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((NT, B, TILE // 256),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )


def bench(name, kw, kc, score_math):
    """On-device scan chain: iteration i+1's star matrices depend on
    iteration i's output, so the backend must truly execute every
    iteration; one dispatch + one sync (tunnel latency amortizes).
    Per-iter = slope between two scan lengths."""
    call = make_call(kw, kc, score_math)
    key = jax.random.PRNGKey(0)
    tabw = jax.random.normal(key, (1, kw, 6 * M), jnp.bfloat16)
    tabc = jax.random.normal(key, (1, kc, 3 * M), jnp.bfloat16)

    def run(n):
        def mk(seed):
            ks = jax.random.split(jax.random.PRNGKey(seed), n)
            wbs = jax.vmap(lambda k: jax.random.normal(
                k, (1, B, kw), jnp.bfloat16))(ks)
            cbs = jax.vmap(lambda k: jax.random.normal(
                k, (1, B, kc), jnp.bfloat16))(ks)
            return wbs, cbs

        @jax.jit
        def scanner(wbs, cbs, tabw, tabc):
            def body(carry, x):
                wb, cb = x
                wb = wb + carry.astype(jnp.bfloat16)
                out = call(wb, cb, tabw, tabc)
                return out[0, 0, 0] * 1e-38, out[0, 0, 0]
            return jax.lax.scan(body, jnp.float32(0.0), (wbs, cbs))

        # Warm up on a DIFFERENT input set than the timed run: the
        # backend serves repeated (executable, inputs) pairs from an
        # execution cache (CLAUDE.md).
        warm = mk(100 + n)
        timed = mk(200 + n)
        jax.block_until_ready((warm, timed))
        jax.block_until_ready(scanner(*warm, tabw, tabc))
        t0 = time.perf_counter()
        out = scanner(*timed, tabw, tabc)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    n1, n2 = max(2, N_ITER // 4), N_ITER
    t1, t2 = run(n1), run(n2)
    dt = (t2 - t1) / (n2 - n1)
    cols = 9 * M
    print(f"  {name:28s} {dt * 1e3:7.3f} ms/iter  "
          f"({cols / dt / 1e9:5.2f} Gcol/s, "
          f"tables {(kw * 6 + kc * 3) * M * 2 / dt / 1e9:6.1f} GB/s; "
          f"t({n1})={t1*1e3:.1f} t({n2})={t2*1e3:.1f})",
          flush=True)
    return dt


def main():
    print(f"devices={jax.devices()} B={B} M={M} tile={TILE}", flush=True)
    bench("shell (matmuls only)", 48, 96, False)
    bench("score (full screen math)", 48, 96, True)
    bench("halfk (K=24/48)", 24, 48, False)
    bench("shell again (stability)", 48, 96, False)


if __name__ == "__main__":
    main()
