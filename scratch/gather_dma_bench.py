"""DMA slab-gather kernel throughput vs table layout (real TPU).

Variants, at the production shape (C=32 packed rows, M=750k, B=128):
  A  current kernel: src (C, Mp), slab = C strided rows of block*4 B
     (what `_make_gather_call` ships today);
  B  block-major src (nblocks*C, block): slab = one CONTIGUOUS
     C*block*4 B chunk; dst unchanged (C rows strided over B*P);
  C  block-major src AND dst (B*nb*C, block): both sides contiguous;
  F  floor: one giant contiguous HBM->HBM copy of the same bytes.

Run:  python scratch/gather_dma_bench.py [nsem]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSEM_ARG = int(sys.argv[1]) if len(sys.argv) > 1 else 8

C, M, B = 32, 750_080, 128
N_ITER = 8


def make_gather_A(Mp, nb, block):
    NSEM = min(NSEM_ARG, nb)
    P = nb * block

    def kernel(bidx_ref, src_ref, out_ref):
        b = pl.program_id(0)

        def body(sems):
            def get_dma(j):
                i = bidx_ref[b, j]
                return pltpu.make_async_copy(
                    src_ref.at[:, pl.ds(i * block, block)],
                    out_ref.at[:, pl.ds(b * P + j * block, block)],
                    sems.at[j % NSEM])

            def issue(j, c):
                @pl.when(j >= NSEM)
                def _():
                    get_dma(j - NSEM).wait()
                get_dma(j).start()
                return c

            jax.lax.fori_loop(0, nb, issue, 0)

            def drain(j, c):
                get_dma(j).wait()
                return c

            jax.lax.fori_loop(max(nb - NSEM, 0), nb, drain, 0)

        pl.run_scoped(body, pltpu.SemaphoreType.DMA((NSEM,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY))
    return pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=jax.ShapeDtypeStruct((C, B * P),
                                                         jnp.float32))


def make_gather_B(Mp, nb, block):
    """Block-major src (nblocks*C, block); dst as in A."""
    NSEM = min(NSEM_ARG, nb)
    P = nb * block

    def kernel(bidx_ref, src_ref, out_ref):
        b = pl.program_id(0)

        def body(sems):
            def get_dma(j):
                i = bidx_ref[b, j]
                return pltpu.make_async_copy(
                    src_ref.at[pl.ds(i * C, C), :],
                    out_ref.at[:, pl.ds(b * P + j * block, block)],
                    sems.at[j % NSEM])

            def issue(j, c):
                @pl.when(j >= NSEM)
                def _():
                    get_dma(j - NSEM).wait()
                get_dma(j).start()
                return c

            jax.lax.fori_loop(0, nb, issue, 0)

            def drain(j, c):
                get_dma(j).wait()
                return c

            jax.lax.fori_loop(max(nb - NSEM, 0), nb, drain, 0)

        pl.run_scoped(body, pltpu.SemaphoreType.DMA((NSEM,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY))
    return pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=jax.ShapeDtypeStruct((C, B * P),
                                                         jnp.float32))


def make_gather_C(Mp, nb, block):
    """Block-major src and dst (both contiguous per slab)."""
    NSEM = min(NSEM_ARG, nb)

    def kernel(bidx_ref, src_ref, out_ref):
        b = pl.program_id(0)

        def body(sems):
            def get_dma(j):
                i = bidx_ref[b, j]
                return pltpu.make_async_copy(
                    src_ref.at[pl.ds(i * C, C), :],
                    out_ref.at[pl.ds((b * nb + j) * C, C), :],
                    sems.at[j % NSEM])

            def issue(j, c):
                @pl.when(j >= NSEM)
                def _():
                    get_dma(j - NSEM).wait()
                get_dma(j).start()
                return c

            jax.lax.fori_loop(0, nb, issue, 0)

            def drain(j, c):
                get_dma(j).wait()
                return c

            jax.lax.fori_loop(max(nb - NSEM, 0), nb, drain, 0)

        pl.run_scoped(body, pltpu.SemaphoreType.DMA((NSEM,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY))
    return pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=jax.ShapeDtypeStruct((B * nb * C, block),
                                                         jnp.float32))


def make_floor(rows, cols):
    def kernel(src_ref, out_ref):
        def body(sem):
            cp = pltpu.make_async_copy(src_ref, out_ref, sem)
            cp.start()
            cp.wait()

        pl.run_scoped(body, pltpu.SemaphoreType.DMA)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32))


def bench(name, fn, inputs, out_bytes):
    """VALUE-FETCH timing (the only methodology that measures sanely
    through the tunnel backend — chained/varied-input block_until_ready
    timing still read physically impossible numbers): every call
    reduces its gathered output to a scalar inside the jit, a final
    host fetch of the stacked scalars forces real execution of the
    whole chain, and the per-call time is the difference between two
    loop lengths (subtracting compile/dispatch/round-trip).  `fn` must
    be jitted and take (idx, src); the scalar reduce adds the same
    ~out_bytes/800GB/s read to every variant."""
    @jax.jit
    def reduced(idx, src):
        return fn(idx, src).sum(dtype=jnp.float32)

    pool = iter(inputs)

    def run(k):
        """k calls, each on a NEVER-REUSED input (the backend serves
        repeated (executable, inputs) pairs from a cache)."""
        batch = [next(pool) for _ in range(k)]
        jax.block_until_ready(batch)
        t0 = time.perf_counter()
        outs = [reduced(*b) for b in batch]
        np.asarray(jnp.stack(outs).sum())
        return time.perf_counter() - t0

    n = len(inputs)
    n1 = max(1, n // 5)
    n2 = 3 * n1
    run(n1)                              # warm (compile + caches)
    t1 = run(n1)
    t2 = run(n2)
    dt = (t2 - t1) / (n2 - n1)
    print(f"  {name:44s} {dt * 1e3:7.3f} ms "
          f"({2 * out_bytes / dt / 1e9:6.1f} GB/s rw)", flush=True)


def main():
    print(f"devices={jax.devices()} NSEM={NSEM_ARG}", flush=True)
    key = jax.random.PRNGKey(0)

    # NOTE: a small-shape correctness probe (Bs=8, nb=4, blk=128,
    # Ms=4096) crashes the tunnel backend with INTERNAL, eager or
    # jitted, reproducibly — production-kernel correctness is covered
    # by the funnel oracle-parity tests (interpret mode) instead.

    for block, k in ((128, 12288), (256, 8192), (256, 16384),
                     (512, 16384), (512, 65536)):
        nb = k // block
        Mp = (M // block) * block
        nblocks = Mp // block
        src_flat = jax.random.normal(key, (C, Mp), jnp.float32)
        src_bm = jnp.reshape(
            jnp.swapaxes(jnp.reshape(src_flat, (C, nblocks, block)), 0, 1),
            (nblocks * C, block))
        idxs = [jax.random.randint(jax.random.PRNGKey(i), (B, nb), 0,
                                   nblocks, jnp.int32)
                for i in range(25)]
        out_bytes = C * B * nb * block * 4
        print(f"block={block} k={k} nb={nb} "
              f"({out_bytes / 1e6:.0f} MB out)", flush=True)
        ga = make_gather_A(Mp, nb, block)
        bench("A strided src (current)", ga,
              [(i, src_flat) for i in idxs], out_bytes)
        gb = make_gather_B(Mp, nb, block)
        bench("B contiguous src, strided dst", gb,
              [(i, src_bm) for i in idxs], out_bytes)
        gc = make_gather_C(Mp, nb, block)
        bench("C contiguous src+dst", gc,
              [(i, src_bm) for i in idxs], out_bytes)

    rows = C * B * 16384 // 256
    fl = make_floor(rows, 256)
    z = jnp.zeros((1,), jnp.int32)
    srcs = [(z, jax.random.normal(jax.random.PRNGKey(i), (rows, 256),
                                  jnp.float32)) for i in range(5)]
    bench("F floor: one contiguous copy (268 MB)",
          lambda idx, src: fl(src), srcs, rows * 256 * 4)


if __name__ == "__main__":
    main()
