"""Slab-gather throughput vs slab size on TPU."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

M, C, B = 750_080, 27, 64
key = jax.random.PRNGKey(0)
packed = jax.random.normal(key, (M, C), jnp.float32)
P = 16384

for pad_c in (27, 32):
    pk = packed if pad_c == C else jnp.pad(packed, ((0, 0), (0, pad_c - C)))
    for block in (1, 8, 16, 64, 128, 512):
        nb = P // block
        Mb = M // block * block
        p3 = pk[:Mb].reshape(Mb // block, block, pad_c)
        idx = jax.random.randint(key, (B, nb), 0, Mb // block)

        g = jax.jit(lambda i, p: p[i])
        out = g(idx, p3)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(8):
            out = g(idx, p3)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 8
        gb = out.size * 4 / 1e9
        print(f"C={pad_c:2d} block={block:4d} nb={nb:6d}: {dt*1e3:7.2f} ms "
              f"({gb/dt:6.1f} GB/s)")
