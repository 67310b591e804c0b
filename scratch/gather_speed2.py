"""Careful slab-gather timing: varied indices, forced host sync."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

M, C, B = 750_080, 27, 64
key = jax.random.PRNGKey(0)
packed = jax.random.normal(key, (M, C), jnp.float32)
P = 16384
N = 6


def bench(name, fn, inputs):
    out = fn(inputs[0])
    np.asarray(jax.tree.leaves(out)[0])[0]
    t0 = time.perf_counter()
    for i in range(N):
        out = fn(inputs[i % len(inputs)])
    # force full materialization of the last output
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N
    sz = sum(o.size * 4 for o in jax.tree.leaves(out)) / 1e9
    print(f"{name:36s} {dt*1e3:8.2f} ms ({sz/dt:7.1f} GB/s)")


keys = [jax.random.PRNGKey(i) for i in range(N)]

for block in (1, 8, 64, 128):
    nb = P // block
    Mb = M // block * block
    p3 = packed[:Mb].reshape(Mb // block, block, C)
    idxs = [jax.random.randint(k, (B, nb), 0, Mb // block) for k in keys]
    g = jax.jit(lambda i, p: p[i])
    gg = lambda i: g(i, p3)
    bench(f"slab gather block={block}", gg, idxs)

# 2-D row gather exactly as _select_gather does it
idxs2 = [jax.random.randint(k, (B, P), 0, M) for k in keys]
g2 = jax.jit(lambda i, p: p[i])
bench("row gather 2-D (B,P) from (M,C)", lambda i: g2(i, packed), idxs2)

# row gather + reshape/transpose to (3,F,B,P) like _select_gather
F = 8


@jax.jit
def selgather(i, p):
    rows = p[i]
    coeffs = rows[..., :3 * F].reshape(B, P, F, 3).transpose(3, 2, 0, 1)
    return coeffs, rows[..., 3 * F:]


bench("row gather + transpose (funnel)", lambda i: selgather(i, packed),
      idxs2)
