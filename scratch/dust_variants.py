"""Dust-prior MC interpolation variants, honest timing."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from brutus_tpu.config import DustPriorConfig
from brutus_tpu.priors import dust_lnprior

B, K, Nmc, NL = 64, 4096, 50, 120
cfg = DustPriorConfig()
key = jax.random.PRNGKey(0)
NREP = 6
dists = [jax.random.uniform(jax.random.PRNGKey(i), (B, K, Nmc),
                            minval=0.1, maxval=9.9) for i in range(NREP)]
avs = [jax.random.uniform(jax.random.PRNGKey(100 + i), (B, K, Nmc),
                          minval=0.0, maxval=2.0) for i in range(NREP)]
av_dist = jnp.linspace(0.05, 10.0, NL)
av_mean = jnp.linspace(0.0, 1.5, NL)
av_std = jnp.full(NL, 0.2)
jax.block_until_ready((dists, avs))


def bench(name, fn):
    out = fn(dists[0], avs[0])
    np.asarray(out[0, 0, 0])
    t0 = time.perf_counter()
    for i in range(NREP):
        out = fn(dists[i], avs[i])
        np.asarray(out[0, 0, 0])
    dt = (time.perf_counter() - t0) / NREP * 1e3
    print(f"{name:30s} {dt:8.2f} ms")
    return out


@jax.jit
def hat(d, a):
    return dust_lnprior(d, a, av_dist, av_mean, av_std, cfg)


@jax.jit
def gather_v(d, a):
    n = NL
    d0 = av_dist[0]
    dx = av_dist[1] - av_dist[0]
    u = jnp.clip((d - d0) / dx, 0.0, n - 1.0)
    i0 = jnp.clip(u.astype(jnp.int32), 0, n - 2)
    frac = u - i0
    m0 = av_mean[i0]
    m1 = av_mean[i0 + 1]
    s0 = av_std[i0]
    s1 = av_std[i0 + 1]
    mean_i = m0 * (1 - frac) + m1 * frac
    std_i = s0 * (1 - frac) + s1 * frac
    mean_d = cfg.scale * mean_i + cfg.offset
    err_d = cfg.smooth * cfg.scale * std_i
    err_d = jnp.sqrt(err_d ** 2 + cfg.scatter ** 2)
    chi2 = (a - mean_d) ** 2 / err_d ** 2
    return -0.5 * (chi2 + jnp.log(2 * jnp.pi * err_d ** 2))


@jax.jit
def onehot_mm(d, a):
    n = NL
    d0 = av_dist[0]
    dx = av_dist[1] - av_dist[0]
    u = jnp.clip((d - d0) / dx, 0.0, n - 1.0).reshape(-1)
    ladder = jnp.arange(n, dtype=u.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(u[:, None] - ladder))
    tab = jnp.stack([av_mean, av_std], axis=-1)       # (NL, 2)
    mi = w @ tab                                       # MXU
    mean_i = mi[:, 0].reshape(d.shape)
    std_i = mi[:, 1].reshape(d.shape)
    mean_d = cfg.scale * mean_i + cfg.offset
    err_d = cfg.smooth * cfg.scale * std_i
    err_d = jnp.sqrt(err_d ** 2 + cfg.scatter ** 2)
    chi2 = (a - mean_d) ** 2 / err_d ** 2
    return -0.5 * (chi2 + jnp.log(2 * jnp.pi * err_d ** 2))


@jax.jit
def hat_fori(d, a):
    n = NL
    d0 = av_dist[0]
    dx = av_dist[1] - av_dist[0]
    u = jnp.clip((d - d0) / dx, 0.0, n - 1.0)

    def body(l, acc):
        am, asd = acc
        w = jnp.maximum(0.0, 1.0 - jnp.abs(u - l))
        return am + w * av_mean[l], asd + w * av_std[l]

    mean_i, std_i = jax.lax.fori_loop(
        0, n, body, (jnp.zeros_like(u), jnp.zeros_like(u)))
    mean_d = cfg.scale * mean_i + cfg.offset
    err_d = cfg.smooth * cfg.scale * std_i
    err_d = jnp.sqrt(err_d ** 2 + cfg.scatter ** 2)
    chi2 = (a - mean_d) ** 2 / err_d ** 2
    return -0.5 * (chi2 + jnp.log(2 * jnp.pi * err_d ** 2))


r0 = bench("hat dense (current)", hat)
r1 = bench("int gather", gather_v)
r2 = bench("one-hot matmul", onehot_mm)
r3 = bench("hat fori accumulate", hat_fori)
print("max|gather-hat|", float(jnp.max(jnp.abs(r1 - r0))))
print("max|mm-hat|    ", float(jnp.max(jnp.abs(r2 - r0))))
print("max|fori-hat|  ", float(jnp.max(jnp.abs(r3 - r0))))
