"""Per-component timing at the benchmark shape [4096 chains x 128 particles].

Times, each in isolation on the real TPU: the fused weight+resample kernel,
one exact-Gillespie day-step, the Poisson log-pmf, and the per-step key
split — so the PF-sweep wall time (scripts/profile_hotpath.py) can be
attributed and the next optimization targeted.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bayesssm_tpu.models.distributions import pois_logpmf
from bayesssm_tpu.models.sir import gillespie_step
from bayesssm_tpu.ops.resampling import _positions
from bayesssm_tpu.ops.resampling_pallas import fused_weight_resample

C, N, D = 4096, 128, 2


def timed(fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    lw = jax.random.normal(k1, (C, N), jnp.float32)
    particles = jax.random.normal(k2, (C, N, D), jnp.float32) * 10 + 100
    uniform = jnp.full((C, N), 1.0 / N, jnp.float32)
    thr = jnp.full((C,), N / 2.0, jnp.float32)

    def fused(lw, particles, pos):
        return jax.vmap(
            lambda a, b, c, d, e: fused_weight_resample(a, b, c, d, e, always_resample=False)
        )(lw, particles, pos, uniform, thr)

    def mkpos(k):
        return jax.vmap(
            lambda kk: _positions(kk, "stratified", (), N, jnp.float32(N), jnp.float32)
        )(jax.random.split(k, C))

    pos = jax.jit(mkpos)(k3)
    jf = jax.jit(fused)
    t = timed(jf, lw, particles, pos)
    print(f"fused weight+resample [{C}x{N}x{D}]: {t*1e3:.3f} ms", flush=True)

    t = timed(jax.jit(mkpos), k3)
    print(f"positions (RNG + strata) [{C}x{N}]: {t*1e3:.3f} ms", flush=True)

    state = jnp.stack(
        [jnp.full((C * N,), 430.0), jnp.full((C * N,), 70.0)], axis=-1
    )
    g = jax.jit(lambda k, s: gillespie_step(k, s, 0.5, 0.2, 500.0))
    t = timed(g, key, state)
    print(f"gillespie day-step [{C*N} lanes]: {t*1e3:.3f} ms", flush=True)

    yv = jnp.float32(60.0)
    lam = particles[..., 1]
    t = timed(jax.jit(lambda l: pois_logpmf(yv, l)), lam)
    print(f"pois_logpmf [{C}x{N}]: {t*1e3:.3f} ms", flush=True)

    t = timed(jax.jit(lambda k: jax.random.split(k, (10, 5))), key)
    print(f"key split 10x5: {t*1e3:.3f} ms", flush=True)

    # vmapped per-chain splits like the filter does once per sweep
    t = timed(
        jax.jit(lambda ks: jax.vmap(lambda k: jax.random.split(k, (10, 5)))(ks)),
        jax.random.split(key, C),
    )
    print(f"vmapped key split [{C}]x10x5: {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
