"""Attribute the residual per-step PF cost: key splits vs position uniforms.

A: PF sweep with systematic (scalar u per chain) vs stratified (u per lane).
B: the raw RNG ops, vmapped over 4096 chains, 10x (one per scan step).
"""

import time

import jax
import jax.numpy as jnp

from bayesssm_tpu.filters.bootstrap import bootstrap_filter
from bayesssm_tpu.models.sir import sir_model, simulate_sir

CHAINS, N = 4096, 128


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    _, y = simulate_sir(seed=1405, t_max=10)
    ys = jnp.asarray(y, dtype=jnp.float32)
    (init_fn, transition_fn, loglik_fn), _, _ = sir_model(500, 70)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, CHAINS)

    for method in ("stratified", "systematic", "multinomial"):
        def pf(k):
            return bootstrap_filter(
                k, ys, N, init_fn, transition_fn, loglik_fn,
                theta={"lam": 0.5, "gamma": 0.2},
                resample_fn=method, return_particles=False,
            ).loglike

        t = timed(jax.jit(jax.vmap(pf)), keys, reps=3)
        print(f"PF sweep [{method}]: {t*1e3:.2f} ms")

    def splits(keys):
        def one(k):
            def body(c, _):
                c, *rest = jax.random.split(c, 6)
                return c, rest[3]
            _, ks = jax.lax.scan(body, k, None, length=10)
            return ks
        return jax.vmap(one)(keys)

    t = timed(jax.jit(splits), keys)
    print(f"10x 6-way split x{CHAINS}: {t*1e3:.2f} ms")

    def uniforms(keys):
        def one(k):
            def body(c, _):
                c, kr = jax.random.split(c)
                return c, jax.random.uniform(kr, (N,))
            _, us = jax.lax.scan(body, k, None, length=10)
            return us
        return jax.vmap(one)(keys)

    t = timed(jax.jit(uniforms), keys)
    print(f"10x uniform[{N}] x{CHAINS}: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
