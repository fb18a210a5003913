"""Sweep the Gillespie event-loop unroll factor on the real TPU.

The exact-SIR while_loop amortizes its PRNG draw and its any(active)
reduction over ``unroll`` events per iteration (models/sir.py:35-90).
This measures the full 4096-chain PF sweep at several unroll factors to
pick the default.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bayesssm_tpu.filters.bootstrap import bootstrap_filter
from bayesssm_tpu.models.sir import gillespie_step, simulate_sir
from bayesssm_tpu.models.distributions import halfnorm_logpdf, pois_logpmf

CHAINS = 4096
N = 128


def main():
    _, y = simulate_sir(seed=1405, t_max=10)
    ys = jnp.asarray(y, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, CHAINS)
    lam = jnp.full((CHAINS,), 0.5)
    gam = jnp.full((CHAINS,), 0.2)

    for unroll in (4, 8):
        def init_fn(key, num_particles):
            return jnp.tile(jnp.array([430.0, 70.0], jnp.float32), (num_particles, 1))

        def transition_fn(key, particles, lam, gamma, _u=unroll):
            return gillespie_step(key, particles, lam, gamma, 500.0, unroll=_u)

        def loglik_fn(y, particles):
            return pois_logpmf(y, particles[..., 1])

        def pf(key, theta_lam, theta_gam):
            return bootstrap_filter(
                key, ys, N, init_fn, transition_fn, loglik_fn,
                theta={"lam": theta_lam, "gamma": theta_gam},
                return_particles=False,
            ).loglike

        vpf = jax.jit(jax.vmap(pf))
        out = jax.block_until_ready(vpf(keys, lam, gam))
        t0 = time.perf_counter()
        for _ in range(5):
            out = vpf(keys, lam, gam)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 5
        print(f"unroll={unroll}: PF sweep {dt*1e3:.2f} ms  (ll mean {float(out.mean()):.2f})", flush=True)


if __name__ == "__main__":
    main()
