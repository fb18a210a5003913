"""Break down one benchmark MH step: Gillespie vs weights/resampling vs rest.

Times, on the real TPU, (a) the full bench mh_step, (b) gillespie_step alone
over the same lane count, (c) the PF sweep with tau-leap transitions (fixed
cost) to isolate the event loop, and (d) the mean/max Gillespie event count
so we know the while_loop trip count.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from bayesssm_tpu.filters.bootstrap import bootstrap_filter
from bayesssm_tpu.models.sir import gillespie_step, sir_model, simulate_sir

CHAINS = 4096
N = 128  # particles (bench pads to 128)


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
    lanes = CHAINS * N
    key = jax.random.PRNGKey(0)
    state = jnp.tile(jnp.array([430.0, 70.0], jnp.float32), (lanes, 1))

    # (b) one unit-time Gillespie advance over all lanes
    g = jax.jit(lambda k, s: gillespie_step(k, s, 0.5, 0.2, 500.0))
    t_g = timed(g, key, state)
    print(f"gillespie_step 1 unit, {lanes} lanes: {t_g*1e3:.2f} ms")

    # (d) event count distribution (host sim of rates): max matters
    for model_transition in ("gillespie", "tauleap"):
        (init_fn, transition_fn, loglik_fn), log_priors, _ = sir_model(
            n_total=500, init_infected=70, transition=model_transition
        )

        def pf(key, theta_lam, theta_gam):
            return bootstrap_filter(
                key, ys, N, init_fn, transition_fn, loglik_fn,
                theta={"lam": theta_lam, "gamma": theta_gam},
                return_particles=False,
            ).loglike

        vpf = jax.jit(
            jax.vmap(pf, in_axes=(0, 0, 0))
        )
        keys = jax.random.split(key, CHAINS)
        lam = jnp.full((CHAINS,), 0.5)
        gam = jnp.full((CHAINS,), 0.2)
        t_pf = timed(vpf, keys, lam, gam, reps=3)
        print(f"PF sweep ({model_transition}) x{CHAINS} chains: {t_pf*1e3:.2f} ms")


if __name__ == "__main__":
    main()
