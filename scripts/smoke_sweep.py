"""CPU interpret-mode smoke test for the fused SIR sweep kernel."""
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from bayesssm_tpu.filters.bootstrap import bootstrap_filter
from bayesssm_tpu.models.sir import simulate_sir, sir_model
from bayesssm_tpu.ops.sir_sweep_pallas import sir_bpf_sweep

N_TOTAL, I0, N, C = 100, 10, 128, 192
(init_fn, transition_fn, loglik_fn), _, _ = sir_model(
    n_total=N_TOTAL, init_infected=I0, pallas_interpret=True
)
_, y = simulate_sir(seed=7, n_total=N_TOTAL, init_infected=I0, t_max=6)
ys = jnp.asarray(y, jnp.float32)

keys = jax.random.split(jax.random.key(0), C)
lam = jnp.full((C,), 0.4)
gam = jnp.full((C,), 0.25)


def sweep_one(key, l, g):
    return sir_bpf_sweep(
        key, ys, N, l, g, N_TOTAL, I0, interpret=True
    )


ll_s, se_s = jax.jit(jax.vmap(sweep_one))(keys, lam, gam)


def core_one(key, l, g):
    r = bootstrap_filter(
        key, ys, N, init_fn, transition_fn, loglik_fn,
        theta={"lam": l, "gamma": g}, return_particles=False,
    )
    return r.loglike, r.state_est


ll_c, se_c = jax.jit(jax.vmap(core_one))(keys, lam, gam)

print("sweep loglike mean/sd:", float(ll_s.mean()), float(ll_s.std()))
print("core  loglike mean/sd:", float(ll_c.mean()), float(ll_c.std()))
print("sweep se[t] mean:", np.asarray(se_s.mean(axis=0))[:, 1])
print("core  se[t] mean:", np.asarray(se_c.mean(axis=0))[:, 1])
print("finite:", bool(jnp.isfinite(ll_s).all()))

# determinism
ll_s2, _ = jax.jit(jax.vmap(sweep_one))(keys, lam, gam)
print("deterministic:", bool((ll_s == ll_s2).all()))
