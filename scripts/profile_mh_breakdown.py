"""Attribute the PMMH MH-step time at the benchmark shape (round 2).

Times, at [4096 chains x 128 particles x T=10] on the real TPU:
  A. full MH step (bench.py's workload, gillespie_pallas transition)
  B. the PF sweep alone (no propose/accept machinery)
  C. the Gillespie transitions alone (10 steps, no weights/resample)
  D. the fused weight+resample steps alone (10 steps, fixed weights)
Run from the repo root: python scripts/profile_mh_breakdown.py
"""

import sys, time
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from bayesssm_tpu.filters.bootstrap import bootstrap_filter
from bayesssm_tpu.models.sir import sir_model, simulate_sir
from bayesssm_tpu.ops.gillespie_pallas import gillespie_step_pallas
from bayesssm_tpu.ops.resampling import _positions
from bayesssm_tpu.ops.resampling_pallas import fused_weight_resample
from bayesssm_tpu.pmmh.priors import sum_log_priors

C, N, T = 4096, 128, 10
(init_fn, transition_fn, loglik_fn), log_priors, _ = sir_model(
    n_total=500, init_infected=70, transition="gillespie_pallas"
)
_, y = simulate_sir(seed=1405)
ys = jnp.asarray(y, dtype=jnp.float32)
param_names = list(log_priors)
prior_fns = [log_priors[p] for p in param_names]


def _force(out):
    # block_until_ready does not reliably block through the axon tunnel;
    # a device->host read of a dependent scalar bounds completion.
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if jnp.issubdtype(x.dtype, jnp.floating)]
    return float(jnp.sum(leaves[-1]))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _force(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _force(out)
        ts.append((time.time() - t0) * 1000)
    ts.sort()
    print(f"{name}: median {ts[len(ts)//2]:.2f} ms  (min {ts[0]:.2f})")
    return out


def pf_loglike(key, theta_vec):
    theta = {p: theta_vec[j] for j, p in enumerate(param_names)}
    return bootstrap_filter(
        key, ys, N, init_fn, transition_fn, loglik_fn,
        theta=theta, return_particles=False,
    ).loglike


def mh_step(keys, thetas, lls):
    def one(key, theta, ll):
        key, k_prop, k_pf, k_acc = jax.random.split(key, 4)
        z = jnp.log(theta)
        zp = z + 0.1 * jax.random.normal(k_prop, z.shape, dtype=z.dtype)
        theta_prop = jnp.exp(zp)
        lp_prop = sum_log_priors(theta_prop, prior_fns)
        ll_prop = pf_loglike(k_pf, theta_prop)
        log_ratio = (ll_prop + lp_prop + zp.sum()) - (
            ll + sum_log_priors(theta, prior_fns) + z.sum()
        )
        log_ratio = jnp.where(jnp.isnan(log_ratio), -jnp.inf, log_ratio)
        accept = jnp.log(jax.random.uniform(k_acc)) < log_ratio
        return key, jnp.where(accept, theta_prop, theta), jnp.where(accept, ll_prop, ll)
    return jax.vmap(one)(keys, thetas, lls)


def pf_only(keys, thetas):
    return jax.vmap(pf_loglike)(keys, thetas)


def gillespie_only(keys, states, lams, gams):
    def one(key, s0, lam, gam):
        def body(s, k):
            return gillespie_step_pallas(k, s, lam, gam, 500.0), None
        s, _ = lax.scan(body, s0, jax.random.split(key, T))
        return s
    return jax.vmap(one)(keys, states, lams, gams)


def fused_only(keys, states, lws):
    def one(key, p0, lw):
        def body(p, k):
            pos = _positions(k, "stratified", (), N, jnp.asarray(float(N)), jnp.float32)
            pout, w, ess, lse = fused_weight_resample(
                lw, p, pos, jnp.full((N,), 1.0 / N), jnp.asarray(N / 2.0),
            )
            return pout, lse
        p, _ = lax.scan(body, p0, jax.random.split(key, T))
        return p
    return jax.vmap(one)(keys, states, lws)


keys = jax.random.split(jax.random.key(0), C)
thetas = jnp.tile(jnp.array([0.5, 0.2], jnp.float32), (C, 1))
lls = jnp.zeros((C,), jnp.float32)
states = jnp.tile(jnp.array([430.0, 70.0], jnp.float32), (C, N, 1))
lams = jnp.full((C,), 0.5, jnp.float32)
gams = jnp.full((C,), 0.2, jnp.float32)
lws = jax.random.normal(jax.random.key(2), (C, N), jnp.float32)

print(f"shape: {C} chains x {N} particles x T={T}")
timeit("A full MH step     ", jax.jit(mh_step), keys, thetas, lls)
timeit("B PF sweep only    ", jax.jit(pf_only), keys, thetas)
timeit("C gillespie only   ", jax.jit(gillespie_only), keys, states, lams, gams)
timeit("D fused weight only", jax.jit(fused_only), keys, states, lws)
