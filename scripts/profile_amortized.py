"""Dispatch-amortized MH-step attribution at the benchmark shape.

scripts/profile_mh_breakdown.py times single jitted calls, which the ~24 ms
axon-tunnel dispatch floor dominates. Here every component is scanned K
times inside ONE jitted call (like bench.py's 16-steps-per-call harness),
so per-step figures reflect device compute:

  A. full MH step          (bench.py workload, gillespie_pallas)
  B. PF sweep only         (no propose/accept)
  C. Gillespie day steps   (T per sweep, no weights/resample)
  D. fused weight+resample (T per sweep, fixed log-weights)
  E. Poisson weight eval   (T per sweep, lgamma-bearing loglik only)

Run from the repo root: python scripts/profile_amortized.py [K]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from bayesssm_tpu.filters.bootstrap import bootstrap_filter
from bayesssm_tpu.models.sir import simulate_sir, sir_model
from bayesssm_tpu.ops.gillespie_pallas import gillespie_step_pallas
from bayesssm_tpu.ops.resampling import _positions
from bayesssm_tpu.ops.resampling_pallas import fused_weight_resample
from bayesssm_tpu.pmmh.priors import sum_log_priors

C, N, T = 4096, 128, 10
K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
(init_fn, transition_fn, loglik_fn), log_priors, _ = sir_model(
    n_total=500, init_infected=70, transition="gillespie_pallas"
)
_, y = simulate_sir(seed=1405)
ys = jnp.asarray(y, dtype=jnp.float32)
param_names = list(log_priors)
prior_fns = [log_priors[p] for p in param_names]


def _force(out):
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
    med = ts[len(ts) // 2]
    print(f"{name}: {med / K:7.2f} ms/step  (median call {med:.1f} ms, "
          f"min {ts[0]:.1f})")
    return out


def pf_loglike(key, theta_vec):
    theta = {p: theta_vec[j] for j, p in enumerate(param_names)}
    return bootstrap_filter(
        key, ys, N, init_fn, transition_fn, loglik_fn,
        theta=theta, return_particles=False,
    ).loglike


def mh_scan(keys, thetas, lls):
    def one(key, theta, ll):
        def step(carry, _):
            key, theta, ll = carry
            key, k_prop, k_pf, k_acc = jax.random.split(key, 4)
            z = jnp.log(theta)
            zp = z + 0.1 * jax.random.normal(k_prop, z.shape, z.dtype)
            theta_prop = jnp.exp(zp)
            lp_prop = sum_log_priors(theta_prop, prior_fns)
            ll_prop = pf_loglike(k_pf, theta_prop)
            log_ratio = (ll_prop + lp_prop + zp.sum()) - (
                ll + sum_log_priors(theta, prior_fns) + z.sum()
            )
            log_ratio = jnp.where(jnp.isnan(log_ratio), -jnp.inf, log_ratio)
            accept = jnp.log(jax.random.uniform(k_acc)) < log_ratio
            return (key, jnp.where(accept, theta_prop, theta),
                    jnp.where(accept, ll_prop, ll)), None

        (key, theta, ll), _ = lax.scan(step, (key, theta, ll), None, length=K)
        return key, theta, ll

    return jax.vmap(one)(keys, thetas, lls)


def pf_scan(keys, thetas):
    def one(key, theta):
        def step(carry, k):
            return carry + pf_loglike(k, theta), None

        tot, _ = lax.scan(
            step, jnp.float32(0.0), jax.random.split(key, K)
        )
        return tot

    return jax.vmap(one)(keys, thetas)


def gillespie_scan(keys, states, lams, gams):
    def one(key, s0, lam, gam):
        def day(s, k):
            return gillespie_step_pallas(k, s, lam, gam, 500.0), None

        def sweep(s, k):
            s, _ = lax.scan(day, s, jax.random.split(k, T))
            return s, None

        s, _ = lax.scan(sweep, s0, jax.random.split(key, K))
        return s

    return jax.vmap(one)(keys, states, lams, gams)


def fused_scan(keys, states, lws):
    def one(key, p0, lw):
        def day(p, k):
            pos = _positions(
                k, "stratified", (), N, jnp.asarray(float(N)), jnp.float32
            )
            pout, w, ess, lse = fused_weight_resample(
                lw, p, pos, jnp.full((N,), 1.0 / N), jnp.asarray(N / 2.0),
            )
            return pout, None

        def sweep(p, k):
            p, _ = lax.scan(day, p, jax.random.split(k, T))
            return p, None

        p, _ = lax.scan(sweep, p0, jax.random.split(key, K))
        return p

    return jax.vmap(one)(keys, states, lws)


def weight_scan(states, thetas):
    def one(p, theta_vec):
        del theta_vec  # SIR loglik is theta-free: Pois(y | I)

        def day(acc, yt):
            lw = loglik_fn(yt, p)
            return acc + jnp.sum(lw), None

        def sweep(acc, _):
            acc, _ = lax.scan(day, acc, ys[:T])
            return acc, None

        acc, _ = lax.scan(sweep, jnp.float32(0.0), None, length=K)
        return acc

    return jax.vmap(one)(states, thetas)


keys = jax.random.split(jax.random.key(0), C)
thetas = jnp.tile(jnp.array([0.5, 0.2], jnp.float32), (C, 1))
lls = jnp.zeros((C,), jnp.float32)
states = jnp.tile(jnp.array([430.0, 70.0], jnp.float32), (C, N, 1))
lams = jnp.full((C,), 0.5, jnp.float32)
gams = jnp.full((C,), 0.2, jnp.float32)
lws = jax.random.normal(jax.random.key(2), (C, N), jnp.float32)

print(f"shape: {C} chains x {N} particles x T={T}, K={K} steps/call")
timeit("A full MH           ", jax.jit(mh_scan), keys, thetas, lls)
timeit("B PF sweep          ", jax.jit(pf_scan), keys, thetas)
timeit("C gillespie x T     ", jax.jit(gillespie_scan), keys, states,
       lams, gams)
timeit("D fused resample x T", jax.jit(fused_scan), keys, states, lws)
timeit("E poisson loglik x T", jax.jit(weight_scan), states, thetas)
