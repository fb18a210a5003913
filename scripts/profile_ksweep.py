"""Steps-per-call (K) sweep: separate per-call dispatch overhead from
device compute for both SIR PF paths.

Round-3 finding: at the bench shape the per-call wall time is ~constant in
K up to K=64 for the fused sweep (~290 ms/call whether the kernel phases
run or are stubbed), i.e. the axon tunnel's per-call overhead dominates and
per-step figures at K=16 measure dispatch, not compute. This sweep fits
    t_call(K) = a + b * K
for the fused whole-sweep kernel, the two-kernel (gillespie_pallas +
fused weight/resample) path, and a no-pallas glue-only control; ``b`` is
the true marginal device cost per MH step.

Run from the repo root: python scripts/profile_ksweep.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

# Persistent compilation cache: the axon remote compile service has high
# variance (minutes per program on bad days); caching lets a timed-out run
# resume where it stopped on the next invocation.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

from bayesssm_tpu.filters.bootstrap import bootstrap_filter
from bayesssm_tpu.models.sir import simulate_sir, sir_model
import bayesssm_tpu.ops.sir_sweep_pallas as sw
from bayesssm_tpu.pmmh.priors import sum_log_priors

C, N, T = 4096, 128, 10
N_TOTAL, I0 = 500, 70
_, y = simulate_sir(seed=1405)
ys = jnp.asarray(y, jnp.float32)

(init_fn, transition_fn, loglik_fn), log_priors, _ = sir_model(
    n_total=N_TOTAL, init_infected=I0, transition="gillespie_pallas"
)
param_names = list(log_priors)
prior_fns = [log_priors[p] for p in param_names]


def pf_sweep(key, theta):
    ll, _ = sw.sir_bpf_sweep(key, ys, N, theta[0], theta[1], N_TOTAL, I0)
    return ll


def pf_twokernel(key, theta):
    th = {p: theta[j] for j, p in enumerate(param_names)}
    return bootstrap_filter(
        key, ys, N, init_fn, transition_fn, loglik_fn, theta=th,
        return_particles=False,
    ).loglike


def pf_glue(key, theta):
    return -jnp.sum(theta) + jax.random.normal(key, ())


def make_mh(pf, k_steps):
    def mh(keys, thetas, lls):
        def one(key, theta, ll):
            def step(carry, _):
                key, theta, ll = carry
                key, k_prop, k_pf, k_acc = jax.random.split(key, 4)
                z = jnp.log(theta)
                zp = z + 0.1 * jax.random.normal(k_prop, z.shape, z.dtype)
                theta_prop = jnp.exp(zp)
                lp = sum_log_priors(theta_prop, prior_fns)
                ll_prop = pf(k_pf, theta_prop)
                log_ratio = (ll_prop + lp + zp.sum()) - (
                    ll + sum_log_priors(theta, prior_fns) + z.sum()
                )
                log_ratio = jnp.where(
                    jnp.isnan(log_ratio), -jnp.inf, log_ratio
                )
                accept = jnp.log(jax.random.uniform(k_acc)) < log_ratio
                return (key, jnp.where(accept, theta_prop, theta),
                        jnp.where(accept, ll_prop, ll)), None

            (key, theta, ll), _ = lax.scan(
                step, (key, theta, ll), None, length=k_steps
            )
            return key, theta, ll

        return jax.vmap(one)(keys, thetas, lls)

    return jax.jit(mh)


keys = jax.random.split(jax.random.key(0), C)
thetas = jnp.tile(jnp.array([0.5, 0.2], jnp.float32), (C, 1))
lls = jnp.zeros((C,), jnp.float32)


def time_call(fn, reps=3):
    out = fn(keys, thetas, lls)
    float(jnp.sum(out[2]))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(keys, thetas, lls)
        float(jnp.sum(out[2]))
        ts.append((time.time() - t0) * 1000)
    ts.sort()
    return ts[len(ts) // 2]


rows = []
for name, pf, k_values in (
    ("glue", pf_glue, (16, 256)),
    ("sweep", pf_sweep, (16, 64, 256)),
    ("twokernel", pf_twokernel, (16, 64)),
):
    pts = []
    for k in k_values:
        ms = time_call(make_mh(pf, k))
        pts.append((k, ms))
        rate = C * k / ms * 1000.0
        print(f"{name:10s} K={k:4d}: {ms:8.1f} ms/call "
              f"{ms / k:7.3f} ms/step {rate / 1000:8.1f}k samples/s",
              flush=True)
    if len(pts) >= 2:
        (k1, t1), (k2, t2) = pts[0], pts[-1]
        b = (t2 - t1) / (k2 - k1)
        a = t1 - b * k1
        print(f"{name:10s} fit: overhead a = {a:.1f} ms/call, "
              f"marginal b = {b:.3f} ms/step", flush=True)
