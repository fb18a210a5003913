"""Structural-overhead probes for the fused sweep path (see profile_sweep).

All in-kernel phase stubs measured identically (~17.5 ms/step), so the
cost must be structural. Probes:
  P1 both phases stubbed (near-empty kernel body)
  P2 glue only (no pallas_call at all)
  P3 full kernel at K=64 steps/call (per-call vs per-step attribution)
  P4 sweep op alone, no MH glue (vmap of sweeps, chained by ll)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

import bayesssm_tpu.ops.sir_sweep_pallas as sw
from bayesssm_tpu.models.distributions import halfnorm_logpdf
from bayesssm_tpu.models.sir import simulate_sir

C, N, T = 4096, 128, 10
N_TOTAL, I0 = 500, 70
_, y = simulate_sir(seed=1405)
ys = jnp.asarray(y, jnp.float32)


def _force(out):
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if jnp.issubdtype(x.dtype, jnp.floating)]
    return float(jnp.sum(leaves[-1]))


def timeit(name, k, fn, *args, reps=5):
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
    print(f"{name}: {med / k:7.2f} ms/step  (call {med:.1f} ms)")
    return out


def lp(theta):
    return halfnorm_logpdf(theta[0], 1.0) + halfnorm_logpdf(theta[1], 2.0)


def make_mh(k_steps, use_sweep=True):
    def pf(key, theta):
        if use_sweep:
            ll, _ = sw.sir_bpf_sweep(
                key, ys, N, theta[0], theta[1], N_TOTAL, I0
            )
            return ll
        return -jnp.sum(theta) + jax.random.normal(key, ())

    def mh_scan(keys, thetas, lls):
        def one(key, theta, ll):
            def step(carry, _):
                key, theta, ll = carry
                key, k_prop, k_pf, k_acc = jax.random.split(key, 4)
                z = jnp.log(theta)
                zp = z + 0.1 * jax.random.normal(k_prop, z.shape, z.dtype)
                theta_prop = jnp.exp(zp)
                ll_prop = pf(k_pf, theta_prop)
                log_ratio = (ll_prop + lp(theta_prop) + zp.sum()) - (
                    ll + lp(theta) + z.sum()
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

    return mh_scan


def sweeps_only(k_steps):
    def run(keys, lls):
        def one(key, ll):
            def step(carry, _):
                key, ll = carry
                key, k_pf = jax.random.split(key)
                nll, _ = sw.sir_bpf_sweep(
                    key, ys, N, 0.5 + 0.0 * ll, 0.2, N_TOTAL, I0
                )
                return (key, nll), None

            (key, ll), _ = lax.scan(step, (key, ll), None, length=k_steps)
            return ll

        return jax.vmap(one)(keys, lls)

    return run


keys = jax.random.split(jax.random.key(0), C)
thetas = jnp.tile(jnp.array([0.5, 0.2], jnp.float32), (C, 1))
lls = jnp.zeros((C,), jnp.float32)

sw._DEBUG_SKIP = ("gillespie", "resample")
sw._make_op.cache_clear()
timeit("P1 both stubbed  K=16", 16, jax.jit(make_mh(16)), keys, thetas, lls)

sw._DEBUG_SKIP = ()
sw._make_op.cache_clear()
timeit("P2 glue only     K=16", 16, jax.jit(make_mh(16, use_sweep=False)),
       keys, thetas, lls)
timeit("P3 full          K=64", 64, jax.jit(make_mh(64)), keys, thetas, lls)
timeit("P4 sweeps only   K=16", 16, jax.jit(sweeps_only(16)), keys, lls)
