"""Benchmark the fused SIR sweep kernel on the real TPU.

Times the full MH step at the benchmark shape with the whole-sweep kernel
replacing the per-day gillespie + fused-resample pair, K steps per jitted
call (dispatch-amortized), across chain-block budgets.

Run from the repo root: python scripts/profile_sweep.py [K]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax

import bayesssm_tpu.ops.sir_sweep_pallas as sw
from bayesssm_tpu.models.sir import simulate_sir
from bayesssm_tpu.models.distributions import halfnorm_logpdf

C, N, T = 4096, 128, 10
K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_TOTAL, I0 = 500, 70
_, y = simulate_sir(seed=1405)
ys = jnp.asarray(y, jnp.float32)


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
    rate = C * K / (med / 1000.0)
    print(f"{name}: {med / K:7.2f} ms/step = {rate / 1000:.1f}k samples/s")
    return out


def pf(key, theta):
    ll, _ = sw.sir_bpf_sweep(
        key, ys, N, theta[0], theta[1], N_TOTAL, I0
    )
    return ll


def lp(theta):
    return halfnorm_logpdf(theta[0], 1.0) + halfnorm_logpdf(theta[1], 2.0)


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
            log_ratio = jnp.where(jnp.isnan(log_ratio), -jnp.inf, log_ratio)
            accept = jnp.log(jax.random.uniform(k_acc)) < log_ratio
            return (key, jnp.where(accept, theta_prop, theta),
                    jnp.where(accept, ll_prop, ll)), None

        (key, theta, ll), _ = lax.scan(step, (key, theta, ll), None,
                                       length=K)
        return key, theta, ll

    return jax.vmap(one)(keys, thetas, lls)


keys = jax.random.split(jax.random.key(0), C)
thetas = jnp.tile(jnp.array([0.5, 0.2], jnp.float32), (C, 1))
lls = jnp.zeros((C,), jnp.float32)

print(f"shape: {C} x {N} x T={T}, K={K}")
for skip, budgets in (
    ((), (2,)),                    # full kernel
    (("resample",), (2, 8, 32)),   # gillespie+weights only, B sweep
    (("gillespie",), (2, 8)),      # weights+resample only
):
    sw._DEBUG_SKIP = skip
    for budget_mb in budgets:
        sw._SELECTION_VMEM_BUDGET = budget_mb * 1024 * 1024
        sw._make_op.cache_clear()
        b = sw._chains_per_program(C, N)
        label = "-".join(skip) or "full"
        try:
            timeit(f"sweep[{label:18s}] {budget_mb:2d}MB (B={b:4d})",
                   jax.jit(mh_scan), keys, thetas, lls)
        except Exception as e:
            print(f"sweep[{label}] {budget_mb}MB (B={b}): FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}")


# ---- structural overhead probes ----
def mh_scan_noswp(keys, thetas, lls):
    """Same MH scan with the sweep replaced by a trivial jnp loglike."""
    def one(key, theta, ll):
        def step(carry, _):
            key, theta, ll = carry
            key, k_prop, k_pf, k_acc = jax.random.split(key, 4)
            z = jnp.log(theta)
            zp = z + 0.1 * jax.random.normal(k_prop, z.shape, z.dtype)
            theta_prop = jnp.exp(zp)
            ll_prop = -jnp.sum(theta_prop) + jax.random.normal(k_pf, ())
            log_ratio = (ll_prop + lp(theta_prop) + zp.sum()) - (
                ll + lp(theta) + z.sum()
            )
            accept = jnp.log(jax.random.uniform(k_acc)) < log_ratio
            return (key, jnp.where(accept, theta_prop, theta),
                    jnp.where(accept, ll_prop, ll)), None

        (key, theta, ll), _ = lax.scan(step, (key, theta, ll), None,
                                       length=K)
        return key, theta, ll

    return jax.vmap(one)(keys, thetas, lls)


sw._DEBUG_SKIP = ("gillespie", "resample")
sw._SELECTION_VMEM_BUDGET = 2 * 1024 * 1024
sw._make_op.cache_clear()
timeit("sweep[both stubbed  ]  2MB        ", jax.jit(mh_scan), keys,
       thetas, lls)
timeit("glue only (no pallas)             ", jax.jit(mh_scan_noswp), keys,
       thetas, lls)

K = 64
sw._DEBUG_SKIP = ()
sw._make_op.cache_clear()
timeit("sweep[full] K=64                  ", jax.jit(mh_scan), keys,
       thetas, lls)
