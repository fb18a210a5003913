"""Event-unroll sweep for the whole-sweep SIR kernel.

The Gillespie phase is iteration-latency-bound
(scripts/profile_sweep_boundary.py: bigger blocks beat smaller ones at
equal lane-work), so drawing more events per while_loop iteration should
trade wasted tail-event arithmetic for fewer iterations. Times the full
sweep op at unroll in {2, 4, 8, 16}.

Run from the repo root: python scripts/profile_unroll2.py
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

C, N, K = 4096, 128, 64
N_TOTAL, I0 = 500, 70
_, y = simulate_sir(seed=1405)
ys = jnp.asarray(y, jnp.float32)

keys = jax.random.split(jax.random.key(0), C)
lams = jnp.full((C,), 0.5, jnp.float32)
gams = jnp.full((C,), 0.2, jnp.float32)


def make_loop(unroll):
    def loop(keys):
        def step(carry, t):
            def one(key, lam, gam):
                k = jax.random.fold_in(key, t)
                ll, se = sw.sir_bpf_sweep(
                    k, ys, N, lam, gam, N_TOTAL, I0, unroll=unroll
                )
                return ll + jnp.sum(se) * 1e-9

            vals = jax.vmap(one)(keys, lams, gams)
            return carry + jnp.sum(vals), None

        acc, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(K))
        return acc

    return jax.jit(loop)


for unroll in (2, 4, 8, 16):
    fn = make_loop(unroll)
    float(fn(keys))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(fn(keys))
        ts.append((time.time() - t0) * 1000)
    ts.sort()
    med = ts[len(ts) // 2]
    print(f"unroll={unroll:2d}: {med / K:7.3f} ms/step  "
          f"({C * K / med:.0f}k samples/s-ish)", flush=True)
