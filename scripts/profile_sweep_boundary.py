"""Boundary-cost bisection for the whole-sweep SIR kernel.

Round-3 finding: the sweep op costs ~17 ms/step REGARDLESS of in-kernel
work (full == both-phases-stubbed) and regardless of grid size, while a
no-pallas step costs 0.37 ms — so the cost sits at the op BOUNDARY, not in
the kernel. This probe times the op alone (no MH glue) under combinations
of the _DEBUG flags to find which boundary piece pays:

  writes — per-day [B, 1]-column writes into the [B, T+1] outputs
  stack  — the [C, T+1, 2] jnp.stack on the host side of the op
  wide   — per-chain scalars as [B, N] broadcasts instead of [B, 1]

Run from the repo root: python scripts/profile_sweep_boundary.py
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


def make_loop():
    def loop(keys):
        def step(carry, t):
            acc = carry

            def one(key, lam, gam):
                k = jax.random.fold_in(key, t)
                ll, se = sw.sir_bpf_sweep(
                    k, ys, N, lam, gam, N_TOTAL, I0
                )
                return ll + jnp.sum(se) * 1e-9

            vals = jax.vmap(one)(keys, lams, gams)
            return acc + jnp.sum(vals), None

        acc, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(K))
        return acc

    return jax.jit(loop)


def timeit(name, reps=3):
    fn = make_loop()
    float(fn(keys))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(fn(keys))
        ts.append((time.time() - t0) * 1000)
    ts.sort()
    med = ts[len(ts) // 2]
    print(f"{name:42s}: {med / K:7.3f} ms/step  "
          f"({C * K / med * 1000 / 1000:.0f}k samples/s)", flush=True)


# Round-3 attribution of the telescoped-selection fori_loop kernel at the
# production block size (B=128, 8 MB budget). Wide scalars are now
# unconditional, so the only knobs are the phase stubs.
CASES = [
    ("full, B=128", (), 8),
    ("gillespie only (skip resample), B=128", ("resample",), 8),
    ("resample only (skip gillespie), B=128", ("gillespie",), 8),
]

for name, skip, budget_mb in CASES:
    sw._DEBUG_SKIP = skip
    sw._SELECTION_VMEM_BUDGET = budget_mb * 1024 * 1024
    sw._make_op.cache_clear()
    try:
        timeit(name)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
