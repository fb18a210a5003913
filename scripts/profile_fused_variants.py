"""Attribute the fused weight+resample cost at the benchmark shape.

profile_amortized.py measured the fused path at ~7.3 ms per MH step
(10 day steps) — 3x the Gillespie kernel. This script separates:

  D0 baseline            (as in profile_amortized: positions per day,
                          [C, N, 2] stack at each boundary)
  D1 fixed positions     (threefry _positions hoisted out of the scan)
  D2 one state column    (d=1: no output stack, halves the gather passes)
  D3 chains/program sweep (override _SELECTION_VMEM_BUDGET)

Run from the repo root: python scripts/profile_fused_variants.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

import bayesssm_tpu.ops.resampling_pallas as rp
from bayesssm_tpu.ops.resampling import _positions
from bayesssm_tpu.ops.resampling_pallas import fused_weight_resample

C, N, T, K = 4096, 128, 10, 16


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
    print(f"{name}: {med / K:7.2f} ms/step  (median call {med:.1f} ms)")
    return out


def make_scan(d, fixed_pos):
    def run(keys, states, lws):
        def one(key, p0, lw):
            pos0 = _positions(
                key, "stratified", (), N, jnp.asarray(float(N)), jnp.float32
            )

            def day(p, k):
                pos = pos0 if fixed_pos else _positions(
                    k, "stratified", (), N, jnp.asarray(float(N)),
                    jnp.float32,
                )
                pout, w, ess, lse = fused_weight_resample(
                    lw, p, pos, jnp.full((N,), 1.0 / N),
                    jnp.asarray(N / 2.0),
                )
                return pout, None

            def sweep(p, k):
                p, _ = lax.scan(day, p, jax.random.split(k, T))
                return p, None

            p, _ = lax.scan(sweep, p0, jax.random.split(key, K))
            return p

        return jax.vmap(one)(keys, states, lws)

    return run


keys = jax.random.split(jax.random.key(0), C)
lws = jax.random.normal(jax.random.key(2), (C, N), jnp.float32)
states2 = jnp.tile(jnp.array([430.0, 70.0], jnp.float32), (C, N, 1))
states1 = states2[..., :1]

print(f"shape: {C} x {N}, T={T}, K={K}, "
      f"B={rp._chains_per_program(C, N)} chains/program")
timeit("D0 baseline d=2      ", jax.jit(make_scan(2, False)), keys,
       states2, lws)
timeit("D1 fixed positions   ", jax.jit(make_scan(2, True)), keys,
       states2, lws)
timeit("D2 one column d=1    ", jax.jit(make_scan(1, False)), keys,
       states1, lws)

for budget in (1, 4, 8):
    rp._SELECTION_VMEM_BUDGET = budget * 1024 * 1024
    rp._make_op.cache_clear()
    b = rp._chains_per_program(C, N)
    try:
        timeit(f"D3 budget {budget}MB (B={b:3d})", jax.jit(make_scan(2, False)),
               keys, states2, lws)
    except Exception as e:  # VMEM overflow at large B
        print(f"D3 budget {budget}MB (B={b}): FAILED {type(e).__name__}: "
              f"{str(e)[:120]}")
