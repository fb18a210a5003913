"""Measure the sweep BUILDER's abstraction cost on the SIR headline shape.

Round-5 task (VERDICT.md #1): the bespoke whole-sweep kernel
(ops/sir_sweep_pallas.py) predates the generic builder
(ops/sweep_builder.py); if the builder's SIR instance
(models/sir.py::sir_builder_pf_impl) is within ~3% at the benchmark
shape, the bespoke kernel's scaffolding is redundant and the builder
becomes THE fused path. Same MH-loop harness as
scripts/particle_regime.py (64+ scan steps per jitted call amortize the
~25 ms tunnel dispatch).

Run SERIALLY (never concurrently with other TPU work):
  python scripts/bench_sir_builder.py --paths bespoke builder \
      --algorithms BPF APF RMPF
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import _enable_compile_cache  # noqa: E402


def build_pf(path, algorithm, ys, particles):
    import jax.numpy as jnp

    from bayesssm_tpu.models.sir import (
        sir_builder_pf_impl,
        sir_sweep_pf_impl,
    )

    factory = (
        sir_builder_pf_impl(500, 70)
        if path == "builder"
        else sir_sweep_pf_impl(500, 70)
    )
    pf = factory(
        y=jnp.asarray(ys, jnp.float32), num_particles=particles,
        param_names=["lam", "gamma"], model_fns=None, obs_times=None,
        algorithm=algorithm,
        resample_algorithm="SISAR", resample_fn="stratified",
        carry_weights=False,
    )

    def run(key, theta_vec):
        ll, _ = pf(key, theta_vec)
        return ll

    return run


def measure(path, algorithm, y, chains, particles, steps, reps):
    import jax
    import jax.numpy as jnp
    from jax import lax

    pf = build_pf(path, algorithm, y, particles)

    def k_steps(keys, thetas, lls):
        def one(key, theta, ll):
            def mh(carry, _):
                key, theta, ll = carry
                key, k_pf, k_prop = jax.random.split(key, 3)
                theta_p = theta * jnp.exp(
                    0.1 * jax.random.normal(k_prop, theta.shape)
                )
                ll_p = pf(k_pf, theta_p)
                acc = ll_p > ll
                return (
                    key,
                    jnp.where(acc, theta_p, theta),
                    jnp.where(acc, ll_p, ll),
                ), None

            (key, theta, ll), _ = lax.scan(
                mh, (key, theta, ll), None, length=steps
            )
            return key, theta, ll

        return jax.vmap(one)(keys, thetas, lls)

    keys = jax.random.split(jax.random.key(0), chains)
    thetas = jnp.tile(jnp.array([0.5, 0.2], jnp.float32), (chains, 1))
    lls = jax.vmap(pf)(jax.random.split(jax.random.key(1), chains), thetas)
    step = jax.jit(k_steps)
    keys, thetas, lls = step(keys, thetas, lls)
    float(jnp.sum(lls))
    rates = []
    for _ in range(reps):
        t0 = time.time()
        keys, thetas, lls = step(keys, thetas, lls)
        float(jnp.sum(lls))
        rates.append(chains * steps / (time.time() - t0))
    return float(np.median(rates))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=4096)
    ap.add_argument("--particles", type=int, default=128)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--paths", nargs="+", default=["bespoke", "builder"])
    ap.add_argument("--algorithms", nargs="+", default=["BPF"])
    args = ap.parse_args()

    _enable_compile_cache()
    from bayesssm_tpu.models.sir import simulate_sir

    _, y = simulate_sir(seed=1405)
    results = {}
    for algorithm in args.algorithms:
        for path in args.paths:
            rate = measure(
                path, algorithm, y, args.chains, args.particles,
                args.steps, args.reps,
            )
            results[f"{algorithm}:{path}"] = rate
            print(json.dumps({
                "path": path, "algorithm": algorithm,
                "chains": args.chains, "particles": args.particles,
                "samples_per_s": round(rate, 1),
            }), flush=True)
    for algorithm in args.algorithms:
        b = results.get(f"{algorithm}:bespoke")
        g = results.get(f"{algorithm}:builder")
        if b and g:
            print(json.dumps({
                "algorithm": algorithm,
                "builder_over_bespoke": round(g / b, 4),
            }), flush=True)


if __name__ == "__main__":
    main()
