"""Large-particle-regime probe: samples/s across N and filter paths.

Task: the Q10 clamp (`pmmh_tuning.R:56-57` -> tuning.py) makes
target_n up to 1000 reachable, i.e. 1024 padded lanes — 8x the benchmark's
N=128 — where the fused kernels' O(N^2) inverse-CDF selection is expected
to cliff. This script measures PMMH MH-loop throughput for each available
filter path at given (chains, particles) shapes so the routing threshold
and the documented bound come from data:

  * sweep       — whole-sweep fused kernel, quadratic selection
  * sweep-merge — whole-sweep fused kernel, O(N log N) merge selection
                  (ops/merge_select.py)
  * perday      — per-day Gillespie kernel + fused weight/resample kernel
  * portable    — per-day Gillespie kernel + XLA cumsum/searchsorted/
                  gather (use_fused=False)

Run (serially, never concurrent with other TPU work):
  python scripts/particle_regime.py --shapes 4096x128 512x1024 \
      --paths sweep sweep-merge perday portable
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import _enable_compile_cache  # noqa: E402


def build_pf(path, ys, particles):
    import jax.numpy as jnp

    from bayesssm_tpu.filters.bootstrap import bootstrap_filter
    from bayesssm_tpu.models.sir import sir_model
    from bayesssm_tpu.ops.sir_sweep_pallas import sir_filter_sweep

    ys = jnp.asarray(ys, jnp.float32)
    if path in ("sweep", "sweep-merge"):
        # Both names run merge selection since round 5: the whole-sweep
        # path is builder-backed and merge-only (the quadratic in-sweep
        # selection was retired with the bespoke kernel).

        def pf(key, theta_vec):
            ll, _ = sir_filter_sweep(
                key, ys, particles, theta_vec[0], theta_vec[1], 500, 70,
                selection="merge",
            )
            return ll

        return pf

    (init_fn, transition_fn, loglik_fn), _, _ = sir_model(
        n_total=500, init_infected=70, transition="gillespie_pallas"
    )
    use_fused = "auto" if path == "perday" else False

    def pf(key, theta_vec):
        res = bootstrap_filter(
            key, ys, particles, init_fn, transition_fn, loglik_fn,
            theta={"lam": theta_vec[0], "gamma": theta_vec[1]},
            return_particles=False, use_fused=use_fused,
        )
        return res.loglike

    return pf


def measure(path, y, chains, particles, steps, reps):
    import jax
    import jax.numpy as jnp
    from jax import lax

    pf = build_pf(path, y, particles)

    def k_steps(keys, thetas, lls):
        def one(key, theta, ll):
            def mh(carry, _):
                key, theta, ll = carry
                key, k_pf, k_prop = jax.random.split(key, 3)
                theta_p = theta * jnp.exp(
                    0.1 * jax.random.normal(k_prop, theta.shape)
                )
                ll_p = pf(k_pf, theta_p)
                acc = ll_p > ll  # cheap surrogate accept; cost-equivalent
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
    float(jnp.sum(lls))  # forced completion (tunnel semantics, bench.py)
    rates = []
    for _ in range(reps):
        t0 = time.time()
        keys, thetas, lls = step(keys, thetas, lls)
        float(jnp.sum(lls))
        rates.append(chains * steps / (time.time() - t0))
    return float(np.median(rates))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", nargs="+", default=["4096x128", "512x1024"])
    ap.add_argument("--paths", nargs="+",
                    default=["sweep", "sweep-merge", "perday", "portable"])
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    _enable_compile_cache()
    from bayesssm_tpu.models.sir import simulate_sir

    _, y = simulate_sir(seed=1405)
    for shape in args.shapes:
        chains, particles = map(int, shape.split("x"))
        for path in args.paths:
            sps = measure(path, y, chains, particles, args.steps, args.reps)
            print(json.dumps({
                "path": path, "chains": chains, "particles": particles,
                "samples_per_sec": round(sps, 2),
                "particle_lane_days_per_sec": round(
                    sps * particles * len(y), 2
                ),
            }), flush=True)


if __name__ == "__main__":
    main()
