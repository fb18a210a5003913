"""Cost of TRACED per-chain particle counts in the whole-sweep kernel.

The public driver runs the sweep with per-chain tuned counts (traced
``num_particles`` = 50 under a static 128-lane bound — Q9 masked
lanes), while the raw-loop bench runs all 128 lanes statically. This
probe isolates that difference with the same MH harness: (a) static
n=128, (b) traced n=50 @ max 128, (c) traced n=128 @ max 128.

Run SERIALLY: python scripts/probe_masked_lanes.py
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import _enable_compile_cache  # noqa: E402


def measure(mode, y, chains=4096, steps=64, reps=5):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from bayesssm_tpu.ops.sir_sweep_pallas import sir_filter_sweep

    ys = jnp.asarray(y, jnp.float32)

    if mode == "static128":
        def pf(key, theta):
            ll, _ = sir_filter_sweep(
                key, ys, 128, theta[0], theta[1], 500, 70
            )
            return ll
    else:
        alive = jnp.float32(50.0 if mode == "traced50" else 128.0)

        def pf(key, theta):
            ll, _ = sir_filter_sweep(
                key, ys, alive, theta[0], theta[1], 500, 70,
                max_particles=128,
            )
            return ll

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
    _enable_compile_cache()
    from bayesssm_tpu.models.sir import simulate_sir

    _, y = simulate_sir(seed=1405)
    for mode in ("static128", "traced128", "traced50"):
        r = measure(mode, y)
        print(f"{mode}: {r / 1e3:.1f}k samples/s", flush=True)


if __name__ == "__main__":
    main()
