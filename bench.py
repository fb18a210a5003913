"""Benchmark: aggregate PMMH samples/s at 4096 chains on stochastic-SIR.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is BASELINE.json's north-star config: bootstrap-filter PMMH on
the stochastic SIR model (n_total=500, 70 initially infected, T=10 daily
Poisson observations), 4096 chains running the full MH step (MVN propose in
log-space -> full particle-filter sweep with exact vectorized Gillespie
dynamics -> accept/reject) on device. ``vs_baseline`` is the speedup over a
measured single-core NumPy implementation of the same sampler
(baselines/single_core_numpy.py) — the reference R package publishes no
numbers and R is unavailable here (BASELINE.md).

Usage: python bench.py [--quick] [--chains C] [--particles N] [--steps K]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def tpu_samples_per_sec(
    y, chains, particles, steps_per_call, timed_calls, reps, transition,
):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from bayesssm_tpu.filters.bootstrap import bootstrap_filter
    from bayesssm_tpu.models.sir import sir_model
    from bayesssm_tpu.pmmh.priors import sum_log_priors

    (init_fn, transition_fn, loglik_fn), log_priors, _ = sir_model(
        n_total=500, init_infected=70, transition=transition
    )
    param_names = list(log_priors)
    prior_fns = [log_priors[p] for p in param_names]
    ys = jnp.asarray(y, dtype=jnp.float32)
    prop_sd = jnp.array([0.1, 0.1], dtype=jnp.float32)

    def pf_loglike(key, theta_vec):
        theta = {p: theta_vec[j] for j, p in enumerate(param_names)}
        return bootstrap_filter(
            key, ys, particles, init_fn, transition_fn, loglik_fn,
            theta=theta, return_particles=False,
        ).loglike

    def mh_step(carry, _):
        key, theta, ll = carry
        key, k_prop, k_pf, k_acc = jax.random.split(key, 4)
        z = jnp.log(theta)
        zp = z + prop_sd * jax.random.normal(k_prop, z.shape, dtype=z.dtype)
        theta_prop = jnp.exp(zp)
        lp_prop = sum_log_priors(theta_prop, prior_fns)
        ll_prop = pf_loglike(k_pf, theta_prop)
        log_ratio = (ll_prop + lp_prop + zp.sum()) - (
            ll + sum_log_priors(theta, prior_fns) + z.sum()
        )
        log_ratio = jnp.where(jnp.isnan(log_ratio), -jnp.inf, log_ratio)
        accept = jnp.log(jax.random.uniform(k_acc)) < log_ratio
        theta = jnp.where(accept, theta_prop, theta)
        ll = jnp.where(accept, ll_prop, ll)
        return (key, theta, ll), None

    def k_steps(keys, thetas, lls):
        def one(key, theta, ll):
            (key, theta, ll), _ = lax.scan(
                mh_step, (key, theta, ll), None, length=steps_per_call
            )
            return key, theta, ll

        return jax.vmap(one)(keys, thetas, lls)

    keys = jax.random.split(jax.random.key(0), chains)
    thetas = jnp.tile(jnp.array([0.5, 0.2], jnp.float32), (chains, 1))
    ll0 = jax.vmap(pf_loglike)(
        jax.random.split(jax.random.key(1), chains),
        thetas,
    )
    step = jax.jit(k_steps)

    # Warmup / compile. NOTE: through the axon tunnel block_until_ready
    # does not reliably block, so completion is forced by a host read of a
    # result scalar (device->host round-trip bounds the whole dependency
    # chain; each step consumes the previous step's outputs).
    keys, thetas, lls = step(keys, thetas, ll0)
    float(jnp.sum(lls))

    # Median of `reps` timing repetitions: the remote tunnel and the
    # data-dependent Gillespie event counts make single runs noisy
    # (round 1 saw 2x run-to-run spread), so the headline is a median.
    rates = []
    samples_per_rep = chains * steps_per_call * timed_calls
    for _ in range(reps):
        t0 = time.time()
        for _ in range(timed_calls):
            keys, thetas, lls = step(keys, thetas, lls)
        float(jnp.sum(lls))  # forced completion (see warmup note)
        rates.append(samples_per_rep / (time.time() - t0))
    return float(np.median(rates)), rates


def baseline_samples_per_sec(y, particles, steps):
    """Single-core samples/s: one MH step costs one PF sweep; timed at the
    generating parameters for run-to-run stability (MH exploration makes
    per-step cost noisy), which if anything flatters the baseline since
    proposals above the truth simulate more epidemic events."""
    sys.path.insert(0, "baselines")
    import numpy as np

    from single_core_numpy import sir_bpf_loglike

    rng = np.random.default_rng(0)
    # warmup sweep
    sir_bpf_loglike(rng, y, particles, 0.5, 0.2, 500, 70)
    t0 = time.time()
    for _ in range(steps):
        sir_bpf_loglike(rng, y, particles, 0.5, 0.2, 500, 70)
    elapsed = time.time() - t0
    return steps / elapsed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--chains", type=int, default=4096)
    ap.add_argument("--particles", type=int, default=128)
    # 16 MH steps per jitted call: amortizes the ~24 ms per-call tunnel
    # dispatch overhead, matching how production runs execute (the pmmh
    # driver scans hundreds of steps per chunk). Throughput saturates at
    # this point (steps=32 measured the same within noise).
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--calls", type=int, default=2)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--transition", default="gillespie_pallas",
        choices=["gillespie", "gillespie_pallas", "tauleap"],
        help="SIR day-step simulator (gillespie_pallas = fused TPU kernel)",
    )
    ap.add_argument("--baseline-steps", type=int, default=6)
    ap.add_argument(
        "--profile", metavar="DIR", default=None,
        help="write a jax.profiler trace of the timed region to DIR",
    )
    args = ap.parse_args()

    if args.quick:
        args.chains, args.steps, args.calls = 256, 2, 2
        args.baseline_steps = 2
        args.reps = 2

    from bayesssm_tpu.models.sir import simulate_sir

    _, y = simulate_sir(seed=1405)

    if args.profile:
        import contextlib

        import jax

        profile_ctx = jax.profiler.trace(args.profile)
    else:
        import contextlib

        profile_ctx = contextlib.nullcontext()

    with profile_ctx:
        value, rates = tpu_samples_per_sec(
            y, args.chains, args.particles, args.steps, args.calls,
            args.reps, args.transition,
        )
    base = baseline_samples_per_sec(y, args.particles, args.baseline_steps)

    print(
        f"reps (samples/s): {[round(r) for r in rates]}", file=sys.stderr
    )
    print(
        json.dumps(
            {
                "metric": "pmmh_samples_per_sec_4096chains_sir",
                "value": round(value, 2),
                "unit": "samples/s",
                "vs_baseline": round(value / base, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
