"""APF and RMPF behavioral tests.

Mirrors /root/reference/tests/testthat/test-auxiliary_filter.R (APF beats
BPF on state-estimation MSE under informative observations) and
test-resample_move_filter.R (RMPF beats BPF under strong degeneracy), run
over several seeds since single-seed comparisons are noisy.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesssm_tpu.filters.auxiliary import auxiliary_filter
from bayesssm_tpu.filters.bootstrap import bootstrap_filter
from bayesssm_tpu.filters.resample_move import resample_move_filter

MU, SIGMA = 1.0, 0.1
THETA = {"mu": MU, "sigma": SIGMA}


def simulate_drift(seed, T=50, sigma=SIGMA):
    rng = np.random.default_rng(seed)
    x = np.zeros(T + 1)
    y = np.zeros(T)
    x[0] = rng.normal()
    for t in range(T):
        x[t + 1] = x[t] + rng.normal(MU)
        y[t] = rng.normal(x[t + 1], sigma)
    return x, y


def init_fn(key, num_particles):
    return jax.random.normal(key, (num_particles,))


def transition_fn(key, particles, mu):
    return particles + mu + jax.random.normal(key, particles.shape)


def loglik_fn(y, particles, sigma):
    return -0.5 * (jnp.log(2 * jnp.pi * sigma**2) + ((y - particles) / sigma) ** 2)


def aux_loglik_fn(y, particles, mu, sigma):
    return loglik_fn(y, particles + mu, sigma)


def move_fn(key, particles, y, sigma):
    k1, k2 = jax.random.split(key)
    proposal = particles + 0.1 * jax.random.normal(k1, particles.shape)
    log_alpha = loglik_fn(y, proposal, sigma) - loglik_fn(y, particles, sigma)
    accept = jnp.log(jax.random.uniform(k2, particles.shape)) < log_alpha
    return jnp.where(accept, proposal, particles)


def test_apf_beats_bpf_mse():
    wins = 0
    for seed in range(5):
        x, y = simulate_drift(seed)
        bpf = bootstrap_filter(
            jax.random.key(seed), y, 20, init_fn, transition_fn, loglik_fn,
            theta=THETA, return_particles=False,
        )
        apf = auxiliary_filter(
            jax.random.key(seed + 100), y, 20, init_fn, transition_fn,
            loglik_fn, aux_loglik_fn, theta=THETA, return_particles=False,
        )
        mse_bpf = np.mean((np.asarray(bpf.state_est) - x) ** 2)
        mse_apf = np.mean((np.asarray(apf.state_est) - x) ** 2)
        wins += mse_apf < mse_bpf
    assert wins >= 3


def test_rmpf_beats_bpf_mse():
    wins = 0
    for seed in range(5):
        x, y = simulate_drift(seed, sigma=0.05)
        theta = {"mu": MU, "sigma": 0.05}
        bpf = bootstrap_filter(
            jax.random.key(seed), y, 20, init_fn, transition_fn, loglik_fn,
            theta=theta, return_particles=False,
        )
        rmpf = resample_move_filter(
            jax.random.key(seed + 100), y, 20, init_fn, transition_fn,
            loglik_fn, move_fn, theta=theta, return_particles=False,
        )
        mse_bpf = np.mean((np.asarray(bpf.state_est) - x) ** 2)
        mse_rmpf = np.mean((np.asarray(rmpf.state_est) - x) ** 2)
        wins += mse_rmpf < mse_bpf
    assert wins >= 3


def test_rmpf_always_resamples():
    _, y = simulate_drift(7)
    res = resample_move_filter(
        jax.random.key(0), y, 32, init_fn, transition_fn, loglik_fn, move_fn,
        theta=THETA,
    )
    # SISR forced: recorded ESS is always n (Q4).
    np.testing.assert_allclose(np.asarray(res.ess), 32.0)
    assert res.algorithm == "RMPF"
    assert res.resample_algorithm == "SISR"


def test_apf_uses_lookahead_weights():
    # A pathological lookahead that concentrates all auxiliary weight on one
    # particle must change the result vs BPF with the same key.
    _, y = simulate_drift(3)
    apf = auxiliary_filter(
        jax.random.key(5), y, 64, init_fn, transition_fn, loglik_fn,
        aux_loglik_fn, theta=THETA, return_particles=False,
    )
    bpf = bootstrap_filter(
        jax.random.key(5), y, 64, init_fn, transition_fn, loglik_fn,
        theta=THETA, return_particles=False,
    )
    assert not np.allclose(np.asarray(apf.state_est), np.asarray(bpf.state_est))
    assert np.isfinite(float(apf.loglike))
