"""Linear-Gaussian state-space model with exact Kalman ground truth.

BASELINE.md config 2: used to validate the particle filter's log-marginal
likelihood exactly (utils/kalman.py) — an analytic check the reference
package does not have.

    x_0 ~ N(0, p0^2), x_t = a x_{t-1} + N(0, sigma_x^2),
    y_t = c x_t + N(0, sigma_y^2).
"""

from __future__ import annotations

import jax
import numpy as np

from bayesssm_tpu.models.distributions import exp_logpdf, norm_logpdf, unif_logpdf

__all__ = ["lgss_model", "simulate_lgss", "lgss_mv_model", "simulate_lgss_mv"]


def lgss_model(c: float = 1.0, p0: float = 1.0):
    """Return (model_fns, log_priors, param_transform); theta = (a, sigma_x, sigma_y)."""

    def init_fn(key, num_particles):
        return p0 * jax.random.normal(key, (num_particles,))

    def transition_fn(key, particles, a, sigma_x):
        return a * particles + sigma_x * jax.random.normal(key, particles.shape)

    def log_likelihood_fn(y, particles, sigma_y):
        return norm_logpdf(y, mean=c * particles, sd=sigma_y)

    log_priors = {
        "a": lambda v: unif_logpdf(v, -1.0, 1.0),
        "sigma_x": lambda v: exp_logpdf(v, 1.0),
        "sigma_y": lambda v: exp_logpdf(v, 1.0),
    }
    param_transform = {"a": "identity", "sigma_x": "log", "sigma_y": "log"}
    return (init_fn, transition_fn, log_likelihood_fn), log_priors, param_transform


def lgss_mv_model(c_vec=(1.0, 0.5), p0: float = 1.0):
    """Scalar-state LGSS with a VECTOR (d_y-dimensional) observation.

    Exercises the core's matrix-``y`` path: observations enter the filter
    as ``[T, d_y]`` and the weight function receives each ``y_t`` row —
    the vector/matrix duality the reference core implements at
    /root/reference/R/particle_filter_core.R:176-183. Observation model:
    ``y_t = c_vec x_t + N(0, diag(sigma_y^2))`` with one shared
    ``sigma_y`` (kept scalar so the PMMH parameter space matches
    ``lgss_model``); exact ground truth via
    ``utils.kalman.kalman_loglik_mv``.
    """
    import jax.numpy as jnp

    cv = np.asarray(c_vec, dtype=np.float32)

    def init_fn(key, num_particles):
        return p0 * jax.random.normal(key, (num_particles,))

    def transition_fn(key, particles, a, sigma_x):
        return a * particles + sigma_x * jax.random.normal(key, particles.shape)

    def log_likelihood_fn(y, particles, sigma_y):
        # y [d_y], particles [n] -> [n]: independent Gaussian components.
        mean = jnp.asarray(cv)[None, :] * particles[:, None]   # [n, d_y]
        return norm_logpdf(y[None, :], mean=mean, sd=sigma_y).sum(axis=-1)

    log_priors = {
        "a": lambda v: unif_logpdf(v, -1.0, 1.0),
        "sigma_x": lambda v: exp_logpdf(v, 1.0),
        "sigma_y": lambda v: exp_logpdf(v, 1.0),
    }
    param_transform = {"a": "identity", "sigma_x": "log", "sigma_y": "log"}
    return (init_fn, transition_fn, log_likelihood_fn), log_priors, param_transform


def simulate_lgss_mv(
    seed, t_val=25, a=0.9, c_vec=(1.0, 0.5), sigma_x=0.6, sigma_y=0.4,
    p0=1.0,
):
    """Returns (x [T+1], y [T, d_y]) for the vector-observation LGSS."""
    rng = np.random.default_rng(seed)
    cv = np.asarray(c_vec, dtype=np.float64)
    x = np.zeros(t_val + 1)
    y = np.zeros((t_val, cv.shape[0]))
    x[0] = p0 * rng.normal()
    for t in range(t_val):
        x[t + 1] = a * x[t] + sigma_x * rng.normal()
        y[t] = cv * x[t + 1] + sigma_y * rng.normal(size=cv.shape[0])
    return x, y


def simulate_lgss(seed, t_val=25, a=0.9, c=1.0, sigma_x=0.6, sigma_y=0.4, p0=1.0):
    """Returns (x [T+1], y [T])."""
    rng = np.random.default_rng(seed)
    x = np.zeros(t_val + 1)
    y = np.zeros(t_val)
    x[0] = p0 * rng.normal()
    for t in range(t_val):
        x[t + 1] = a * x[t] + sigma_x * rng.normal()
        y[t] = c * x[t + 1] + sigma_y * rng.normal()
    return x, y
