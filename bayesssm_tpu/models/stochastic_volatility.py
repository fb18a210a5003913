"""Stochastic-volatility model — beyond-reference model-zoo entry.

The canonical PMMH showcase (Andrieu, Doucet & Holenstein 2010, §3.2):

    x_1 ~ N(mu, sigma^2 / (1 - phi^2))            (stationary init)
    x_t = mu + phi * (x_{t-1} - mu) + sigma * eta_t
    y_t ~ N(0, exp(x_t))                          (volatility observation)

The reference package has no model zoo (its models live in vignettes:
/root/reference/README.md:90-150, vignettes/articles/*.Rmd); this module
follows the same (model_fns, log_priors, param_transform) contract as
models/sinusoidal.py so the model drops into ``pmmh``/the filters
unchanged. It doubles as the real-model exercise of the LOGIT transform
path (quirk Q1, pmmh/transforms.py): ``phi`` lives in (0, 1) with a
Beta prior and is proposed in logit space.

Priors: phi ~ Beta(9, 1) (persistence near 1), sigma ~ Exp(2),
mu ~ N(0, 2). Transforms: phi logit, sigma log, mu identity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bayesssm_tpu.models.distributions import (
    beta_logpdf,
    exp_logpdf,
    norm_logpdf,
)

__all__ = ["sv_model", "simulate_sv"]


def sv_model():
    """Return (model_fns, log_priors, param_transform) for the SV model."""

    def init_fn(key, num_particles, phi, sigma, mu):
        sd0 = sigma / jnp.sqrt(1.0 - phi * phi)
        return mu + sd0 * jax.random.normal(key, (num_particles,))

    def transition_fn(key, particles, phi, sigma, mu):
        noise = jax.random.normal(key, particles.shape)
        return mu + phi * (particles - mu) + sigma * noise

    def log_likelihood_fn(y, particles):
        # y_t | x_t ~ N(0, exp(x_t)): sd = exp(x_t / 2).
        return norm_logpdf(y, mean=0.0, sd=jnp.exp(0.5 * particles))

    log_priors = {
        "phi": lambda p: beta_logpdf(p, 9.0, 1.0),
        "sigma": lambda s: exp_logpdf(s, 2.0),
        "mu": lambda m: norm_logpdf(m, 0.0, 2.0),
    }
    param_transform = {"phi": "logit", "sigma": "log", "mu": "identity"}
    return (init_fn, transition_fn, log_likelihood_fn), log_priors, param_transform


def simulate_sv(seed=1405, t_val=50, phi=0.95, sigma=0.3, mu=-1.0):
    """Simulate an SV path. Returns (x [T], y [T])."""
    rng = np.random.default_rng(seed)
    x = np.zeros(t_val)
    y = np.zeros(t_val)
    x[0] = mu + sigma / np.sqrt(1.0 - phi * phi) * rng.normal()
    y[0] = np.exp(0.5 * x[0]) * rng.normal()
    for t in range(1, t_val):
        x[t] = mu + phi * (x[t - 1] - mu) + sigma * rng.normal()
        y[t] = np.exp(0.5 * x[t]) * rng.normal()
    return x, y
