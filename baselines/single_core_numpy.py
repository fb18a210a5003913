"""Single-core CPU reference implementation for baseline measurement.

The reference R package publishes no benchmark numbers (BASELINE.md), and R
is not available in this environment, so the measured baseline is this
faithful single-core NumPy implementation of the reference's BPF-PMMH on
the stochastic-SIR config: exact per-day Gillespie dynamics vectorized
across particles (the same algorithmic shape as the reference's R
`epidemic_step` applied per particle, /root/reference/vignettes/articles/
stochastic-sir-model.Rmd:152-176 — vectorized NumPy is, if anything,
generous to the baseline), stratified resampling, fresh-weight SISAR as in
/root/reference/R/particle_filter_core.R.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "sir_pmmh_steps",
    "sir_bpf_loglike",
    "sir_apf_loglike",
    "sir_rmpf_loglike",
    "sinusoidal_bpf_loglike",
]


def _gillespie_day(rng, s, i, lam, gamma, n_total):
    """Advance all particles one day; s, i: float [n]."""
    t = np.zeros_like(s)
    active = i > 0
    while active.any():
        rate_inf = (lam / n_total) * s * i
        rate_rem = gamma * i
        rate_tot = rate_inf + rate_rem
        live = active & (rate_tot > 0)
        if not live.any():
            break
        safe = np.where(live, rate_tot, 1.0)
        dt = rng.exponential(1.0, size=s.shape) / safe
        t_new = t + dt
        fire = live & (t_new <= 1.0)
        u = rng.uniform(size=s.shape)
        infect = u < rate_inf / safe
        s = np.where(fire & infect, s - 1.0, s)
        i = np.where(fire, np.where(infect, i + 1.0, i - 1.0), i)
        t = np.where(live, t_new, t)
        active = fire & (i > 0)
    return s, i


def _pois_logpmf(k, rate):
    from math import lgamma

    safe = np.where(rate > 0, rate, 1.0)
    out = k * np.log(safe) - rate - np.array([lgamma(kk + 1) for kk in np.atleast_1d(k)])
    return np.where(rate > 0, out, np.where(k == 0, 0.0, -np.inf))


def sir_bpf_loglike(rng, y, n_particles, lam, gamma, n_total, init_infected):
    """One bootstrap-filter sweep; returns the log-likelihood estimate."""
    s = np.full(n_particles, float(n_total - init_infected))
    i = np.full(n_particles, float(init_infected))
    loglike = 0.0
    for obs in y:
        s, i = _gillespie_day(rng, s, i, lam, gamma, n_total)
        lw = _pois_logpmf(np.full_like(i, obs), i)
        mx = lw.max()
        if mx < -1e8:
            return -np.inf
        w = np.exp(lw - mx)
        tot = w.sum()
        weights = w / tot
        loglike += mx + np.log(tot) - np.log(n_particles)
        ess = 1.0 / np.square(weights).sum()
        if ess < n_particles / 2:  # SISAR + stratified
            u = (np.arange(n_particles) + rng.uniform(size=n_particles)) / n_particles
            idx = np.searchsorted(np.cumsum(weights), u, side="left")
            idx = np.clip(idx, 0, n_particles - 1)
            s, i = s[idx], i[idx]
    return loglike


def _stratified_idx(rng, weights):
    n = weights.shape[0]
    u = (np.arange(n) + rng.uniform(size=n)) / n
    idx = np.searchsorted(np.cumsum(weights), u, side="left")
    return np.clip(idx, 0, n - 1)


def sir_apf_loglike(rng, y, n_particles, lam, gamma, n_total, init_infected):
    """One auxiliary-filter sweep (BASELINE.json config 4), reference
    semantics incl. the Q2 double transition: propagate -> aux weights on
    the propagated particles -> auxiliary resample -> propagate AGAIN ->
    weights = loglik - aux[ancestors]
    (/root/reference/R/particle_filter_core.R:139-175)."""
    s = np.full(n_particles, float(n_total - init_infected))
    i = np.full(n_particles, float(init_infected))
    loglike = 0.0
    for obs in y:
        s, i = _gillespie_day(rng, s, i, lam, gamma, n_total)
        aux = _pois_logpmf(np.full_like(i, obs), i)
        mx_a = aux.max()
        if mx_a < -1e8:
            return -np.inf
        wa = np.exp(aux - mx_a)
        idx = _stratified_idx(rng, wa / wa.sum())
        s, i, aux_anc = s[idx], i[idx], aux[idx]
        s, i = _gillespie_day(rng, s, i, lam, gamma, n_total)
        lw = _pois_logpmf(np.full_like(i, obs), i) - aux_anc
        mx = lw.max()
        if mx < -1e8:
            return -np.inf
        w = np.exp(lw - mx)
        tot = w.sum()
        weights = w / tot
        loglike += mx + np.log(tot) - np.log(n_particles)
        ess = 1.0 / np.square(weights).sum()
        if ess < n_particles / 2:  # SISAR + stratified
            idx = _stratified_idx(rng, weights)
            s, i = s[idx], i[idx]
    return loglike


def sir_rmpf_loglike(
    rng, y, n_particles, lam, gamma, n_total, init_infected, step_max=2
):
    """One resample-move sweep (BASELINE.json config 5): SISR resample
    every step (/root/reference/R/resample_move_filter.R:230) + one
    random-walk MH rejuvenation move per particle on the infectious count
    (the serial analogue of models/sir.py::sir_move_fn)."""
    s = np.full(n_particles, float(n_total - init_infected))
    i = np.full(n_particles, float(init_infected))
    loglike = 0.0
    for obs in y:
        s, i = _gillespie_day(rng, s, i, lam, gamma, n_total)
        lw = _pois_logpmf(np.full_like(i, obs), i)
        mx = lw.max()
        if mx < -1e8:
            return -np.inf
        w = np.exp(lw - mx)
        tot = w.sum()
        weights = w / tot
        loglike += mx + np.log(tot) - np.log(n_particles)
        idx = _stratified_idx(rng, weights)  # SISR: always resample
        s, i = s[idx], i[idx]
        step = rng.integers(-step_max, step_max + 1, size=n_particles)
        i_prop = i + step
        in_support = (i_prop >= 0) & (i_prop <= n_total - s)
        log_ratio = _pois_logpmf(
            np.full_like(i, obs), np.maximum(i_prop, 0.0)
        ) - _pois_logpmf(np.full_like(i, obs), i)
        accept = in_support & (np.log(rng.uniform(size=n_particles)) < log_ratio)
        i = np.where(accept, i_prop, i)
    return loglike


def sir_pmmh_steps(
    num_steps: int,
    y,
    n_particles: int = 128,
    n_total: int = 500,
    init_infected: int = 70,
    seed: int = 0,
):
    """Run `num_steps` PMMH MH steps on one chain; returns theta chain."""
    rng = np.random.default_rng(seed)
    theta = np.array([0.5, 0.2])  # (lambda, gamma), log-transformed proposals
    prop_sd = np.array([0.1, 0.1])

    def log_prior(th):
        lam, gamma = th
        if lam <= 0 or gamma <= 0:
            return -np.inf
        return (
            -0.5 * (lam / 1.0) ** 2 - 0.5 * np.log(np.pi / 2)
            - 0.5 * (gamma / 2.0) ** 2 - 0.5 * np.log(np.pi * 2)
        )

    ll = sir_bpf_loglike(
        rng, y, n_particles, theta[0], theta[1], n_total, init_infected
    )
    chain = [theta.copy()]
    for _ in range(num_steps):
        z = np.log(theta)
        zp = z + prop_sd * rng.normal(size=2)
        theta_prop = np.exp(zp)
        lp = log_prior(theta_prop)
        ll_prop = sir_bpf_loglike(
            rng, y, n_particles, theta_prop[0], theta_prop[1],
            n_total, init_infected,
        )
        log_ratio = (
            ll_prop + lp + np.log(theta_prop).sum()
        ) - (ll + log_prior(theta) + np.log(theta).sum())
        if np.isnan(log_ratio):
            log_ratio = -np.inf
        if np.log(rng.uniform()) < log_ratio:
            theta, ll = theta_prop, ll_prop
        chain.append(theta.copy())
    return np.array(chain)


def sinusoidal_bpf_loglike(rng, y, n_particles, phi, sigma_x, sigma_y):
    """One bootstrap-filter sweep of the README sinusoidal AR(1) model
    (BASELINE.json config 1, /root/reference/README.md:100-150):
    x_t = phi x_{t-1} + sin(x_{t-1}) + N(0, sigma_x^2),
    y_t = x_t + N(0, sigma_y^2); fresh-weight SISAR + stratified, same
    shape as :func:`sir_bpf_loglike`."""
    x = rng.normal(size=n_particles)
    loglike = 0.0
    half_log_2pi = 0.5 * np.log(2.0 * np.pi)
    for obs in y:
        x = phi * x + np.sin(x) + sigma_x * rng.normal(size=n_particles)
        lw = (
            -0.5 * np.square((obs - x) / sigma_y)
            - np.log(sigma_y) - half_log_2pi
        )
        mx = lw.max()
        if mx < -1e8:
            return -np.inf
        w = np.exp(lw - mx)
        tot = w.sum()
        weights = w / tot
        loglike += mx + np.log(tot) - np.log(n_particles)
        ess = 1.0 / np.square(weights).sum()
        if ess < n_particles / 2:
            x = x[_stratified_idx(rng, weights)]
    return loglike
