"""Exact Kalman filter for linear-Gaussian SSMs (float64, host-side).

Ground truth for validating the particle filter's log-marginal-likelihood
estimator (BASELINE.md config 2). The reference package has no analytic
check; this is the addition recommended in SURVEY.md §4.
"""

from __future__ import annotations

import numpy as np

__all__ = ["kalman_loglik"]


def kalman_loglik(
    y,
    a: float,
    c: float,
    sigma_x: float,
    sigma_y: float,
    m0: float = 0.0,
    p0: float = 1.0,
) -> float:
    """Log marginal likelihood of a scalar linear-Gaussian SSM.

    Model: ``x_0 ~ N(m0, p0^2)``, ``x_t = a x_{t-1} + N(0, sigma_x^2)``,
    ``y_t = c x_t + N(0, sigma_y^2)`` observed at t = 1..T.

    Note ``p0`` is a standard deviation, matching the convention of
    ``init_fn`` simulators.
    """
    y = np.asarray(y, dtype=np.float64).ravel()
    m = float(m0)
    p = float(p0) ** 2
    qx = float(sigma_x) ** 2
    ry = float(sigma_y) ** 2
    ll = 0.0
    for obs in y:
        # predict
        m = a * m
        p = a * a * p + qx
        # observe
        s = c * c * p + ry
        resid = obs - c * m
        ll += -0.5 * (np.log(2.0 * np.pi * s) + resid * resid / s)
        # update
        gain = p * c / s
        m = m + gain * resid
        p = (1.0 - gain * c) * p
    return float(ll)
