"""Log-density helpers for model and prior definitions.

JAX analogues of the R d* functions used throughout the reference's
examples and vignettes (dnorm/dexp/dunif/dpois and extraDistr::dhnorm).
All return log-densities and propagate ``-inf`` outside the support, which
PMMH interprets as prior/support rejection.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln

__all__ = [
    "norm_logpdf",
    "exp_logpdf",
    "unif_logpdf",
    "pois_logpmf",
    "halfnorm_logpdf",
    "beta_logpdf",
]

_NEG_INF = -jnp.inf
_LOG_2PI = jnp.log(2.0 * jnp.pi)


def norm_logpdf(x, mean=0.0, sd=1.0):
    """log N(x; mean, sd) — R's dnorm(log=TRUE)."""
    z = (x - mean) / sd
    return -0.5 * (_LOG_2PI + z * z) - jnp.log(sd)


def exp_logpdf(x, rate=1.0):
    """log Exp(x; rate) — R's dexp(log=TRUE); -inf for x < 0."""
    return jnp.where(x >= 0, jnp.log(rate) - rate * x, _NEG_INF)


def unif_logpdf(x, lo=0.0, hi=1.0):
    """log Unif(x; lo, hi) — R's dunif(log=TRUE); -inf outside [lo, hi]."""
    return jnp.where(
        (x >= lo) & (x <= hi), -jnp.log(hi - lo), _NEG_INF
    )


def pois_logpmf(k, rate):
    """log Pois(k; rate) — R's dpois(log=TRUE).

    Handles rate == 0 (mass at k == 0) without NaNs, which matters for SIR
    particles whose infectious compartment hits zero.
    """
    rate = jnp.asarray(rate, dtype=jnp.result_type(rate, jnp.float32))
    safe_rate = jnp.where(rate > 0, rate, 1.0)
    out = k * jnp.log(safe_rate) - rate - gammaln(k + 1.0)
    return jnp.where(rate > 0, out, jnp.where(k == 0, 0.0, _NEG_INF))


def beta_logpdf(x, a=1.0, b=1.0):
    """log Beta(x; a, b) — R's dbeta(log=TRUE); -inf outside (0, 1).

    Open-interval support (endpoints -inf even when a, b allow them):
    the model zoo uses it for persistence parameters under the logit
    transform, where 0/1 map to infinite z.
    """
    from jax.scipy.special import gammaln

    inside = (x > 0) & (x < 1)
    xs = jnp.where(inside, x, 0.5)
    out = (
        (a - 1.0) * jnp.log(xs)
        + (b - 1.0) * jnp.log1p(-xs)
        + gammaln(a + b) - gammaln(a) - gammaln(b)
    )
    return jnp.where(inside, out, _NEG_INF)


def halfnorm_logpdf(x, sigma=1.0):
    """log half-normal(x; sigma) — extraDistr::dhnorm(log=TRUE);
    -inf for x < 0 (used by the SIR vignette's priors)."""
    return jnp.where(
        x >= 0,
        jnp.log(2.0) - 0.5 * _LOG_2PI - jnp.log(sigma)
        - 0.5 * (x / sigma) ** 2,
        _NEG_INF,
    )
