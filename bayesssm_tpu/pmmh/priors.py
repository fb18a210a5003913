"""Prior evaluation helpers shared by the pilot and main PMMH chains."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["sum_log_priors"]


def sum_log_priors(theta_vec: jnp.ndarray, prior_fns) -> jnp.ndarray:
    """Sum of per-parameter log-priors evaluated at ``theta_vec``.

    ``prior_fns`` is an ordered sequence of scalar log-density callables,
    one per parameter (the values of the reference's ``log_priors`` list,
    /root/reference/R/pmmh.R:435-442). A parameter outside its support
    yields ``-inf`` which propagates to automatic rejection.
    """
    total = jnp.zeros(())
    for j, fn in enumerate(prior_fns):
        lp = jnp.asarray(fn(theta_vec[j]))
        # NaN from user densities means "outside support" -> -inf.
        lp = jnp.where(jnp.isnan(lp), -jnp.inf, lp)
        total = total + lp
    return total
