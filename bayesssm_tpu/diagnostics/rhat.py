"""Split-Rhat convergence diagnostic (Gelman et al. 2013).

Re-implements /root/reference/R/rhat.R:27-107 with identical conventions:
drop the last iteration if odd, split each chain in half, and compute
``sqrt(var_plus / W)`` — including the reference's use of the *full*
(post-drop) iteration count ``m`` in the between-chain scaling rather than
the half-length, and the snap of values in [0.99, 1] to exactly 1.00
(R/rhat.R:63-65).
"""

from __future__ import annotations

import warnings

import jax.numpy as jnp
import numpy as np

__all__ = ["rhat", "rhat_matrix"]


def rhat_matrix(mat) -> jnp.ndarray:
    """Split-Rhat of a ``[iterations, chains]`` matrix as a traced scalar."""
    mat = jnp.asarray(mat)
    m, k = mat.shape
    if m % 2 == 1:
        mat = mat[:-1]
        m -= 1
    half = m // 2
    # [half, 2k]: each chain split into first/second half.
    split = jnp.concatenate([mat[:half], mat[half:]], axis=1)
    chain_means = jnp.mean(split, axis=0)
    overall = jnp.mean(chain_means)
    # Reference uses m (not m/2) in both scalings (R/rhat.R:51,60).
    b = m / (2 * k - 1) * jnp.sum((chain_means - overall) ** 2)
    chain_vars = jnp.var(split, axis=0, ddof=1)
    w = jnp.mean(chain_vars)
    var_hat = (m - 1) / m * w + b / m
    r = jnp.sqrt(var_hat / w)
    r = jnp.where((r >= 0.99) & (r <= 1.0), 1.0, r)
    return jnp.where(jnp.any(chain_vars == 0), jnp.nan, r)


def _compute(mat: np.ndarray) -> float:
    if mat.shape[0] < 2:
        raise ValueError("Number of iterations must be at least 2.")
    value = float(rhat_matrix(mat))
    if np.isnan(value):
        warnings.warn("One or more chains have zero variance.")
    return value


def rhat(chains):
    """Split-Rhat of MCMC chains.

    Accepts a ``[iterations, chains]`` matrix, a pandas DataFrame in the
    reference's long layout (a ``chain`` column plus parameter columns,
    R/rhat.R:79-104), or a dict of ``param -> [chains, iterations]``
    arrays (see ess()).
    """
    from bayesssm_tpu.diagnostics.ess import _is_dataframe, long_dataframe_to_dict

    if _is_dataframe(chains):
        chains = long_dataframe_to_dict(chains)
    if isinstance(chains, dict):
        out = {}
        for param, arr in chains.items():
            arr = np.asarray(arr)
            if arr.ndim != 2:
                raise ValueError(
                    f"chains for parameter {param!r} must be 2-D "
                    "[chains, iterations]"
                )
            out[param] = _compute(arr.T)
        return out
    mat = np.asarray(chains)
    if mat.ndim != 2:
        raise ValueError(
            "Input must be a matrix or a data frame with a 'chain' column "
            "(or a dict of [chains, iterations] arrays)."
        )
    return _compute(mat)
