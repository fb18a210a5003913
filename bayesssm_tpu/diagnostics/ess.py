"""Multi-chain effective sample size (Vehtari et al. 2021).

Re-implements /root/reference/R/ESS.R:30-147 with identical numerical
conventions — between/within-chain variances, per-chain autocorrelations
combined as ``rho_t = 1 - (W - mean(s_i^2 rho_it)) / var_plus``, and Geyer's
initial-monotone-positive-pairs truncation — but computes the
autocovariances via FFT (O(m log m) instead of stats::acf's O(m^2)) and
vectorizes across chains, so it runs batched on device.

Input conventions (the reference's matrix / data.frame duality):
  * a ``[iterations, chains]`` array -> scalar ESS;
  * a dict of ``param -> [chains, iterations]`` arrays -> dict of ESS.
"""

from __future__ import annotations

import warnings

import jax.numpy as jnp
import numpy as np

__all__ = ["ess", "ess_matrix"]


def _next_pow2(n: int) -> int:
    return 1 << (2 * n - 1).bit_length()


def _acf_fft(x: jnp.ndarray) -> jnp.ndarray:
    """Per-chain autocorrelation to lag m-1. ``x``: [m, k] -> [m, k].

    Matches R's ``acf``: c_t = (1/m) sum_{s} (x_s - xbar)(x_{s+t} - xbar),
    rho_t = c_t / c_0.
    """
    m = x.shape[0]
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    nfft = _next_pow2(m)
    f = jnp.fft.rfft(xc, n=nfft, axis=0)
    ac = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=0)[:m]
    return ac / ac[0:1]


def ess_matrix(mat) -> jnp.ndarray:
    """ESS of a ``[iterations, chains]`` matrix as a traced scalar.

    Returns NaN when any chain has zero variance (the caller-facing ``ess``
    wrapper also emits the reference's warning).
    """
    mat = jnp.asarray(mat)
    m, k = mat.shape
    chain_means = jnp.mean(mat, axis=0)
    overall = jnp.mean(chain_means)
    b = m / (k - 1) * jnp.sum((chain_means - overall) ** 2)
    chain_vars = jnp.var(mat, axis=0, ddof=1)
    w = jnp.mean(chain_vars)
    var_hat = (m - 1) / m * w + b / m

    rho = _acf_fft(mat)  # [m, k]
    term = jnp.mean(chain_vars[None, :] * rho, axis=1)  # [m]
    hat_rho = 1.0 - (w - term) / var_hat

    # Geyer pairs: P_t = rho[2t-1] + rho[2t] (0-based lags), t = 1..floor((m-1)/2)
    max_pairs = (m - 1) // 2
    if max_pairs >= 1:
        pairs = hat_rho[1 : 2 * max_pairs + 1].reshape(max_pairs, 2).sum(axis=1)
        # enforce monotone non-increasing
        import jax.lax

        pairs = jax.lax.cummin(pairs, axis=0)
        # sum pairs until the first negative one
        nonneg = jnp.cumprod(pairs >= 0)
        sum_rho = jnp.sum(pairs * nonneg)
    else:
        sum_rho = jnp.zeros(())

    tau = 1.0 + 2.0 * sum_rho
    out = (k * m) / tau
    return jnp.where(jnp.any(chain_vars == 0), jnp.nan, out)


def _check_matrix(mat: np.ndarray) -> None:
    m, k = mat.shape
    if m < 2:
        raise ValueError("Number of iterations must be at least 2.")
    if k < 2:
        raise ValueError("Number of chains must be at least 2.")


def _warn_if_nan(value: float) -> float:
    if np.isnan(value):
        warnings.warn("One or more chains have zero variance.")
    return value


def long_dataframe_to_dict(df):
    """Convert the reference's long data.frame layout to a param dict.

    The reference accepts a data.frame with a ``chain`` column and one
    column per parameter (R/ESS.R:114-146, R/rhat.R:79-104); this is also
    the layout of its ``pmmh_output`` object. Returns
    ``{param: [chains, iterations]}`` with the reference's error contract.
    """
    if "chain" not in df.columns:
        raise ValueError("Data frame must contain a 'chain' column.")
    param_cols = [c for c in df.columns if c != "chain"]
    chain_ids = df["chain"].unique()
    out = {}
    for param in param_cols:
        per_chain = [
            np.asarray(df[param][df["chain"] == cid]) for cid in chain_ids
        ]
        if len({len(v) for v in per_chain}) != 1:
            raise ValueError(
                "Not all chains have the same number of iterations."
            )
        out[param] = np.stack(per_chain, axis=0)
    return out


def _is_dataframe(obj) -> bool:
    return hasattr(obj, "columns") and hasattr(obj, "__getitem__")


def ess(chains):
    """Effective sample size of MCMC chains.

    Accepts a ``[iterations, chains]`` matrix, a pandas DataFrame in the
    reference's long layout (a ``chain`` column plus one column per
    parameter, R/ESS.R:114-146), or a dict of ``param ->
    [chains, iterations]`` arrays. DataFrame/dict input returns a dict of
    per-parameter values.
    """
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
            mat = arr.T
            _check_matrix(mat)
            out[param] = _warn_if_nan(float(ess_matrix(mat)))
        return out
    mat = np.asarray(chains)
    if mat.ndim != 2:
        raise ValueError(
            "Input must be a matrix or a data frame with a 'chain' column "
            "(or a dict of [chains, iterations] arrays)."
        )
    _check_matrix(mat)
    return _warn_if_nan(float(ess_matrix(mat)))
