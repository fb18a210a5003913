"""Parameter transforms for random-walk proposals.

Re-implements /root/reference/R/utils.R:102-152: ``log`` maps (0, inf) to R,
``logit`` maps (0, 1) to R, ``identity`` is a no-op. Transforms are static
per-parameter codes, so the transformed/back-transformed vectors compile to
branchless selects.

Jacobian conventions (SURVEY.md quirk Q1): the reference returns
``log(theta)`` for ``log`` (= +log|d theta / d z|, correct for an MH ratio
with a symmetric proposal in z-space) but ``log(1/(theta (1-theta)))`` for
``logit`` — the *opposite* convention, locked in by its tests
(/root/reference/tests/testthat/test-utils.R:53-59). The mathematically
consistent logit Jacobian is ``+log(theta (1-theta))``; this module defaults
to the consistent convention and offers ``convention="reference"`` for exact
parity runs.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "TRANSFORMS",
    "resolve_transforms",
    "transform_params",
    "back_transform_params",
    "log_jacobian",
]

TRANSFORMS = ("identity", "log", "logit")
_CODE = {"identity": 0, "log": 1, "logit": 2}


def resolve_transforms(param_transform, param_names) -> tuple:
    """Resolve a user transform spec into a per-parameter tuple of names.

    Mirrors /root/reference/R/pmmh.R:296-322: ``None`` -> all identity;
    a dict must cover every parameter; invalid entries degrade to identity
    with a warning; the result is ordered to match ``param_names`` (the
    order of ``log_priors``).
    """
    import warnings

    if param_transform is None:
        return tuple("identity" for _ in param_names)
    if not isinstance(param_transform, dict):
        raise ValueError("param_transform must be a dict.")
    missing = [p for p in param_names if p not in param_transform]
    if missing:
        raise ValueError(
            "param_transform must include an entry for every parameter in "
            "log_priors."
        )
    out = []
    invalid = False
    for p in param_names:
        t = param_transform[p]
        if t not in TRANSFORMS:
            invalid = True
            t = "identity"
        out.append(t)
    if invalid:
        warnings.warn(
            "Only 'log', 'logit', and 'identity' transformations are "
            "supported. Using 'identity' for invalid entries."
        )
    return tuple(out)


def _codes(transforms) -> np.ndarray:
    return np.array([_CODE[t] for t in transforms], dtype=np.int32)


def transform_params(theta: jnp.ndarray, transforms) -> jnp.ndarray:
    """theta -> z on the proposal scale. ``transforms``: static tuple."""
    code = _codes(transforms)
    safe = jnp.clip(theta, 1e-300, None)
    logit = jnp.log(safe) - jnp.log1p(-jnp.clip(theta, None, 1 - 1e-15))
    out = jnp.where(code == 1, jnp.log(safe), theta)
    return jnp.where(code == 2, logit, out)


def back_transform_params(z: jnp.ndarray, transforms) -> jnp.ndarray:
    """z -> theta on the model scale."""
    code = _codes(transforms)
    out = jnp.where(code == 1, jnp.exp(z), z)
    return jnp.where(code == 2, 1.0 / (1.0 + jnp.exp(-z)), out)


def log_jacobian(
    theta: jnp.ndarray, transforms, convention: str = "consistent"
) -> jnp.ndarray:
    """Sum of per-parameter log-Jacobian corrections at ``theta``.

    ``convention="consistent"``: +log|d theta/d z| for every transform
    (log -> log(theta); logit -> log(theta (1 - theta))).
    ``convention="reference"``: the reference's mixed convention (Q1),
    logit -> -log(theta (1 - theta)).
    """
    if convention not in ("consistent", "reference"):
        raise ValueError("convention must be 'consistent' or 'reference'")
    code = _codes(transforms)
    safe = jnp.clip(theta, 1e-300, None)
    log_term = jnp.log(safe)
    logit_term = jnp.log(safe) + jnp.log1p(-jnp.clip(theta, None, 1 - 1e-15))
    if convention == "reference":
        logit_term = -logit_term
    per_param = jnp.where(
        code == 1, log_term, jnp.where(code == 2, logit_term, 0.0)
    )
    return jnp.sum(per_param)
