"""Parameter-transform tests mirroring /root/reference/tests/testthat/test-utils.R."""

import jax.numpy as jnp
import numpy as np
import pytest

from bayesssm_tpu.pmmh.transforms import (
    back_transform_params,
    log_jacobian,
    resolve_transforms,
    transform_params,
)


def test_roundtrip():
    theta = jnp.array([0.5, 2.0, 0.25])
    tr = ("identity", "log", "logit")
    z = transform_params(theta, tr)
    np.testing.assert_allclose(
        np.asarray(z), [0.5, np.log(2.0), np.log(0.25 / 0.75)], rtol=1e-6
    )
    back = back_transform_params(z, tr)
    np.testing.assert_allclose(np.asarray(back), np.asarray(theta), rtol=1e-6)


def test_jacobian_reference_convention():
    # test-utils.R:53-59 — the reference returns log(theta) for log and
    # log(1/(theta(1-theta))) for logit (quirk Q1).
    theta = jnp.array([2.0, 0.25])
    tr = ("log", "logit")
    val = float(log_jacobian(theta, tr, convention="reference"))
    expected = np.log(2.0) + np.log(1.0 / (0.25 * 0.75))
    np.testing.assert_allclose(val, expected, rtol=1e-6)


def test_jacobian_consistent_convention():
    theta = jnp.array([2.0, 0.25])
    tr = ("log", "logit")
    val = float(log_jacobian(theta, tr, convention="consistent"))
    expected = np.log(2.0) + np.log(0.25 * 0.75)
    np.testing.assert_allclose(val, expected, rtol=1e-6)


def test_identity_jacobian_zero():
    assert float(log_jacobian(jnp.array([3.0]), ("identity",))) == 0.0


def test_resolve_defaults_and_order():
    assert resolve_transforms(None, ["a", "b"]) == ("identity", "identity")
    out = resolve_transforms({"b": "log", "a": "logit"}, ["a", "b"])
    assert out == ("logit", "log")


def test_resolve_missing_raises():
    with pytest.raises(ValueError, match="every parameter"):
        resolve_transforms({"a": "log"}, ["a", "b"])


def test_resolve_invalid_warns():
    with pytest.warns(UserWarning, match="identity"):
        out = resolve_transforms({"a": "exp"}, ["a"])
    assert out == ("identity",)


def test_resolve_non_dict_raises():
    with pytest.raises(ValueError, match="must be a dict"):
        resolve_transforms(["log"], ["a"])
