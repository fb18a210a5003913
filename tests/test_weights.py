import jax.numpy as jnp
import numpy as np

from bayesssm_tpu.ops import (
    normalize_log_weights,
    effective_sample_size,
    log_mean_exp,
)


def test_normalize_matches_direct():
    lw = jnp.array([-1.0, 0.5, 2.0, -3.0])
    w, lse, mx = normalize_log_weights(lw)
    direct = np.exp(np.asarray(lw))
    direct /= direct.sum()
    np.testing.assert_allclose(np.asarray(w), direct, rtol=1e-5)
    np.testing.assert_allclose(
        float(mx + lse), np.log(np.exp(np.asarray(lw)).sum()), rtol=1e-5
    )


def test_normalize_shift_invariance():
    lw = jnp.array([1000.0, 1001.0, 999.0])
    w, _, _ = normalize_log_weights(lw)
    direct = np.exp(np.asarray(lw) - 1001.0)
    direct /= direct.sum()
    np.testing.assert_allclose(np.asarray(w), direct, rtol=1e-6)


def test_degenerate_all_neg_inf():
    lw = jnp.full(4, -jnp.inf)
    w, lse, _ = normalize_log_weights(lw)
    assert not np.isnan(np.asarray(w)).any()
    np.testing.assert_allclose(np.asarray(w), 0.0)
    assert np.isneginf(float(lse))


def test_log_mean_exp_increment():
    # loglike increment = max + log(sum(exp(lw - max))) - log(n)
    # (R/particle_filter_core.R:204-208)
    lw = jnp.array([-0.3, 0.2, 0.9, 0.1])
    expected = np.log(np.mean(np.exp(np.asarray(lw))))
    np.testing.assert_allclose(float(log_mean_exp(lw, 4)), expected, rtol=1e-4)


def test_ess_uniform_and_atom():
    w = jnp.ones(10) / 10.0
    np.testing.assert_allclose(float(effective_sample_size(w)), 10.0, rtol=1e-6)
    atom = jnp.zeros(10).at[3].set(1.0)
    np.testing.assert_allclose(float(effective_sample_size(atom)), 1.0, rtol=1e-6)


def test_batched_axes():
    lw = jnp.array([[0.0, 0.0], [0.0, -jnp.inf]])
    w, _, _ = normalize_log_weights(lw)
    np.testing.assert_allclose(np.asarray(w), [[0.5, 0.5], [1.0, 0.0]])
    ess = effective_sample_size(w)
    np.testing.assert_allclose(np.asarray(ess), [2.0, 1.0])
