"""Resampling kernel tests.

Mirrors the reference's statistical and structural contracts from
/root/reference/tests/testthat/test-resampling.R: frequency matching within
5% over many replicates, deterministic strata structure for stratified /
systematic, degenerate one-atom weights, and weight-validation errors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesssm_tpu.ops import (
    resample_indices,
    resample_multinomial,
    resample_stratified,
    resample_systematic,
)
from bayesssm_tpu.ops.resampling import RESAMPLE_METHODS

METHODS = ["multinomial", "stratified", "systematic"]


@pytest.mark.parametrize("method", METHODS)
def test_frequencies_match_weights(method):
    # test-resampling.R:29-47 — resampled index frequencies within 5% of
    # weights over many replicates.
    w = jnp.array([0.1, 0.2, 0.3, 0.4])
    n = 4
    reps = 10_000
    keys = jax.random.split(jax.random.key(0), reps)
    idx = jax.vmap(lambda k: resample_indices(k, w, method=method))(keys)
    counts = np.bincount(np.asarray(idx).ravel(), minlength=n)
    freqs = counts / (reps * n)
    np.testing.assert_allclose(freqs, np.asarray(w), atol=0.05)


def test_stratified_strata_structure():
    # test-resampling.R:48-55 — weights (0.1, 0.5, 0.1, 0.15, 0.15) have CDF
    # (0.1, 0.6, 0.7, 0.85, 1.0): strata 2 and 3 cover (0.2, 0.4] and
    # (0.4, 0.6], both inside index 1's CDF segment (0.1, 0.6].
    w = jnp.array([0.1, 0.5, 0.1, 0.15, 0.15])
    keys = jax.random.split(jax.random.key(0), 100)
    idx = np.asarray(
        jax.vmap(lambda k: resample_indices(k, w, method="stratified"))(keys)
    )
    assert (idx[:, 1] == 1).all()
    assert (idx[:, 2] == 1).all()


def test_systematic_coupling():
    # test-resampling.R:56-68 — systematic shares one offset: samples 2 and 3
    # always pick index 1, and sample 4 is coupled to sample 1 (first==0 =>
    # fourth==2, first==1 => fourth==3 in 0-based indexing).
    w = jnp.array([0.1, 0.5, 0.1, 0.15, 0.15])
    keys = jax.random.split(jax.random.key(1), 100)
    idx = np.asarray(
        jax.vmap(lambda k: resample_indices(k, w, method="systematic"))(keys)
    )
    assert (idx[:, 1] == 1).all()
    assert (idx[:, 2] == 1).all()
    first, fourth = idx[:, 0], idx[:, 3]
    assert (fourth[first == 0] == 2).all()
    assert (fourth[first == 1] == 3).all()


@pytest.mark.parametrize("method", METHODS)
def test_degenerate_atom(method):
    # test-resampling.R:190-202 — a single-atom weight vector maps every
    # output to that atom.
    w = jnp.array([0.0, 0.0, 1.0, 0.0])
    idx = np.asarray(resample_indices(jax.random.key(3), w, method=method))
    np.testing.assert_array_equal(idx, np.full(4, 2))


@pytest.mark.parametrize(
    "fn", [resample_multinomial, resample_stratified, resample_systematic]
)
def test_length_mismatch_raises(fn):
    # R/resampling.R:16-18 — particle/weight length mismatch is an error.
    with pytest.raises(ValueError, match="must match the length of weights"):
        fn(jax.random.key(0), jnp.zeros((5, 2)), jnp.ones(4) / 4.0)


@pytest.mark.parametrize("method", METHODS)
def test_matrix_particles_gather(method):
    # R/resampling.R matrix branch: rows are gathered by ancestor index.
    particles = jnp.arange(8.0).reshape(4, 2)
    w = jnp.array([0.0, 1.0, 0.0, 0.0])
    out = {
        "multinomial": resample_multinomial,
        "stratified": resample_stratified,
        "systematic": resample_systematic,
    }[method](jax.random.key(0), particles, w)
    np.testing.assert_allclose(np.asarray(out), np.tile(particles[1], (4, 1)))


def test_batched_chains_axis():
    # The kernels batch over a leading chains axis — each chain resamples
    # from its own weights.
    w = jnp.stack([jnp.array([1.0, 0, 0, 0]), jnp.array([0, 0, 0, 1.0])])
    idx = np.asarray(
        resample_indices(jax.random.key(0), w, method="systematic")
    )
    np.testing.assert_array_equal(idx[0], np.zeros(4))
    np.testing.assert_array_equal(idx[1], np.full(4, 3))


def test_num_alive_masking():
    # Masked lanes (>= num_alive) must never be selected as ancestors for
    # alive output slots.
    w = jnp.concatenate([jnp.ones(5) / 5.0, jnp.zeros(3)])
    keys = jax.random.split(jax.random.key(2), 20)
    for method in METHODS:
        idx = np.asarray(
            jax.vmap(
                lambda k: resample_indices(
                    k, w, method=method, num_alive=jnp.asarray(5.0)
                )
            )(keys)
        )
        assert (idx < 5).all()


def test_num_alive_frequencies():
    # With masking, frequencies over the alive prefix still match weights.
    w = jnp.concatenate([jnp.array([0.5, 0.3, 0.2]), jnp.zeros(5)])
    reps = 5000
    keys = jax.random.split(jax.random.key(7), reps)
    idx = jax.vmap(
        lambda k: resample_indices(
            k, w, method="stratified", num_alive=jnp.asarray(3.0)
        )
    )(keys)
    counts = np.bincount(np.asarray(idx)[:, :3].ravel(), minlength=3)
    freqs = counts / (reps * 3)
    np.testing.assert_allclose(freqs, [0.5, 0.3, 0.2], atol=0.05)


def test_metropolis_resampler_frequencies():
    # Murray (2012) Metropolis resampling: ancestor frequencies converge to
    # the weights as num_steps grows.
    from bayesssm_tpu.ops.resampling import metropolis_resample_indices

    w = jnp.array([0.1, 0.2, 0.3, 0.4])
    reps = 4000
    keys = jax.random.split(jax.random.key(17), reps)
    idx = jax.vmap(
        lambda k: metropolis_resample_indices(k, w, num_steps=64)
    )(keys)
    counts = np.bincount(np.asarray(idx).ravel(), minlength=4)
    np.testing.assert_allclose(counts / (reps * 4), np.asarray(w), atol=0.05)


def test_metropolis_masked_lanes_never_selected():
    # num_alive restricts both chain starts and proposals to alive lanes.
    from bayesssm_tpu.ops.resampling import metropolis_resample_indices

    w = jnp.array([0.25, 0.25, 0.25, 0.25, 0.0, 0.0, 0.0, 0.0])
    keys = jax.random.split(jax.random.key(3), 200)
    idx = jax.vmap(
        lambda k: metropolis_resample_indices(k, w, num_alive=4.0)
    )(keys)
    assert int(jnp.max(idx)) <= 3
    counts = np.bincount(np.asarray(idx).ravel(), minlength=8)
    np.testing.assert_allclose(
        counts[:4] / counts.sum(), [0.25] * 4, atol=0.05
    )


def test_metropolis_through_resample_indices():
    # resample_fn="metropolis" dispatches through the generic entry point.
    w = jnp.array([0.5, 0.3, 0.2])
    idx = resample_indices(jax.random.key(0), w, method="metropolis")
    assert idx.shape == (3,)
    assert int(jnp.max(idx)) <= 2


def test_metropolis_resampler_atom():
    from bayesssm_tpu.ops.resampling import metropolis_resample_indices

    w = jnp.array([0.0, 0.0, 1.0, 0.0])
    idx = metropolis_resample_indices(jax.random.key(0), w, num_steps=64)
    np.testing.assert_array_equal(np.asarray(idx), np.full(4, 2))


class TestWeightValidationContract:
    """Eager-mode weight validation mirroring the reference's error
    contract at both kernel and wrapper level
    (/root/reference/src/resampling.cpp:6-8,
    tests/testthat/test-resampling.R:2-28,71-134). Under jit the values
    are abstract and degenerate weights propagate branchlessly instead."""

    WRAPPERS = (resample_multinomial, resample_stratified, resample_systematic)

    @pytest.mark.parametrize("method", RESAMPLE_METHODS)
    def test_negative_weights_kernel_level(self, method):
        with pytest.raises(ValueError, match="Weights must be non-negative"):
            resample_indices(
                jax.random.key(0), jnp.array([-1.0, 1.0, 2.0]), method=method
            )

    @pytest.mark.parametrize("method", RESAMPLE_METHODS)
    def test_zero_sum_kernel_level(self, method):
        with pytest.raises(
            ValueError, match="Sum of weights must be greater than 0"
        ):
            resample_indices(
                jax.random.key(0), jnp.zeros(3), method=method
            )

    @pytest.mark.parametrize("wrapper", WRAPPERS)
    def test_negative_weights_wrapper_level(self, wrapper):
        particles = jnp.arange(3.0)
        with pytest.raises(ValueError, match="Weights must be non-negative"):
            wrapper(jax.random.key(0), particles, jnp.array([-0.1, 0.5, 0.4]))

    @pytest.mark.parametrize("wrapper", WRAPPERS)
    def test_zero_sum_wrapper_level(self, wrapper):
        particles = jnp.arange(3.0)
        with pytest.raises(
            ValueError, match="Sum of weights must be greater than 0"
        ):
            wrapper(jax.random.key(0), particles, jnp.zeros(3))

    def test_traced_weights_skip_validation(self):
        # Inside jit the same degenerate weights must NOT raise: the filter
        # handles degeneracy branchlessly (filters/core.py).
        @jax.jit
        def f(w):
            return resample_indices(jax.random.key(0), w, method="systematic")

        idx = f(jnp.zeros(4))
        assert idx.shape == (4,)
