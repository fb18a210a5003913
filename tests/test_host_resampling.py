"""Native (C++) host resampling tests.

Same statistical/structural contracts as the device kernels
(test_resampling.py), mirrored from the reference's C++-level tests
(/root/reference/tests/testthat/test-resampling.R:2-68).
"""

import numpy as np
import pytest

from bayesssm_tpu.ops.host_resampling import (
    host_resample_multinomial,
    host_resample_stratified,
    host_resample_systematic,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)

FNS = {
    "multinomial": host_resample_multinomial,
    "stratified": host_resample_stratified,
    "systematic": host_resample_systematic,
}


@pytest.mark.parametrize("method", list(FNS))
def test_frequencies(method):
    w = np.array([0.1, 0.2, 0.3, 0.2, 0.2])
    rng = np.random.default_rng(1405)
    counts = np.zeros(5)
    reps = 10_000
    for _ in range(reps):
        idx = FNS[method](w, rng)
        counts += np.bincount(idx, minlength=5)
    np.testing.assert_allclose(counts / (reps * 5), w, atol=0.05)


def test_stratified_structure():
    # test-resampling.R:48-55 (0-based): samples 2 and 3 always index 1.
    w = np.array([0.1, 0.5, 0.1, 0.15, 0.15])
    rng = np.random.default_rng(0)
    for _ in range(100):
        idx = host_resample_stratified(w, rng)
        assert idx[1] == 1 and idx[2] == 1


def test_systematic_coupling():
    w = np.array([0.1, 0.5, 0.1, 0.15, 0.15])
    rng = np.random.default_rng(1)
    for _ in range(100):
        idx = host_resample_systematic(w, rng)
        assert idx[1] == 1 and idx[2] == 1
        if idx[0] == 0:
            assert idx[3] == 2
        elif idx[0] == 1:
            assert idx[3] == 3


@pytest.mark.parametrize("method", list(FNS))
def test_degenerate_atom(method):
    w = np.array([0.0, 0.0, 1.0, 0.0])
    idx = FNS[method](w, np.random.default_rng(2))
    np.testing.assert_array_equal(idx, np.full(4, 2))


@pytest.mark.parametrize("method", list(FNS))
def test_negative_weight_error(method):
    with pytest.raises(ValueError, match="non-negative"):
        FNS[method](np.array([0.5, -0.1, 0.6]), np.random.default_rng(0))


@pytest.mark.parametrize("method", list(FNS))
def test_zero_sum_error(method):
    with pytest.raises(ValueError, match="positive sum"):
        FNS[method](np.zeros(4), np.random.default_rng(0))


def test_matches_device_distribution():
    # Device (jnp) and native (C++) systematic resampling agree on
    # ancestor-count distributions for the same weights.
    import jax
    import jax.numpy as jnp

    from bayesssm_tpu.ops.resampling import resample_indices

    w = np.array([0.05, 0.25, 0.4, 0.2, 0.1])
    rng = np.random.default_rng(7)
    reps = 4000
    counts_native = np.zeros(5)
    for _ in range(reps):
        counts_native += np.bincount(
            host_resample_systematic(w, rng), minlength=5
        )
    keys = jax.random.split(jax.random.key(0), reps)
    idx_dev = jax.vmap(
        lambda k: resample_indices(k, jnp.asarray(w, jnp.float32), "systematic")
    )(keys)
    counts_dev = np.bincount(np.asarray(idx_dev).ravel(), minlength=5)
    np.testing.assert_allclose(
        counts_native / (reps * 5), counts_dev / (reps * 5), atol=0.02
    )
