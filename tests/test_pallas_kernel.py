"""Fused Pallas weight+resample kernel tests (interpreter mode on CPU).

The kernel must match the portable jnp path exactly in interpreter mode
(same float semantics); on real TPU hardware tiny boundary flips from
different cumsum rounding are tolerated (checked in the TPU bench).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesssm_tpu.ops.resampling_pallas import fused_weight_resample
from bayesssm_tpu.ops.weights import (
    effective_sample_size,
    normalize_log_weights,
)

N, D = 64, 2


def portable(lw, particles, pos, uniform, thr, always):
    w, lse, mx = normalize_log_weights(lw)
    cdf = jnp.cumsum(w)
    idx = jnp.clip(jnp.searchsorted(cdf, pos, side="left"), 0, N - 1)
    ess = effective_sample_size(w)
    do = True if always else ess < thr
    newp = jnp.where(do, particles[idx], particles)
    neww = jnp.where(do, uniform, w)
    return newp, neww, ess, mx + lse


@pytest.mark.parametrize("always", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_portable(always, seed):
    lw = jax.random.normal(jax.random.key(seed), (N,)) * 3
    particles = jax.random.normal(jax.random.key(seed + 10), (N, D))
    u = float(jax.random.uniform(jax.random.key(seed + 20), ()))
    pos = (jnp.arange(N) + u) / N
    uniform = jnp.full((N,), 1.0 / N)
    thr = 32.0
    got = fused_weight_resample(
        lw, particles, pos, uniform, thr, always_resample=always,
        interpret=True,
    )
    want = portable(lw, particles, pos, uniform, thr, always)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]), atol=1e-6)
    np.testing.assert_allclose(float(got[2]), float(want[2]), rtol=1e-5)
    np.testing.assert_allclose(float(got[3]), float(want[3]), rtol=1e-5)


def test_masked_lanes():
    # Masked lanes (-inf log-weight beyond num_alive) are never selected.
    alive = 40
    lw = jnp.where(jnp.arange(N) < alive,
                   jax.random.normal(jax.random.key(5), (N,)), -jnp.inf)
    particles = jnp.arange(N, dtype=jnp.float32)[:, None].repeat(D, 1)
    n_f = float(alive)
    pos = jnp.where(jnp.arange(N) < alive,
                    (jnp.arange(N) + 0.3) / n_f, 1.0)
    uniform = jnp.where(jnp.arange(N) < alive, 1.0 / n_f, 0.0)
    pout, wout, ess, lse = fused_weight_resample(
        lw, particles, pos, uniform, n_f / 2, always_resample=True,
        interpret=True,
    )
    assert (np.asarray(pout)[:alive, 0] < alive).all()
    assert float(ess) <= alive + 1e-3


def test_atom_degenerate():
    lw = jnp.full((N,), -jnp.inf).at[7].set(0.0)
    particles = jnp.arange(N, dtype=jnp.float32)[:, None].repeat(D, 1)
    pos = (jnp.arange(N) + 0.5) / N
    uniform = jnp.full((N,), 1.0 / N)
    pout, _, ess, _ = fused_weight_resample(
        lw, particles, pos, uniform, 1e9, always_resample=True,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(pout), 7.0)
    np.testing.assert_allclose(float(ess), 1.0, rtol=1e-5)
