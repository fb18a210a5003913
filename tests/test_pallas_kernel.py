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


def test_every_position_selects_exactly_one_ancestor():
    # Regression (round-3 ADVICE): bucket lower edges must come from the
    # Hillis-Steele scan itself, not cdf - w. An f32 recomputation is ~1 ULP
    # off on ~half the lanes, leaving gaps (a position matches NO lane ->
    # masked-sum fabricates 0) and overlaps (TWO lanes -> doubled sum).
    # Particle values 3*i + 7 are ≡ 1 (mod 3); a fabricated zero is ≡ 0 and
    # any two-lane sum is ≡ 2, so "≡ 1 and in the input set" discriminates.
    n, chains = 1024, 16
    key = jax.random.key(42)
    lw = jax.random.normal(jax.random.key(1), (chains, n)) * 5
    vals = (3.0 * jnp.arange(n) + 7.0).astype(jnp.float32)
    particles = jnp.broadcast_to(vals[None, :, None], (chains, n, 1))
    u = jax.random.uniform(key, (chains, n))
    pos = (jnp.arange(n)[None] + u) / n
    uniform = jnp.full((chains, n), 1.0 / n)
    pout, _, _, _ = jax.vmap(
        lambda l, p, q, w: fused_weight_resample(
            l, p, q, w, 0.0, always_resample=True, interpret=True
        )
    )(lw, particles, pos, uniform)
    out = np.asarray(pout)[..., 0]
    assert np.isin(out, np.asarray(vals)).all(), (
        "resampled values outside the input set: gap/overlap in CDF buckets"
    )


def test_overshoot_lands_on_last_alive_lane():
    # Positions at/above the f32 CDF total must land on the last ALIVE
    # lane (the portable path's clip-to-last-alive), never on a masked lane.
    alive = 40
    lanes = jnp.arange(N)
    lw = jnp.where(lanes < alive, -0.5 * lanes.astype(jnp.float32), -jnp.inf)
    particles = lanes.astype(jnp.float32)[:, None].repeat(D, 1)
    n_f = float(alive)
    # Queries at 1.0 may legitimately resolve inside the CDF (f32 cumsum
    # can reach 1.0 early) but must NEVER select a masked lane; queries
    # strictly above any possible total must clamp to the last alive lane.
    pos_edge = jnp.ones((N,), jnp.float32)
    pos_over = jnp.full((N,), 1.5, jnp.float32)
    uniform = jnp.where(lanes < alive, 1.0 / n_f, 0.0)
    pout_edge, _, _, _ = fused_weight_resample(
        lw, particles, pos_edge, uniform, n_f / 2, always_resample=True,
        interpret=True,
    )
    assert (np.asarray(pout_edge)[:alive, 0] < alive).all()
    pout_over, _, _, _ = fused_weight_resample(
        lw, particles, pos_over, uniform, n_f / 2, always_resample=True,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(pout_over)[:alive, 0], alive - 1)
