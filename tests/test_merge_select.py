"""Exactness tests for the O(N log N) merge-based selection.

The merge network only COPIES values (never accumulates), so for any
(cdf, pos, v) input its output must be bit-identical to the direct
inverse-CDF definition ``v[m_k]``, ``m_k = #{j : cdf_j <= pos_k}`` —
pinned here against ``np.searchsorted(..., side='right')`` over random
weight profiles including zero-weight runs, exact ties, masked lanes,
and positions below ``cdf_0``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayesssm_tpu.ops.merge_select import (
    merge_select,
    resolve_carries,
    xla_roll,
)


def reference_select(cdf_ext, pos, v):
    """v[m_k] with m_k = #{j: cdf_j <= pos_k} (numpy ground truth)."""
    out = np.zeros_like(pos)
    for bi in range(cdf_ext.shape[0]):
        m = np.searchsorted(cdf_ext[bi], pos[bi], side="right")
        out[bi] = v[bi][m]
    return out


def run_merge(cdf_ext, pos, v):
    b, n = cdf_ext.shape
    lane = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    v_next = xla_roll(jnp.asarray(v), n - 1)
    v_carry = resolve_carries(jnp.asarray(cdf_ext), v_next, lane)
    v0 = jnp.asarray(v)[:, 0:1]
    return np.asarray(
        merge_select(
            jnp.asarray(cdf_ext), jnp.asarray(pos), v_carry, v0, lane
        )
    )


def make_case(rng, b, n, zero_runs=True, alive=None):
    w = rng.gamma(0.3, size=(b, n)).astype(np.float32)
    if zero_runs:
        # contiguous zero-weight runs -> equal-cdf ties
        for bi in range(b):
            k = rng.integers(0, n // 2)
            s = rng.integers(0, n - k) if k else 0
            w[bi, s:s + k] = 0.0
    alive_n = n if alive is None else alive
    w[:, alive_n:] = 0.0
    w = w / w.sum(axis=1, keepdims=True)
    cdf = np.cumsum(w, axis=1, dtype=np.float32)
    cdf = np.maximum.accumulate(cdf, axis=1)       # running max (kernel)
    lane = np.arange(n)
    cdf_ext = np.where(lane >= alive_n - 1, np.float32(1.5), cdf)
    u = rng.random((b, n), dtype=np.float32)
    pos = (lane + u) / np.float32(alive_n)
    pos = np.where(lane < alive_n, pos, np.float32(1.0)).astype(np.float32)
    v = rng.integers(0, 1 << 23, size=(b, n)).astype(np.float32)
    return cdf_ext, pos, v


@pytest.mark.parametrize("n", [8, 128, 256])
def test_matches_searchsorted_exactly(n):
    rng = np.random.default_rng(0)
    for trial in range(5):
        cdf_ext, pos, v = make_case(rng, 4, n)
        got = run_merge(cdf_ext, pos, v)
        want = reference_select(cdf_ext, pos, v)
        np.testing.assert_array_equal(got, want)


def test_masked_lanes():
    rng = np.random.default_rng(1)
    n = 64
    cdf_ext, pos, v = make_case(rng, 3, n, alive=40)
    got = run_merge(cdf_ext, pos, v)
    want = reference_select(cdf_ext, pos, v)
    np.testing.assert_array_equal(got, want)
    # masked slots resolve inside the alive range
    sel_lanes = np.searchsorted(cdf_ext[0], pos[0], side="right")
    assert sel_lanes.max() <= 39


def test_exact_ties_select_past_the_tie():
    # pos EXACTLY equal to a cdf value: cdf_j <= pos counts it.
    cdf = np.array([[0.25, 0.5, 0.75, 1.5]], dtype=np.float32)
    pos = np.array([[0.25, 0.5, 0.5, 0.9]], dtype=np.float32)
    v = np.array([[10.0, 20.0, 30.0, 40.0]], dtype=np.float32)
    got = run_merge(cdf, pos, v)
    np.testing.assert_array_equal(got, [[20.0, 30.0, 30.0, 40.0]])


def test_positions_below_first_bucket():
    cdf = np.array([[0.9, 0.95, 1.5, 1.5]], dtype=np.float32)
    pos = np.array([[0.01, 0.2, 0.5, 0.91]], dtype=np.float32)
    v = np.array([[7.0, 8.0, 9.0, 11.0]], dtype=np.float32)
    got = run_merge(cdf, pos, v)
    np.testing.assert_array_equal(got, [[7.0, 7.0, 7.0, 8.0]])


def test_degenerate_single_alive():
    # alive = 1: whole cdf pinned; every slot selects v[0].
    cdf = np.full((2, 8), 1.5, dtype=np.float32)
    pos = np.tile(
        np.linspace(0.0, 1.0, 8, dtype=np.float32), (2, 1)
    )
    v = np.tile(np.arange(8, dtype=np.float32), (2, 1)) + 5.0
    got = run_merge(cdf, pos, v)
    np.testing.assert_array_equal(got, np.tile(v[:, 0:1], (1, 8)))


class TestNonPowerOfTwo:
    """The merge network is pow2-only (XOR partners); composite lane
    counts like 384 — valid under a bare multiple-of-128 check and
    reachable via PMMH's tuned particle bound before round 5 — must
    route to the quadratic selection or be rejected, never silently
    produce wrong ancestors (round-4 advisor finding, high severity)."""

    N = 384  # multiple of 128, <= 1024, NOT a power of two

    def test_explicit_merge_rejected_positions_variant(self):
        from bayesssm_tpu.ops.resampling_pallas import fused_weight_resample

        n = self.N
        lw = jnp.zeros((n,), jnp.float32)
        pts = jnp.zeros((n, 1), jnp.float32)
        pos = jnp.linspace(0.0, 0.99, n).astype(jnp.float32)
        uw = jnp.full((n,), 1.0 / n, jnp.float32)
        with pytest.raises(ValueError, match="power-of-two"):
            fused_weight_resample(
                lw, pts, pos, uw, jnp.float32(n / 2),
                interpret=True, selection="merge",
            )

    def test_explicit_merge_rejected_seeded_variant(self):
        from bayesssm_tpu.ops.resampling_pallas import (
            fused_weight_resample_seeded,
        )

        n = self.N
        lw = jnp.zeros((n,), jnp.float32)
        pts = jnp.zeros((n, 1), jnp.float32)
        uw = jnp.full((n,), 1.0 / n, jnp.float32)
        with pytest.raises(ValueError, match="power-of-two"):
            fused_weight_resample_seeded(
                lw, pts, jax.random.key(0), jnp.float32(n), uw,
                jnp.float32(n / 2), interpret=True, selection="merge",
            )

    def test_auto_matches_portable_bitwise(self):
        # End-to-end through the filter core in the strict host-positions
        # parity mode: at N=384 the auto selection must fall back to the
        # quadratic masked-reduce and reproduce the portable path (the
        # pre-fix merge routing returned ~383/384 wrong ancestors here).
        from bayesssm_tpu.filters.core import particle_filter_core

        rng = np.random.default_rng(11)
        ys = rng.normal(size=8).astype(np.float32)
        key = jax.random.key(5)
        def init_fn(key, num_particles):
            return jax.random.normal(key, (num_particles,))

        def transition_fn(key, particles, t):
            return 0.9 * particles + 0.5 * jax.random.normal(
                key, particles.shape
            )

        def weight_fn(y, particles, t):
            return -0.5 * ((y - particles) / 0.4) ** 2

        kw = dict(
            init_fn=init_fn, transition_fn=transition_fn,
            weight_fn=weight_fn, resample_fn="stratified",
        )
        fused = particle_filter_core(
            key, ys, self.N, use_fused="interpret", **kw
        )
        portable = particle_filter_core(
            key, ys, self.N, use_fused=False, **kw
        )
        np.testing.assert_allclose(
            np.asarray(fused.loglike), np.asarray(portable.loglike),
            rtol=2e-5, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(fused.state_est), np.asarray(portable.state_est),
            rtol=1e-4, atol=5e-4,
        )

    def test_sweep_builder_rejects_composite_lanes(self):
        from bayesssm_tpu.ops.sweep_builder import build_sweep_op

        op = build_sweep_op(
            num_state_cols=1,
            init_fn=lambda rng, theta: (rng.normal(),),
            transition_fn=lambda rng, cols, theta, t: (cols[0],),
            log_weight_fn=lambda cols, theta, y_t: -0.5 * cols[0] ** 2,
            num_params=1,
            interpret=True,
        )
        with pytest.raises(ValueError, match="power of two"):
            op(
                jax.random.key(0), np.zeros(4, np.float32),
                np.ones(1, np.float32), self.N,
            )

    def test_sir_sweep_explicit_merge_rejected(self):
        from bayesssm_tpu.ops.sir_sweep_pallas import sir_filter_sweep

        with pytest.raises(ValueError, match="power.of.two"):
            sir_filter_sweep(
                jax.random.key(0), np.array([3.0, 2.0], np.float32),
                self.N, 0.5, 0.2, 100.0, 2.0,
                selection="merge", interpret=True,
            )

    def test_pmmh_lane_bound_is_pow2(self):
        from bayesssm_tpu.pmmh.driver import _particle_lane_bound

        assert _particle_lane_bound(50) == 128
        assert _particle_lane_bound(128) == 128
        assert _particle_lane_bound(129) == 256
        assert _particle_lane_bound(300) == 512   # was 384 pre-fix
        assert _particle_lane_bound(513) == 1024
        assert _particle_lane_bound(1000) == 1024  # Q10 clamp max


def test_zero_weight_prefix_run():
    # equal-cdf run at the very start (zero-weight prefix).
    w = np.array([[0.0, 0.0, 0.0, 0.5, 0.5, 0.0, 0.0, 0.0]], np.float32)
    cdf = np.maximum.accumulate(np.cumsum(w, axis=1), axis=1)
    lane = np.arange(8)
    cdf_ext = np.where(lane >= 4, np.float32(1.5), cdf).astype(np.float32)
    pos = np.array(
        [[0.1, 0.2, 0.49, 0.5, 0.51, 0.9, 0.99, 1.0]], np.float32
    )
    v = np.arange(8, dtype=np.float32)[None] * 3.0
    got = run_merge(cdf_ext, pos, v)
    want = reference_select(cdf_ext, pos, v)
    np.testing.assert_array_equal(got, want)
