"""Fused-vs-portable equivalence of the filter core's Pallas branches.

The fused Pallas weight+resample path and the portable jnp path consume the
SAME inverse-CDF query positions (ops/resampling.py::_positions is computed
outside the kernel), so for a fixed PRNG key the two paths select identical
ancestors up to float32 CDF rounding at exact stratum boundaries. These
tests force the fused path through the Pallas interpreter
(``use_fused="interpret"``) so every fused branch in filters/core.py —
including APF's aux-column resample (the reference's lookahead step,
/root/reference/R/particle_filter_core.R:139-175) and RMPF's
always-resample path — executes in CPU CI, closing the gap where CI never
ran core.py's fused code (the ``interpret=False`` hard-coding flagged in
round 1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesssm_tpu.filters.core import particle_filter_core

A, C, SX, SY = 0.9, 1.0, 0.6, 0.4
N = 128  # fused path requires 128-aligned lanes


def lgss_init(key, num_particles):
    return jax.random.normal(key, (num_particles,))


def lgss_transition(key, particles, t):
    return A * particles + SX * jax.random.normal(key, particles.shape)


def lgss_loglik(y, particles, t):
    return -0.5 * (jnp.log(2 * jnp.pi * SY**2) + ((y - C * particles) / SY) ** 2)


def lgss_move(key, particles, y, t):
    # MH rejuvenation targeting the observation density (independence move).
    prop = particles + 0.3 * jax.random.normal(key, particles.shape)
    logr = lgss_loglik(y, prop, t) - lgss_loglik(y, particles, t)
    accept = jnp.log(jax.random.uniform(key, particles.shape)) < logr
    return jnp.where(accept, prop, particles)


def lgss_init2d(key, num_particles):
    return jax.random.normal(key, (num_particles, 2))


def lgss_transition2d(key, particles, t):
    return A * particles + SX * jax.random.normal(key, particles.shape)


def lgss_loglik2d(y, particles, t):
    return -0.5 * (
        jnp.log(2 * jnp.pi * SY**2) + ((y - C * particles[:, 0]) / SY) ** 2
    )


def simulate(seed, T=12):
    rng = np.random.default_rng(seed)
    x = rng.normal()
    ys = []
    for _ in range(T):
        x = A * x + SX * rng.normal()
        ys.append(C * x + SY * rng.normal())
    return np.array(ys, dtype=np.float32)


@pytest.fixture(scope="module")
def ys():
    return simulate(1405)


def run_pair(ys, **kw):
    """Run the same filter with the fused (interpret) and portable paths."""
    key = jax.random.key(7)
    fused = particle_filter_core(key, ys, N, use_fused="interpret", **kw)
    portable = particle_filter_core(key, ys, N, use_fused=False, **kw)
    return fused, portable


def assert_equivalent(fused, portable, atol=2e-4):
    np.testing.assert_allclose(
        np.asarray(fused.loglike), np.asarray(portable.loglike),
        rtol=2e-5, atol=atol,
    )
    np.testing.assert_allclose(
        np.asarray(fused.loglike_history),
        np.asarray(portable.loglike_history),
        rtol=2e-5, atol=atol,
    )
    np.testing.assert_allclose(
        np.asarray(fused.state_est), np.asarray(portable.state_est),
        rtol=1e-4, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(fused.ess), np.asarray(portable.ess),
        rtol=1e-4, atol=5e-3,
    )


BPF_KW = dict(
    init_fn=lgss_init, transition_fn=lgss_transition, weight_fn=lgss_loglik,
)


class TestFusedEquivalence:
    @pytest.mark.parametrize("resample_algorithm", ["SISR", "SISAR"])
    @pytest.mark.parametrize("resample_fn", ["stratified", "systematic"])
    def test_bpf(self, ys, resample_algorithm, resample_fn):
        fused, portable = run_pair(
            ys, algorithm="BPF", resample_algorithm=resample_algorithm,
            resample_fn=resample_fn, **BPF_KW,
        )
        assert_equivalent(fused, portable)

    def test_apf_aux_column_branch(self, ys):
        # Exercises the fused aux-resample (core.py's aux-column trick):
        # the aux log-weights ride the kernel's gather as an extra state
        # column and must come back attached to the selected ancestors.
        fused, portable = run_pair(
            ys, algorithm="APF", aux_weight_fn=lgss_loglik, **BPF_KW,
        )
        assert_equivalent(fused, portable)

    def test_apf_carry_weights(self, ys):
        fused, portable = run_pair(
            ys, algorithm="APF", aux_weight_fn=lgss_loglik,
            carry_weights=True, **BPF_KW,
        )
        assert_equivalent(fused, portable)

    def test_rmpf(self, ys):
        fused, portable = run_pair(
            ys, algorithm="RMPF", move_fn=lgss_move,
            resample_algorithm="SISR", **BPF_KW,
        )
        assert_equivalent(fused, portable)

    def test_bpf_multidim_state(self, ys):
        fused, portable = run_pair(
            ys, algorithm="BPF",
            init_fn=lgss_init2d, transition_fn=lgss_transition2d,
            weight_fn=lgss_loglik2d,
        )
        assert_equivalent(fused, portable)

    def test_masked_particles(self, ys):
        # Traced num_particles below the static bound: masked lanes carry
        # -inf weight and must never be selected by either path.
        key = jax.random.key(3)

        def run(use_fused):
            return particle_filter_core(
                key, ys, jnp.asarray(96), max_particles=N,
                use_fused=use_fused, **BPF_KW,
            )

        assert_equivalent(run("interpret"), run(False))

    def test_carry_weights_bpf(self, ys):
        fused, portable = run_pair(ys, carry_weights=True, **BPF_KW)
        assert_equivalent(fused, portable)


class TestInKernelPositions:
    """The "auto"/"interpret-inkernel" mode draws stratum positions inside
    the kernel (no host threefry in the hot loop). The bit-stream differs
    from the portable path, so parity is distributional + structural."""

    def test_deterministic_per_key(self, ys):
        key = jax.random.key(9)
        r1 = particle_filter_core(
            key, ys, N, use_fused="interpret-inkernel", **BPF_KW
        )
        r2 = particle_filter_core(
            key, ys, N, use_fused="interpret-inkernel", **BPF_KW
        )
        np.testing.assert_array_equal(
            np.asarray(r1.loglike), np.asarray(r2.loglike)
        )
        np.testing.assert_array_equal(
            np.asarray(r1.state_est), np.asarray(r2.state_est)
        )

    def test_distributional_match_vs_portable(self, ys):
        # Mean log-likelihood over independent chains agrees with the
        # portable path within Monte-Carlo error (unbiased estimator on
        # both paths).
        keys = jax.random.split(jax.random.key(0), 48)

        def batch(use_fused):
            return jax.vmap(
                lambda k: particle_filter_core(
                    k, ys, N, use_fused=use_fused,
                    return_particles=False, **BPF_KW
                ).loglike
            )(keys)

        ll_seeded = np.asarray(batch("interpret-inkernel"))
        ll_port = np.asarray(batch(False))
        assert np.isfinite(ll_seeded).all()
        se = ll_port.std() / np.sqrt(len(keys))
        assert abs(ll_seeded.mean() - ll_port.mean()) < 5 * se + 0.5

    def test_masked_lanes_never_selected(self, ys):
        # Ancestors must come from the alive range only; the in-kernel
        # positions must reproduce the dead-lane pin-to-1.0 semantics.
        alive = 96

        def init_tagged(key, num_particles):
            return jnp.arange(num_particles, dtype=jnp.float32)

        def trans_id(key, particles, t):
            return particles

        def loglik_flat(y, particles, t):
            return jnp.zeros_like(particles)

        res = particle_filter_core(
            jax.random.key(4), ys[:3], jnp.asarray(alive),
            init_tagged, trans_id, loglik_flat,
            max_particles=N, use_fused="interpret-inkernel",
            resample_algorithm="SISR",
        )
        hist = np.asarray(res.particles_history)
        w = np.asarray(res.weights_history)
        # every particle with positive weight is a tag < alive
        assert (hist[w > 0] < alive).all()

    def test_chains_decorrelated(self, ys):
        # Two different keys must produce different resampling streams
        # (per-chain seed words are XOR-mixed into the kernel's bits).
        r1 = particle_filter_core(
            jax.random.key(1), ys, N, use_fused="interpret-inkernel",
            **BPF_KW
        )
        r2 = particle_filter_core(
            jax.random.key(2), ys, N, use_fused="interpret-inkernel",
            **BPF_KW
        )
        assert float(r1.loglike) != float(r2.loglike)
