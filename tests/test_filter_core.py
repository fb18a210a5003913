"""Filter-core engine tests.

Mirrors the reference's structural/error contracts
(/root/reference/tests/testthat/test-particle_filter_core.R,
test-bootstrap_filter.R) plus a linear-Gaussian vs Kalman exactness check
the reference lacks (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesssm_tpu.filters.bootstrap import bootstrap_filter
from bayesssm_tpu.filters.core import particle_filter_core
from bayesssm_tpu.utils.kalman import kalman_loglik

A, C, SX, SY = 0.9, 1.0, 0.6, 0.4


def lgss_init(key, num_particles):
    return jax.random.normal(key, (num_particles,))


def lgss_transition(key, particles, t):
    return A * particles + SX * jax.random.normal(key, particles.shape)


def lgss_loglik(y, particles, t):
    return -0.5 * (jnp.log(2 * jnp.pi * SY**2) + ((y - C * particles) / SY) ** 2)


def simulate_lgss(seed, T=25):
    rng = np.random.default_rng(seed)
    x = rng.normal()
    ys = []
    for _ in range(T):
        x = A * x + SX * rng.normal()
        ys.append(C * x + SY * rng.normal())
    return np.array(ys)


@pytest.fixture(scope="module")
def lgss_data():
    return simulate_lgss(1405)


def run_bpf(key, y, n=1000, **kw):
    return bootstrap_filter(
        key, y, n, lgss_init, lgss_transition, lgss_loglik, **kw
    )


class TestShapes:
    def test_output_contract(self, lgss_data):
        T = len(lgss_data)
        res = run_bpf(jax.random.key(0), lgss_data, n=128)
        assert res.state_est.shape == (T + 1,)
        assert res.ess.shape == (T + 1,)
        assert res.loglike.shape == ()
        assert res.loglike_history.shape == (T,)
        assert res.particles_history.shape == (T + 1, 128)
        assert res.weights_history.shape == (T + 1, 128)
        assert res.algorithm == "BPF"
        assert res.resample_algorithm == "SISAR"
        # Q4: ESS at t=0 equals num_particles.
        assert float(res.ess[0]) == 128.0
        # ESS is bounded by num_particles.
        assert np.asarray(res.ess).max() <= 128.0 + 1e-3
        # Q3: loglike_history is cumulative — final entry equals loglike.
        np.testing.assert_allclose(
            float(res.loglike_history[-1]), float(res.loglike), rtol=1e-6
        )
        # weights sum to one at every step
        np.testing.assert_allclose(
            np.asarray(res.weights_history).sum(-1), 1.0, atol=1e-5
        )

    def test_no_history(self, lgss_data):
        res = run_bpf(jax.random.key(0), lgss_data, n=64, return_particles=False)
        assert res.particles_history is None
        assert res.weights_history is None

    def test_sisr_records_full_ess(self, lgss_data):
        res = run_bpf(jax.random.key(1), lgss_data, n=64,
                      resample_algorithm="SISR")
        np.testing.assert_allclose(np.asarray(res.ess), 64.0)

    def test_sis_never_resamples(self, lgss_data):
        # Under SIS the recorded ESS is never reset to n after t=0 (with
        # continuous weights, hitting exactly n has probability ~0).
        res = run_bpf(jax.random.key(2), lgss_data, n=256,
                      resample_algorithm="SIS")
        assert (np.asarray(res.ess[1:]) < 256.0).all()

    def test_reproducible(self, lgss_data):
        r1 = run_bpf(jax.random.key(7), lgss_data, n=64)
        r2 = run_bpf(jax.random.key(7), lgss_data, n=64)
        np.testing.assert_array_equal(
            np.asarray(r1.state_est), np.asarray(r2.state_est)
        )
        assert float(r1.loglike) == float(r2.loglike)


class TestKalmanParity:
    def test_loglik_matches_kalman_sisr(self, lgss_data):
        # With resampling at every step the estimator is the standard
        # unbiased bootstrap estimator; N=4096 makes bias and MC error tiny.
        truth = kalman_loglik(lgss_data, A, C, SX, SY, m0=0.0, p0=1.0)
        keys = jax.random.split(jax.random.key(3), 24)
        f = jax.jit(
            jax.vmap(
                lambda k: bootstrap_filter(
                    k, lgss_data, 4096, lgss_init, lgss_transition,
                    lgss_loglik, resample_algorithm="SISR",
                    return_particles=False,
                ).loglike
            )
        )
        lls = np.asarray(f(keys), dtype=np.float64)
        assert abs(lls.mean() - truth) < 0.15
        assert lls.std() < 0.3

    def test_loglik_matches_kalman_sisar_carry_weights(self, lgss_data):
        # The reference's SISAR discards carried weights and is biased
        # (core.py module docstring); carry_weights=True restores the
        # textbook-correct adaptive-resampling estimator.
        from bayesssm_tpu.filters.core import particle_filter_core

        truth = kalman_loglik(lgss_data, A, C, SX, SY)
        keys = jax.random.split(jax.random.key(12), 24)
        f = jax.jit(
            jax.vmap(
                lambda k: particle_filter_core(
                    k, lgss_data, 4096, lgss_init, lgss_transition,
                    lgss_loglik, resample_algorithm="SISAR",
                    carry_weights=True, return_particles=False,
                ).loglike
            )
        )
        lls = np.asarray(f(keys), dtype=np.float64)
        assert abs(lls.mean() - truth) < 0.15

    def test_reference_sisar_bias_direction(self, lgss_data):
        # Document the replicated quirk: fresh-weight SISAR underestimates.
        truth = kalman_loglik(lgss_data, A, C, SX, SY)
        keys = jax.random.split(jax.random.key(13), 8)
        f = jax.jit(
            jax.vmap(
                lambda k: bootstrap_filter(
                    k, lgss_data, 1024, lgss_init, lgss_transition,
                    lgss_loglik, return_particles=False,
                ).loglike
            )
        )
        lls = np.asarray(f(keys), dtype=np.float64)
        assert lls.mean() < truth

    @pytest.mark.parametrize(
        "method", ["stratified", "systematic", "multinomial", "metropolis"]
    )
    def test_all_resamplers_consistent(self, lgss_data, method):
        # "metropolis" (Murray 2012) is the repo's extra sort-free method,
        # reachable through the core since round 4; default num_steps must
        # keep the likelihood estimator unbiased at this scale.
        truth = kalman_loglik(lgss_data, A, C, SX, SY)
        keys = jax.random.split(jax.random.key(4), 8)
        f = jax.jit(
            jax.vmap(
                lambda k: bootstrap_filter(
                    k, lgss_data, 2048, lgss_init, lgss_transition,
                    lgss_loglik, resample_fn=method,
                    resample_algorithm="SISR", return_particles=False,
                ).loglike
            )
        )
        lls = np.asarray(f(keys), dtype=np.float64)
        assert abs(lls.mean() - truth) < 0.3


class TestStateEstimation:
    def test_rmse_under_half(self):
        # test-bootstrap_filter.R:149-207 — filtered state tracks the truth.
        rng = np.random.default_rng(42)
        T = 30
        x = np.zeros(T + 1)
        y = np.zeros(T)
        x[0] = rng.normal()
        for t in range(T):
            x[t + 1] = 0.8 * x[t] + np.sin(x[t]) + 0.5 * rng.normal()
            y[t] = x[t + 1] + 0.3 * rng.normal()

        def init_fn(key, num_particles):
            return jax.random.normal(key, (num_particles,))

        def transition_fn(key, particles):
            return (
                0.8 * particles
                + jnp.sin(particles)
                + 0.5 * jax.random.normal(key, particles.shape)
            )

        def loglik_fn(y, particles):
            return -0.5 * (jnp.log(2 * jnp.pi * 0.09) + ((y - particles) / 0.3) ** 2)

        res = bootstrap_filter(
            jax.random.key(5), y, 1024, init_fn, transition_fn, loglik_fn
        )
        rmse = np.sqrt(np.mean((np.asarray(res.state_est[1:]) - x[1:]) ** 2))
        assert rmse < 0.5


class TestGapsAndMasking:
    def test_obs_times_gaps(self):
        # Missing observation at t=4: particles must be propagated through
        # the gap (R/particle_filter_core.R:122-137).
        y_full = simulate_lgss(99, T=10)
        obs_times = [1, 2, 3, 5, 6, 7, 8, 9, 10]
        y_obs = y_full[np.array(obs_times) - 1]
        res = run_bpf(jax.random.key(6), y_obs, n=512, obs_times=obs_times)
        assert res.state_est.shape == (10,)
        truth = kalman_loglik(y_full, A, C, SX, SY)
        # Not equal to the full-data loglik, but in a sane range.
        assert np.isfinite(float(res.loglike))
        assert float(res.loglike) > truth - 20

    def test_masked_equals_static(self, lgss_data):
        rs = run_bpf(jax.random.key(8), lgss_data, n=128)
        rm = bootstrap_filter(
            jax.random.key(8), lgss_data, jnp.asarray(128), lgss_init,
            lgss_transition, lgss_loglik, max_particles=128,
        )
        np.testing.assert_allclose(
            np.asarray(rs.state_est), np.asarray(rm.state_est), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(rs.loglike), float(rm.loglike), rtol=1e-5
        )

    def test_masked_loglik_unbiased(self, lgss_data):
        # A filter with 300 alive lanes inside a 512-lane buffer must match
        # the Kalman truth like a plain 300-particle filter does.
        truth = kalman_loglik(lgss_data, A, C, SX, SY)
        keys = jax.random.split(jax.random.key(9), 16)
        f = jax.jit(
            jax.vmap(
                lambda k: bootstrap_filter(
                    k, lgss_data, jnp.asarray(300), lgss_init,
                    lgss_transition, lgss_loglik, max_particles=512,
                    resample_algorithm="SISR", return_particles=False,
                ).loglike
            )
        )
        lls = np.asarray(f(keys), dtype=np.float64)
        assert abs(lls.mean() - truth) < 0.5


class TestMultivariateObservations:
    """Matrix-y (d_y > 1) through the core, against an exact multivariate
    Kalman filter — the reference feeds ``y[i, ]`` rows the same way
    (/root/reference/R/particle_filter_core.R:176-183)."""

    def test_loglik_matches_multivariate_kalman(self):
        from bayesssm_tpu.models.lgss import lgss_mv_model, simulate_lgss_mv
        from bayesssm_tpu.utils.kalman import kalman_loglik_mv

        c_vec = (1.0, 0.5)
        _, y = simulate_lgss_mv(7, t_val=20, c_vec=c_vec)
        assert y.shape == (20, 2)
        (init_fn, trans_fn, loglik_fn), _, _ = lgss_mv_model(c_vec=c_vec)
        truth = kalman_loglik_mv(y, A, c_vec, SX, (SY, SY), p0=1.0)
        theta = {"a": A, "sigma_x": SX, "sigma_y": SY}
        keys = jax.random.split(jax.random.key(3), 24)
        f = jax.jit(
            jax.vmap(
                lambda k: bootstrap_filter(
                    k, y, 4096, init_fn, trans_fn, loglik_fn, theta=theta,
                    resample_algorithm="SISR", return_particles=False,
                ).loglike
            )
        )
        lls = np.asarray(f(keys), dtype=np.float64)
        assert abs(lls.mean() - truth) < 0.2, (lls.mean(), truth)

    def test_matrix_y_output_contract(self):
        from bayesssm_tpu.models.lgss import lgss_mv_model, simulate_lgss_mv

        _, y = simulate_lgss_mv(9, t_val=6)
        (init_fn, trans_fn, loglik_fn), _, _ = lgss_mv_model()
        res = bootstrap_filter(
            jax.random.key(0), y, 128, init_fn, trans_fn, loglik_fn,
            theta={"a": A, "sigma_x": SX, "sigma_y": SY},
        )
        assert res.state_est.shape == (7,)
        assert res.particles_history.shape == (7, 128)
        assert np.isfinite(float(res.loglike))

    def test_matrix_y_through_pmmh(self):
        from bayesssm_tpu import default_tune_control, pmmh
        from bayesssm_tpu.models.lgss import lgss_mv_model, simulate_lgss_mv

        _, y = simulate_lgss_mv(11, t_val=8)
        fns, log_priors, transform = lgss_mv_model()
        out = pmmh(
            "bootstrap_filter", y, 20, fns[0], fns[1], fns[2], log_priors,
            pilot_init_params={"a": 0.8, "sigma_x": 0.5, "sigma_y": 0.5},
            burn_in=5, num_chains=2, param_transform=transform, seed=3,
            tune_control=default_tune_control(
                pilot_m=20, pilot_burn_in=5, pilot_reps=3
            ),
            print_summary=False,
        )
        for p, chain in out.theta_chain.items():
            assert chain.shape == (2, 15), (p, chain.shape)
            assert np.isfinite(chain).all(), p


class TestDegenerateWeights:
    def test_all_degenerate_returns_neg_inf(self, lgss_data):
        def bad_loglik(y, particles):
            return jnp.full(particles.shape[0], -1e9)

        res = bootstrap_filter(
            jax.random.key(0), lgss_data, 64, lgss_init, lgss_transition,
            bad_loglik,
        )
        assert np.isneginf(float(res.loglike))
        assert np.isneginf(float(res.loglike_history[0]))


class TestErrors:
    def test_apf_requires_aux(self, lgss_data):
        with pytest.raises(ValueError, match="APF requires aux_weight_fn"):
            particle_filter_core(
                jax.random.key(0), lgss_data, 8, lgss_init, lgss_transition,
                lgss_loglik, algorithm="APF",
            )

    def test_rmpf_requires_move(self, lgss_data):
        with pytest.raises(ValueError, match="RMPF requires a move_fn"):
            particle_filter_core(
                jax.random.key(0), lgss_data, 8, lgss_init, lgss_transition,
                lgss_loglik, algorithm="RMPF",
            )

    def test_bad_algorithm(self, lgss_data):
        with pytest.raises(ValueError, match="algorithm must be one of"):
            particle_filter_core(
                jax.random.key(0), lgss_data, 8, lgss_init, lgss_transition,
                lgss_loglik, algorithm="XXX",
            )

    def test_bad_resample_algorithm(self, lgss_data):
        with pytest.raises(ValueError, match="resample_algorithm must be"):
            run_bpf(jax.random.key(0), lgss_data, n=8, resample_algorithm="XX")

    def test_init_missing_num_particles(self, lgss_data):
        with pytest.raises(ValueError, match="init_fn does not contain"):
            bootstrap_filter(
                jax.random.key(0), lgss_data, 8,
                lambda key: jnp.zeros(8), lgss_transition, lgss_loglik,
            )

    def test_init_wrong_count(self, lgss_data):
        with pytest.raises(ValueError, match="init_fn must return num_particles"):
            bootstrap_filter(
                jax.random.key(0), lgss_data, 8,
                lambda key, num_particles: jnp.zeros(4),
                lgss_transition, lgss_loglik,
            )

    def test_transition_wrong_count(self, lgss_data):
        with pytest.raises(ValueError, match="transition_fn must return"):
            bootstrap_filter(
                jax.random.key(0), lgss_data, 8, lgss_init,
                lambda key, particles: particles[:4], lgss_loglik,
            )

    def test_bad_obs_times(self, lgss_data):
        with pytest.raises(ValueError, match="strictly increasing"):
            run_bpf(jax.random.key(0), lgss_data, n=8,
                    obs_times=list(range(len(lgss_data), 0, -1)))


class TestMultiDimState:
    def test_2d_state(self):
        # Matrix particles through the filter (test-bootstrap_filter.R:210-230).
        rng = np.random.default_rng(0)
        y = rng.normal(size=12)

        def init_fn(key, num_particles):
            return jax.random.normal(key, (num_particles, 2))

        def transition_fn(key, particles):
            return 0.9 * particles + 0.3 * jax.random.normal(key, particles.shape)

        def loglik_fn(y, particles):
            return -0.5 * ((y - particles[:, 0]) ** 2) / 0.25

        res = bootstrap_filter(
            jax.random.key(0), y, 256, init_fn, transition_fn, loglik_fn
        )
        assert res.state_est.shape == (13, 2)
        assert res.particles_history.shape == (13, 256, 2)


class TestVmapChains:
    def test_vmap_matches_single(self, lgss_data):
        keys = jax.random.split(jax.random.key(11), 3)
        batched = jax.vmap(
            lambda k: run_bpf(k, lgss_data, n=64, return_particles=False)
        )(keys)
        for i, k in enumerate(keys):
            single = run_bpf(k, lgss_data, n=64, return_particles=False)
            np.testing.assert_allclose(
                np.asarray(batched.loglike)[i], float(single.loglike), rtol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(batched.state_est)[i],
                np.asarray(single.state_est),
                rtol=2e-4, atol=1e-5,
            )


def test_particle_axis_divisibility_message():
    # Regression (round-2 VERDICT): the message stated the divisibility
    # backwards — particle_axis_size must divide num_particles, not the
    # other way around.
    import pytest

    from bayesssm_tpu.filters.core import particle_filter_core

    with pytest.raises(
        ValueError,
        match="num_particles/max_particles must be divisible by "
              "particle_axis_size",
    ):
        particle_filter_core(
            jax.random.key(0),
            jnp.zeros(3),
            10,
            lambda key, num_particles: jnp.zeros(num_particles),
            lambda key, particles: particles,
            lambda y, particles: jnp.zeros_like(particles),
            particle_axis="particles",
            particle_axis_size=4,
        )
