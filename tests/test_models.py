"""Model-family tests: sinusoidal, LGSS, and the vectorized Gillespie SIR."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesssm_tpu.filters.bootstrap import bootstrap_filter
from bayesssm_tpu.models.distributions import (
    exp_logpdf,
    halfnorm_logpdf,
    norm_logpdf,
    pois_logpmf,
    unif_logpdf,
)
from bayesssm_tpu.models.sinusoidal import simulate_sinusoidal, sinusoidal_model
from bayesssm_tpu.models.sir import gillespie_step, simulate_sir, sir_model


class TestDistributions:
    def test_norm_matches_scipy_formula(self):
        x, mu, sd = 1.3, 0.4, 2.0
        expected = -0.5 * np.log(2 * np.pi * sd**2) - 0.5 * ((x - mu) / sd) ** 2
        np.testing.assert_allclose(float(norm_logpdf(x, mu, sd)), expected, rtol=1e-6)

    def test_exp_support(self):
        np.testing.assert_allclose(
            float(exp_logpdf(2.0, 1.5)), np.log(1.5) - 3.0, rtol=1e-6
        )
        assert np.isneginf(float(exp_logpdf(-0.1)))

    def test_unif_support(self):
        np.testing.assert_allclose(float(unif_logpdf(0.5, 0, 2)), -np.log(2.0))
        assert np.isneginf(float(unif_logpdf(3.0, 0, 2)))

    def test_pois_zero_rate(self):
        assert float(pois_logpmf(0.0, 0.0)) == 0.0
        assert np.isneginf(float(pois_logpmf(1.0, 0.0)))
        # k=3, rate=2: log(2^3 e^-2 / 6)
        expected = 3 * np.log(2) - 2 - np.log(6)
        np.testing.assert_allclose(float(pois_logpmf(3.0, 2.0)), expected, rtol=1e-6)

    def test_halfnorm_normalization(self):
        # integrates to 1 over [0, inf): crude Riemann check
        xs = np.linspace(0, 10, 20001)
        vals = np.exp(np.asarray(halfnorm_logpdf(jnp.asarray(xs), 1.5)))
        np.testing.assert_allclose(np.trapezoid(vals, xs), 1.0, atol=1e-3)
        assert np.isneginf(float(halfnorm_logpdf(-0.5, 1.0)))


class TestSinusoidal:
    def test_filter_runs(self):
        (init_fn, trans_fn, loglik_fn), priors, transform = sinusoidal_model()
        _, y = simulate_sinusoidal(seed=1405)
        res = bootstrap_filter(
            jax.random.key(0), y, 256, init_fn, trans_fn, loglik_fn,
            theta={"phi": 0.8, "sigma_x": 1.0, "sigma_y": 0.5},
        )
        assert np.isfinite(float(res.loglike))
        assert res.state_est.shape == (21,)
        # priors match README: phi ~ U(0,1), sigmas ~ Exp(1)
        assert np.isneginf(float(priors["phi"](1.5)))
        assert np.isfinite(float(priors["sigma_x"](0.5)))


class TestSIR:
    def test_gillespie_conservation(self):
        # S+I never increases; S non-increasing; counts stay non-negative.
        state = jnp.tile(jnp.array([430.0, 70.0]), (128, 1))
        out = gillespie_step(jax.random.key(0), state, 0.5, 0.2, 500.0)
        s, i = np.asarray(out[:, 0]), np.asarray(out[:, 1])
        assert (s >= 0).all() and (i >= 0).all()
        assert (s <= 430.0).all()
        assert (s + i <= 500.0).all()
        # Some randomness must have happened.
        assert np.std(i) > 0

    def test_gillespie_absorbing_zero(self):
        # i == 0 is absorbing: nothing changes.
        state = jnp.tile(jnp.array([400.0, 0.0]), (16, 1))
        out = gillespie_step(jax.random.key(1), state, 0.5, 0.2, 500.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(state))

    def test_gillespie_matches_host_moments(self):
        # The vectorized device Gillespie must match the host reference
        # implementation's distribution of I after one unit step.
        lam, gamma, n_total = 0.5, 0.2, 500.0
        state = jnp.tile(jnp.array([430.0, 70.0]), (4096, 1))
        out = gillespie_step(jax.random.key(2), state, lam, gamma, n_total)
        i_dev = np.asarray(out[:, 1])

        rng = np.random.default_rng(0)
        i_host = []
        for _ in range(4096):
            s, i = 430.0, 70.0
            t = 0.0
            while i > 0:
                r_inf = lam / n_total * s * i
                r_rem = gamma * i
                r_tot = r_inf + r_rem
                if r_tot <= 0:
                    break
                dt = rng.exponential(1.0 / r_tot)
                if t + dt > 1.0:
                    break
                t += dt
                if rng.uniform() < r_inf / r_tot:
                    s, i = s - 1, i + 1
                else:
                    i -= 1
            i_host.append(i)
        i_host = np.array(i_host)
        assert abs(i_dev.mean() - i_host.mean()) < 2.0
        assert abs(i_dev.std() - i_host.std()) < 1.5

    def test_sir_filter_loglike_finite(self):
        (init_fn, trans_fn, loglik_fn), priors, transform = sir_model()
        states, y = simulate_sir(seed=1405)
        res = bootstrap_filter(
            jax.random.key(3), y, 128, init_fn, trans_fn, loglik_fn,
            theta={"lam": 0.5, "gamma": 0.2}, return_particles=False,
        )
        assert np.isfinite(float(res.loglike))
        # State estimate dims: [T+1, 2]
        assert res.state_est.shape == (len(y) + 1, 2)
        # Infectious trajectory estimate should track the truth loosely.
        i_est = np.asarray(res.state_est[1:, 1])
        # Loose tracking bound: the exact correlation is key-dependent
        # (observed 0.88-0.97 across RNG stream layouts).
        assert np.corrcoef(i_est, states[:, 1])[0, 1] > 0.8

    def test_sir_likelihood_favors_truth(self):
        (init_fn, trans_fn, loglik_fn), _, _ = sir_model()
        _, y = simulate_sir(seed=7)
        keys = jax.random.split(jax.random.key(4), 4)

        def ll(theta, key):
            return float(
                bootstrap_filter(
                    key, y, 256, init_fn, trans_fn, loglik_fn,
                    theta=theta, return_particles=False,
                ).loglike
            )

        ll_true = np.mean([ll({"lam": 0.5, "gamma": 0.2}, k) for k in keys])
        ll_bad = np.mean([ll({"lam": 2.0, "gamma": 1.0}, k) for k in keys])
        assert ll_true > ll_bad


class TestTauLeap:
    def test_tau_leap_moments_match_gillespie(self):
        from bayesssm_tpu.models.sir import tau_leap_step

        lam, gamma, n_total = 0.5, 0.2, 500.0
        state = jnp.tile(jnp.array([430.0, 70.0]), (4096, 1))
        exact = gillespie_step(jax.random.key(0), state, lam, gamma, n_total)
        leap = tau_leap_step(
            jax.random.key(1), state, lam, gamma, n_total, substeps=20
        )
        i_e, i_l = np.asarray(exact[:, 1]), np.asarray(leap[:, 1])
        assert abs(i_e.mean() - i_l.mean()) < 2.5
        assert abs(i_e.std() - i_l.std()) < 2.0
        s_e, s_l = np.asarray(exact[:, 0]), np.asarray(leap[:, 0])
        assert abs(s_e.mean() - s_l.mean()) < 2.5

    def test_tauleap_model_filter(self):
        (init_fn, trans_fn, loglik_fn), _, _ = sir_model(transition="tauleap")
        _, y = simulate_sir(seed=1405)
        res = bootstrap_filter(
            jax.random.key(3), y, 128, init_fn, trans_fn, loglik_fn,
            theta={"lam": 0.5, "gamma": 0.2}, return_particles=False,
        )
        assert np.isfinite(float(res.loglike))

    def test_bad_transition_name(self):
        import pytest

        with pytest.raises(ValueError, match="gillespie"):
            sir_model(transition="exact")


def test_sir_apf_and_rmpf_components():
    # BASELINE.json configs 4-5 model pieces: APF lookahead weights and the
    # RMPF rejuvenation move, through the real filter front-ends.
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bayesssm_tpu.filters.auxiliary import auxiliary_filter
    from bayesssm_tpu.filters.resample_move import resample_move_filter
    from bayesssm_tpu.models.sir import (
        simulate_sir,
        sir_aux_log_likelihood_fn,
        sir_model,
        sir_move_fn,
    )

    n_total = 200
    (init_fn, trans_fn, loglik_fn), _, _ = sir_model(
        n_total=n_total, init_infected=20
    )
    _, y = simulate_sir(seed=2, n_total=n_total, init_infected=20, t_max=4)
    theta = {"lam": 0.5, "gamma": 0.2}
    apf = auxiliary_filter(
        jax.random.key(0), y, 64, init_fn, trans_fn, loglik_fn,
        aux_log_likelihood_fn=sir_aux_log_likelihood_fn, theta=theta,
        return_particles=False,
    )
    assert np.isfinite(float(apf.loglike))
    rmpf = resample_move_filter(
        jax.random.key(1), y, 64, init_fn, trans_fn, loglik_fn,
        move_fn=sir_move_fn(n_total), theta=theta, return_particles=True,
    )
    assert np.isfinite(float(rmpf.loglike))
    # The move keeps the state in the SIR support: integers, S+I <= n.
    p = np.asarray(rmpf.particles_history)
    assert (p >= 0).all()
    assert (p.sum(axis=-1) <= n_total).all()
    assert np.array_equal(p, np.round(p))


class TestStochasticVolatility:
    def test_beta_logpdf_matches_lgamma_formula(self):
        import math

        from bayesssm_tpu.models.distributions import beta_logpdf

        x, a, b = 0.85, 9.0, 1.5
        expected = (
            (a - 1) * math.log(x) + (b - 1) * math.log1p(-x)
            + math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        )
        np.testing.assert_allclose(
            float(beta_logpdf(x, a, b)), expected, rtol=1e-5
        )
        assert np.isneginf(float(beta_logpdf(0.0, 2.0, 2.0)))
        assert np.isneginf(float(beta_logpdf(1.0, 2.0, 2.0)))
        assert np.isneginf(float(beta_logpdf(-0.2, 1.0, 1.0)))

    def test_simulate_shapes_and_scale(self):
        from bayesssm_tpu.models.stochastic_volatility import simulate_sv

        x, y = simulate_sv(seed=3, t_val=200, phi=0.9, sigma=0.4, mu=-1.0)
        assert x.shape == (200,) and y.shape == (200,)
        # Stationary log-volatility: mean near mu, sd near sigma/sqrt(1-phi^2)
        assert abs(x.mean() - (-1.0)) < 0.5
        assert abs(x.std() - 0.4 / np.sqrt(1 - 0.81)) < 0.4

    def test_filter_runs_and_favors_truth(self):
        from bayesssm_tpu.models.stochastic_volatility import (
            simulate_sv,
            sv_model,
        )

        fns, log_priors, transform = sv_model()
        _, y = simulate_sv(seed=11, t_val=40)
        ys = jnp.asarray(y, jnp.float32)

        def avg_ll(theta, seeds):
            lls = [
                bootstrap_filter(
                    jax.random.key(s), ys, 256, *fns, theta=theta,
                    return_particles=False,
                ).loglike
                for s in seeds
            ]
            return float(np.mean(lls))

        truth = {"phi": 0.95, "sigma": 0.3, "mu": -1.0}
        wrong = {"phi": 0.2, "sigma": 2.5, "mu": 2.0}
        seeds = range(4)
        assert avg_ll(truth, seeds) > avg_ll(wrong, seeds) + 5.0
        # Prior support and transform table are self-consistent.
        assert transform["phi"] == "logit"
        assert np.isfinite(float(log_priors["phi"](jnp.float32(0.9))))
        assert np.isneginf(float(log_priors["phi"](jnp.float32(1.2))))

    def test_pmmh_smoke_with_logit_transform(self):
        import warnings

        from bayesssm_tpu.models.stochastic_volatility import (
            simulate_sv,
            sv_model,
        )
        from bayesssm_tpu.pmmh.driver import pmmh
        from bayesssm_tpu.pmmh.tuning import default_tune_control

        fns, log_priors, transform = sv_model()
        _, y = simulate_sv(seed=5, t_val=15)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            out = pmmh(
                "bootstrap_filter", np.asarray(y, np.float32), 12,
                fns[0], fns[1], fns[2], log_priors,
                pilot_init_params={"phi": 0.9, "sigma": 0.5, "mu": 0.0},
                burn_in=2, num_chains=2, seed=42, param_transform=transform,
                tune_control=default_tune_control(
                    pilot_m=20, pilot_burn_in=5, pilot_reps=2
                ),
                print_summary=False,
            )
        phi_chain = np.asarray(out.theta_chain["phi"])
        assert phi_chain.shape == (2, 10)
        assert np.isfinite(phi_chain).all()
        assert ((phi_chain > 0) & (phi_chain < 1)).all()


class TestSinusoidalSweep:
    """The README model's builder-instance fast path
    (models/sinusoidal.py::sinusoidal_sweep_pf_impl) matches the
    portable engine distributionally (interpret mode)."""

    def _ys(self):
        _, y = simulate_sinusoidal(seed=7, t_val=10)
        return jnp.asarray(y, jnp.float32)

    def test_matches_portable(self):
        from bayesssm_tpu.models.sinusoidal import sinusoidal_sweep_pf_impl

        ys = self._ys()
        c, n = 128, 128
        pf = sinusoidal_sweep_pf_impl(interpret=True)(
            y=ys, num_particles=n,
            param_names=["phi", "sigma_x", "sigma_y"], model_fns=None,
            obs_times=None, algorithm="BPF", resample_algorithm="SISAR",
            resample_fn="stratified", carry_weights=False,
        )
        theta = jnp.array([0.8, 1.0, 0.5], jnp.float32)
        keys = jax.random.split(jax.random.key(11), c)
        ll_b, _ = jax.jit(jax.vmap(lambda k: pf(k, theta)))(keys)

        (init_fn, trans_fn, loglik_fn), _, _ = sinusoidal_model()
        keys2 = jax.random.split(jax.random.key(12), c)
        ll_c = jax.jit(jax.vmap(
            lambda k: bootstrap_filter(
                k, ys, n, init_fn, trans_fn, loglik_fn,
                theta={"phi": 0.8, "sigma_x": 1.0, "sigma_y": 0.5},
                return_particles=False,
            ).loglike
        ))(keys2)
        assert bool(jnp.isfinite(ll_b).all())
        se = 4.0 * float(
            np.hypot(np.std(np.asarray(ll_b)), np.std(np.asarray(ll_c)))
        ) / np.sqrt(c)
        assert abs(float(ll_b.mean() - ll_c.mean())) < max(se, 0.2)

    def test_pmmh_hook(self):
        from bayesssm_tpu import default_tune_control, pmmh
        from bayesssm_tpu.models.sinusoidal import sinusoidal_sweep_pf_impl

        ys = self._ys()
        (init_fn, trans_fn, loglik_fn), log_priors, transform = (
            sinusoidal_model()
        )
        out = pmmh(
            "bootstrap_filter", np.asarray(ys), 16,
            init_fn, trans_fn, loglik_fn, log_priors,
            pilot_init_params=[
                {"phi": 0.7, "sigma_x": 0.9, "sigma_y": 0.6}
            ] * 2,
            burn_in=4, num_chains=2, param_transform=transform, seed=31,
            tune_control=default_tune_control(
                pilot_m=16, pilot_burn_in=4, pilot_reps=3
            ),
            print_summary=False,
            pf_impl=sinusoidal_sweep_pf_impl(interpret=True),
        )
        for p, chain in out.theta_chain.items():
            assert chain.shape == (2, 12), (p, chain.shape)
            assert np.isfinite(chain).all(), p
