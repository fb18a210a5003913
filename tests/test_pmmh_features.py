"""PMMH feature coverage: observation gaps, multi-dimensional states, and
filter variants through the full driver (mirrors test-pmmh.R's obs_times
and matrix-particle coverage)."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from bayesssm_tpu.models.distributions import exp_logpdf, norm_logpdf, unif_logpdf
from bayesssm_tpu.models.lgss import lgss_model, simulate_lgss
from bayesssm_tpu.pmmh.driver import pmmh
from bayesssm_tpu.pmmh.tuning import default_tune_control

FAST_TUNE = default_tune_control(pilot_m=50, pilot_reps=8, pilot_n=50)


def quiet_pmmh(**kw):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return pmmh(print_summary=False, **kw)


def test_pmmh_with_obs_times():
    (fns, log_priors, transform) = lgss_model()
    init_fn, trans_fn, loglik_fn = fns
    _, y_full = simulate_lgss(11, t_val=12)
    obs_times = [1, 2, 3, 5, 6, 7, 9, 10, 11, 12]
    y = y_full[np.array(obs_times) - 1]
    out = quiet_pmmh(
        pf_wrapper="bootstrap_filter", y=y, m=60,
        init_fn=init_fn, transition_fn=trans_fn, log_likelihood_fn=loglik_fn,
        log_priors=log_priors,
        pilot_init_params=[{"a": 0.5, "sigma_x": 0.5, "sigma_y": 0.5}] * 2,
        burn_in=10, num_chains=2, seed=5, obs_times=obs_times,
        param_transform=transform, tune_control=FAST_TUNE,
        return_latent_state_est=True,
    )
    assert out.latent_state_chain.shape == (2, 50, len(obs_times) + 1)
    for p in out.theta_chain:
        assert np.isfinite(out.theta_chain[p]).all()


def test_pmmh_multidim_state():
    # 2-D latent state through the full driver (test-pmmh.R:618-668).
    rng = np.random.default_rng(4)
    T = 12
    x = np.zeros((T + 1, 2))
    y = np.zeros(T)
    for t in range(T):
        x[t + 1] = 0.8 * x[t] + 0.5 * rng.normal(size=2)
        y[t] = x[t + 1, 0] + x[t + 1, 1] + 0.3 * rng.normal()

    def init_fn(key, num_particles):
        return jax.random.normal(key, (num_particles, 2))

    def transition_fn(key, particles, rho):
        return rho * particles + 0.5 * jax.random.normal(key, particles.shape)

    def loglik_fn(y, particles, sigma_y):
        mu = particles[:, 0] + particles[:, 1]
        return norm_logpdf(y, mu, sigma_y)

    log_priors = {
        "rho": lambda v: unif_logpdf(v, -1.0, 1.0),
        "sigma_y": lambda v: exp_logpdf(v, 1.0),
    }
    out = quiet_pmmh(
        pf_wrapper="bootstrap_filter", y=y, m=80,
        init_fn=init_fn, transition_fn=transition_fn,
        log_likelihood_fn=loglik_fn, log_priors=log_priors,
        pilot_init_params=[{"rho": 0.5, "sigma_y": 0.5}] * 2,
        burn_in=20, num_chains=2, seed=6,
        param_transform={"rho": "identity", "sigma_y": "log"},
        tune_control=FAST_TUNE, return_latent_state_est=True,
    )
    # latent estimates keep the state dimension
    assert out.latent_state_chain.shape == (2, 60, T + 1, 2)


def test_pmmh_apf_variant():
    (fns, log_priors, transform) = lgss_model()
    init_fn, trans_fn, loglik_fn = fns
    _, y = simulate_lgss(12, t_val=10)

    def aux_fn(y, particles, a, sigma_y):
        return norm_logpdf(y, a * particles, sigma_y)

    out = quiet_pmmh(
        pf_wrapper="auxiliary_filter", y=y, m=50,
        init_fn=init_fn, transition_fn=trans_fn, log_likelihood_fn=loglik_fn,
        aux_log_likelihood_fn=aux_fn, log_priors=log_priors,
        pilot_init_params=[{"a": 0.5, "sigma_x": 0.5, "sigma_y": 0.5}] * 2,
        burn_in=10, num_chains=2, seed=7,
        param_transform=transform, tune_control=FAST_TUNE,
    )
    for p in out.theta_chain:
        assert np.isfinite(out.theta_chain[p]).all()


def test_pmmh_rmpf_variant():
    (fns, log_priors, transform) = lgss_model()
    init_fn, trans_fn, loglik_fn = fns
    _, y = simulate_lgss(13, t_val=10)

    def move_fn(key, particles, y, sigma_y):
        k1, k2 = jax.random.split(key)
        prop = particles + 0.1 * jax.random.normal(k1, particles.shape)
        la = norm_logpdf(y, prop, sigma_y) - norm_logpdf(y, particles, sigma_y)
        acc = jnp.log(jax.random.uniform(k2, particles.shape)) < la
        return jnp.where(acc, prop, particles)

    out = quiet_pmmh(
        pf_wrapper="resample_move_filter", y=y, m=50,
        init_fn=init_fn, transition_fn=trans_fn, log_likelihood_fn=loglik_fn,
        move_fn=move_fn, log_priors=log_priors,
        pilot_init_params=[{"a": 0.5, "sigma_x": 0.5, "sigma_y": 0.5}] * 2,
        burn_in=10, num_chains=2, seed=8,
        param_transform=transform, tune_control=FAST_TUNE,
    )
    for p in out.theta_chain:
        assert np.isfinite(out.theta_chain[p]).all()


def test_reference_jacobian_convention():
    (fns, log_priors, transform) = lgss_model()
    init_fn, trans_fn, loglik_fn = fns
    _, y = simulate_lgss(14, t_val=8)
    out = quiet_pmmh(
        pf_wrapper="bootstrap_filter", y=y, m=40,
        init_fn=init_fn, transition_fn=trans_fn, log_likelihood_fn=loglik_fn,
        log_priors=log_priors,
        pilot_init_params=[{"a": 0.5, "sigma_x": 0.5, "sigma_y": 0.5}] * 2,
        burn_in=5, num_chains=2, seed=9,
        param_transform=transform, tune_control=FAST_TUNE,
        jacobian_convention="reference",
    )
    for p in out.theta_chain:
        assert np.isfinite(out.theta_chain[p]).all()


def test_verbose_progress_reports_acceptance(capsys):
    # Live observability (R/pmmh.R:347-352 analogue): with verbose=True the
    # sampling loop prints per-chunk step counts and acceptance rates.
    (fns, log_priors, transform) = lgss_model()
    init_fn, trans_fn, loglik_fn = fns
    _, y = simulate_lgss(2, t_val=6)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pmmh(
            "bootstrap_filter", y, m=9,
            init_fn=init_fn, transition_fn=trans_fn,
            log_likelihood_fn=loglik_fn, log_priors=log_priors,
            pilot_init_params={"a": 0.5, "sigma_x": 0.5, "sigma_y": 0.5},
            burn_in=2, num_chains=2, seed=3,
            param_transform=transform,
            tune_control=default_tune_control(
                pilot_m=20, pilot_burn_in=5, pilot_reps=3
            ),
            verbose=True, progress_every=4, print_summary=False,
        )
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.startswith("Sampling:")]
    # m=9, first sample from init eval, chunks of 4 -> reports at 5 and 9.
    assert len(lines) == 2, out
    assert "5/9 steps" in lines[0] and "9/9 steps" in lines[1]
    for ln in lines:
        assert "acceptance chunk" in ln and "cumulative" in ln


def test_timings_include_all_phases():
    """result.timings carries tuning, ahead-of-time chunk compilation,
    and sampling phases (the AOT compile keeps executable loads out of
    the sampling phase — pmmh docstring contract)."""
    (init_fn, trans_fn, loglik_fn), log_priors, transform = lgss_model()
    _, y = simulate_lgss(3, t_val=6)
    out = quiet_pmmh(
        pf_wrapper="bootstrap_filter", y=y, m=10,
        init_fn=init_fn, transition_fn=trans_fn,
        log_likelihood_fn=loglik_fn, log_priors=log_priors,
        pilot_init_params={"a": 0.8, "sigma_x": 0.5, "sigma_y": 0.4},
        burn_in=2, num_chains=2, seed=5, param_transform=transform,
        tune_control=FAST_TUNE,
    )
    for phase in ("tuning", "compile", "sampling"):
        assert phase in out.timings, out.timings
        assert out.timings[phase] >= 0.0


def test_fast_path_burn_in_edges():
    """The fast-path chunk schedule (round 5: a no-output burn-in chunk
    + 256-step emitting chunks) must produce the contracted
    [C, m - burn_in] chains at every burn-in edge, including m that
    spans a 256 boundary."""
    (fns, log_priors, transform) = lgss_model()
    init_fn, trans_fn, loglik_fn = fns
    _, y = simulate_lgss(31, t_val=6)
    for m, burn_in in ((12, 0), (12, 1), (12, 11), (300, 20), (2, 1)):
        out = quiet_pmmh(
            pf_wrapper="bootstrap_filter", y=y, m=m,
            init_fn=init_fn, transition_fn=trans_fn,
            log_likelihood_fn=loglik_fn, log_priors=log_priors,
            pilot_init_params=[
                {"a": 0.5, "sigma_x": 0.5, "sigma_y": 0.5}
            ] * 2,
            burn_in=burn_in, num_chains=2, seed=5,
            param_transform=transform, tune_control=FAST_TUNE,
        )
        for p in out.theta_chain:
            assert out.theta_chain[p].shape == (2, m - burn_in), (
                m, burn_in, out.theta_chain[p].shape
            )
            assert np.isfinite(out.theta_chain[p]).all()


def test_fast_path_matches_progress_path():
    """The no-output burn-in chunk variant and the chunked
    progress-reporting path must sample identical chains for the same
    seed (the schedule changes which programs run, not the math)."""
    (fns, log_priors, transform) = lgss_model()
    init_fn, trans_fn, loglik_fn = fns
    _, y = simulate_lgss(33, t_val=6)
    kw = dict(
        pf_wrapper="bootstrap_filter", y=y, m=40,
        init_fn=init_fn, transition_fn=trans_fn,
        log_likelihood_fn=loglik_fn, log_priors=log_priors,
        pilot_init_params=[{"a": 0.5, "sigma_x": 0.5, "sigma_y": 0.5}] * 2,
        burn_in=10, num_chains=2, seed=9,
        param_transform=transform, tune_control=FAST_TUNE,
    )
    fast = quiet_pmmh(**kw)
    chunked = quiet_pmmh(progress_every=7, verbose=False, **kw)
    for p in fast.theta_chain:
        np.testing.assert_array_equal(
            fast.theta_chain[p], chunked.theta_chain[p]
        )
