"""PMMH driver tests.

Mirrors the validation, determinism, and posterior-recovery contracts of
/root/reference/tests/testthat/test-pmmh.R.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesssm_tpu.models.lgss import lgss_model, simulate_lgss
from bayesssm_tpu.pmmh.driver import pmmh
from bayesssm_tpu.pmmh.tuning import default_tune_control

(MODEL_FNS, LOG_PRIORS, TRANSFORM) = lgss_model()
INIT_FN, TRANSITION_FN, LOGLIK_FN = MODEL_FNS
_, Y = simulate_lgss(1405, t_val=15)

FAST_TUNE = default_tune_control(pilot_m=60, pilot_reps=10, pilot_n=50)
INIT_PARAMS = [
    {"a": 0.5, "sigma_x": 0.5, "sigma_y": 0.5},
    {"a": 0.8, "sigma_x": 1.0, "sigma_y": 0.8},
]


def run_fast(m=120, burn_in=40, num_chains=2, seed=11, **kw):
    kw.setdefault("param_transform", TRANSFORM)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return pmmh(
            "bootstrap_filter", Y, m=m,
            init_fn=INIT_FN, transition_fn=TRANSITION_FN,
            log_likelihood_fn=LOGLIK_FN, log_priors=LOG_PRIORS,
            pilot_init_params=INIT_PARAMS[:num_chains],
            burn_in=burn_in, num_chains=num_chains, seed=seed,
            tune_control=FAST_TUNE,
            print_summary=False, **kw,
        )


class TestSmoke:
    def test_output_structure(self):
        out = run_fast()
        assert set(out.theta_chain) == {"a", "sigma_x", "sigma_y"}
        for arr in out.theta_chain.values():
            assert arr.shape == (2, 80)
        assert set(out.diagnostics["ess"]) == {"a", "sigma_x", "sigma_y"}
        assert out.acceptance_rate.shape == (2,)
        assert out.target_n.shape == (2,)
        assert (out.target_n >= 50).all() and (out.target_n <= 1000).all()
        assert out.seed == 11

    def test_deterministic_same_seed(self):
        o1 = run_fast(seed=21)
        o2 = run_fast(seed=21)
        for p in o1.theta_chain:
            np.testing.assert_array_equal(o1.theta_chain[p], o2.theta_chain[p])

    def test_different_seed_differs(self):
        o1 = run_fast(seed=1)
        o2 = run_fast(seed=2)
        assert not np.allclose(o1.theta_chain["a"], o2.theta_chain["a"])

    def test_latent_state_est(self):
        out = run_fast(return_latent_state_est=True)
        assert out.latent_state_chain is not None
        # [chains, m_post, T+1]
        assert out.latent_state_chain.shape == (2, 80, len(Y) + 1)

    def test_single_chain_ess_message(self, capsys):
        out = run_fast(num_chains=1, m=60, burn_in=10)
        captured = capsys.readouterr()
        assert "ESS cannot be computed with only one chain" in captured.out
        assert np.isnan(out.diagnostics["ess"]["a"])


class TestValidation:
    def test_burn_in_bounds(self):
        with pytest.raises(ValueError, match="burn_in"):
            run_fast(m=50, burn_in=50)

    def test_bad_pf_wrapper(self):
        with pytest.raises(ValueError, match="pf_wrapper"):
            pmmh(
                "not_a_filter", Y, m=10, init_fn=INIT_FN,
                transition_fn=TRANSITION_FN, log_likelihood_fn=LOGLIK_FN,
                log_priors=LOG_PRIORS, pilot_init_params=INIT_PARAMS,
                burn_in=1, num_chains=2, print_summary=False,
            )

    def test_chain_count_mismatch(self):
        with pytest.raises(ValueError, match="one entry per chain"):
            pmmh(
                "bootstrap_filter", Y, m=10, init_fn=INIT_FN,
                transition_fn=TRANSITION_FN, log_likelihood_fn=LOGLIK_FN,
                log_priors=LOG_PRIORS, pilot_init_params=INIT_PARAMS[:1],
                burn_in=1, num_chains=2, print_summary=False,
            )

    def test_param_name_mismatch(self):
        # test-pmmh.R: parameters in functions must appear in log_priors.
        with pytest.raises(ValueError, match="do not match"):
            pmmh(
                "bootstrap_filter", Y, m=10, init_fn=INIT_FN,
                transition_fn=TRANSITION_FN, log_likelihood_fn=LOGLIK_FN,
                log_priors={"a": LOG_PRIORS["a"]},
                pilot_init_params=[{"a": 0.5}, {"a": 0.5}],
                burn_in=1, num_chains=2, print_summary=False,
            )

    def test_init_outside_prior_support(self):
        bad = [{"a": 0.5, "sigma_x": -1.0, "sigma_y": 0.5}] * 2
        with pytest.raises(ValueError, match="outside the prior support"):
            pmmh(
                "bootstrap_filter", Y, m=10, init_fn=INIT_FN,
                transition_fn=TRANSITION_FN, log_likelihood_fn=LOGLIK_FN,
                log_priors=LOG_PRIORS, pilot_init_params=bad,
                burn_in=1, num_chains=2, print_summary=False,
            )

    def test_transform_missing_entry(self):
        with pytest.raises(ValueError, match="every parameter"):
            run_fast(param_transform={"a": "identity"})

    def test_invalid_transform_warns(self):
        with pytest.warns(UserWarning, match="identity"):
            pmmh(
                "bootstrap_filter", Y, m=20, init_fn=INIT_FN,
                transition_fn=TRANSITION_FN, log_likelihood_fn=LOGLIK_FN,
                log_priors=LOG_PRIORS, pilot_init_params=INIT_PARAMS,
                burn_in=5, num_chains=2, seed=3,
                param_transform={"a": "nope", "sigma_x": "log", "sigma_y": "log"},
                tune_control=FAST_TUNE, print_summary=False,
            )

    def test_transform_dict_reorder_invariant(self):
        # test-pmmh.R:436-466 — same seed, reordered transform dict ->
        # identical chains.
        t1 = {"a": "identity", "sigma_x": "log", "sigma_y": "log"}
        t2 = {"sigma_y": "log", "a": "identity", "sigma_x": "log"}
        o1 = run_fast(seed=31, param_transform=t1)
        o2 = run_fast(seed=31, param_transform=t2)
        for p in o1.theta_chain:
            np.testing.assert_array_equal(o1.theta_chain[p], o2.theta_chain[p])


class TestWarnings:
    def test_low_ess_warns(self):
        with pytest.warns(UserWarning, match="ESS values are below 400"):
            pmmh(
                "bootstrap_filter", Y, m=60, init_fn=INIT_FN,
                transition_fn=TRANSITION_FN, log_likelihood_fn=LOGLIK_FN,
                log_priors=LOG_PRIORS, pilot_init_params=INIT_PARAMS,
                burn_in=10, num_chains=2, seed=5,
                param_transform=TRANSFORM, tune_control=FAST_TUNE,
                print_summary=False,
            )


class TestPosteriorRecovery:
    def test_lgss_posterior_near_truth(self):
        # Analogue of test-pmmh.R:619-668: posterior mean within loose
        # tolerance of the generating parameters.
        _, y = simulate_lgss(7, t_val=40, a=0.7, sigma_x=0.8, sigma_y=0.4)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            out = pmmh(
                "bootstrap_filter", y, m=600,
                init_fn=INIT_FN, transition_fn=TRANSITION_FN,
                log_likelihood_fn=LOGLIK_FN, log_priors=LOG_PRIORS,
                pilot_init_params=INIT_PARAMS,
                burn_in=150, num_chains=2, seed=1405,
                param_transform=TRANSFORM,
                tune_control=default_tune_control(pilot_m=300, pilot_reps=30),
                print_summary=False,
            )
        summ = out.summary()
        assert abs(summ["a"]["mean"] - 0.7) < 0.35
        assert abs(summ["sigma_x"]["mean"] - 0.8) < 0.5
        assert abs(summ["sigma_y"]["mean"] - 0.4) < 0.4


class TestInputValidation:
    def test_nan_in_y_raises(self):
        bad_y = np.array(Y, copy=True)
        bad_y[3] = np.nan
        with pytest.raises(ValueError, match="no missing values"):
            pmmh(
                "bootstrap_filter", bad_y, m=10, init_fn=INIT_FN,
                transition_fn=TRANSITION_FN, log_likelihood_fn=LOGLIK_FN,
                log_priors=LOG_PRIORS, pilot_init_params=INIT_PARAMS,
                burn_in=1, num_chains=2, print_summary=False,
            )
