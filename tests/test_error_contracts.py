"""Error-contract parity sweep vs the reference's validation tests.

One test per reference ``expect_error``/``expect_warning`` path, each
citing the reference test it mirrors. The reference uses checkmate
assertions whose messages read "Assertion on 'X' failed"; the repo raises
pythonic messages for the same conditions — what is pinned here is that
EVERY reference validation path exists, fires on the same bad input, and
carries a stable message.

Reference sweeps mirrored:
  * tests/testthat/test-bootstrap_filter.R:15-112 (front-end validation)
  * tests/testthat/test-pmmh.R:46-73 (tune control), :126-360 (arguments)
  * tests/testthat/test-ESS.R:35-75, test-rhat.R:29-82 (diagnostics;
    the unequal-length and warning paths also live in
    tests/test_diagnostics.py)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesssm_tpu.diagnostics.ess import ess
from bayesssm_tpu.diagnostics.rhat import rhat
from bayesssm_tpu.filters.bootstrap import bootstrap_filter
from bayesssm_tpu.pmmh.driver import pmmh
from bayesssm_tpu.pmmh.tuning import default_tune_control

Y = np.zeros(5)


def init_fn(key, num_particles):
    return jnp.zeros(num_particles)


def wrong_init_fn(key, num_particles):
    return jnp.zeros(num_particles + 1)


def wrong_init_fn_matrix(key, num_particles):
    return jnp.zeros((num_particles + 1, 2))


def transition_fn(key, particles):
    return particles


def wrong_transition_fn(key, particles):
    return particles[:-1]


def loglik_fn(y, particles):
    return jnp.zeros(particles.shape[0])


def wrong_loglik_fn(y, particles):
    return jnp.zeros(particles.shape[0] + 1)


def run(y=Y, n=10, init=init_fn, trans=transition_fn, lik=loglik_fn, **kw):
    return bootstrap_filter(jax.random.key(0), y, n, init, trans, lik, **kw)


class TestBootstrapFilterValidation:
    """test-bootstrap_filter.R:15-112."""

    def test_zero_particles(self):
        # "Assertion on 'num_particles' failed" (:19-25)
        with pytest.raises(ValueError, match="num_particles must be a positive"):
            run(n=0)

    def test_init_wrong_count(self):
        # "init_fn must return num_particles" (:27-33)
        with pytest.raises(ValueError, match="init_fn must return num_particles"):
            run(init=wrong_init_fn)

    def test_init_wrong_rows(self):
        # "init_fn must return num_particles rows" (:35-42)
        with pytest.raises(
            ValueError, match="init_fn must return num_particles rows"
        ):
            run(init=wrong_init_fn_matrix)

    def test_transition_wrong_count(self):
        # "transition_fn must return num_particles" (:44-51)
        with pytest.raises(
            ValueError, match="transition_fn must return num_particles"
        ):
            run(trans=wrong_transition_fn)

    def test_weight_wrong_count(self):
        # "weight_fn must return num_particles" (:53-60)
        with pytest.raises(ValueError, match="weight_fn must return num_particles"):
            run(lik=wrong_loglik_fn)

    def test_non_numeric_y(self):
        # "Assertion on 'y' failed" (:62-69)
        with pytest.raises(ValueError, match="y must be numeric"):
            run(y="hi")

    def test_obs_times_wrong_length(self):
        # "Assertion on 'obs_times' failed" (:73-81)
        with pytest.raises(ValueError, match="one entry per observation"):
            run(obs_times=[1, 2, 3, 4])

    def test_obs_times_non_numeric(self):
        # "Assertion on 'obs_times' failed" (:84-92)
        with pytest.raises(ValueError, match="obs_times must be numeric"):
            run(obs_times="hi")

    def test_obs_times_non_integer(self):
        # "Assertion on 'obs_times' failed" (:94-102). A silent int cast
        # would change which transitions the gap loop runs.
        with pytest.raises(ValueError, match="obs_times must be integers"):
            run(obs_times=[1.5, 2.5, 3.5, 4.5, 5.5])

    def test_obs_times_non_increasing(self):
        # "Assertion on 'obs_times' failed" (:104-111)
        with pytest.raises(ValueError, match="strictly increasing"):
            run(obs_times=[1, 2, 3, 5, 4])


class TestTuneControlValidation:
    """test-pmmh.R:46-73."""

    def test_negative_proposal_sd(self):
        with pytest.raises(ValueError, match="pilot_proposal_sd"):
            default_tune_control(pilot_proposal_sd=-0.1)

    def test_zero_pilot_n(self):
        with pytest.raises(ValueError, match="pilot_n"):
            default_tune_control(pilot_n=0)

    def test_negative_pilot_m(self):
        with pytest.raises(ValueError, match="pilot_m"):
            default_tune_control(pilot_m=-10)

    def test_bad_target_var(self):
        with pytest.raises((ValueError, TypeError)):
            default_tune_control(pilot_target_var="a")

    def test_negative_burn_in(self):
        with pytest.raises(ValueError, match="pilot_burn_in"):
            default_tune_control(pilot_burn_in=-1)

    def test_bad_resample_algorithm(self):
        # "'arg' should be one of ..." (:66-69)
        with pytest.raises(ValueError, match="pilot_resample_algorithm"):
            default_tune_control(pilot_resample_algorithm="InvalidAlg")

    def test_bad_resample_fn(self):
        with pytest.raises(ValueError, match="pilot_resample_fn"):
            default_tune_control(pilot_resample_fn="InvalidFn")


def pmmh_args(**over):
    kw = dict(
        pf_wrapper="bootstrap_filter",
        y=np.zeros(10),
        m=10,
        init_fn=init_fn,
        transition_fn=transition_fn,
        log_likelihood_fn=loglik_fn,
        log_priors={"a": lambda v: 0.0},
        pilot_init_params={"a": 0.5},
        burn_in=2,
        num_chains=2,
    )
    kw.update(over)
    return kw


class TestPmmhArgumentValidation:
    """test-pmmh.R:126-360."""

    def test_non_numeric_y(self):
        # "Assertion on 'y' failed" (:129-140)
        with pytest.raises(ValueError, match="y must be numeric"):
            pmmh(**pmmh_args(y="not numeric"))

    def test_missing_y(self):
        # assert_numeric(any.missing = FALSE)
        y = np.zeros(10)
        y[3] = np.nan
        with pytest.raises(ValueError, match="no missing values"):
            pmmh(**pmmh_args(y=y))

    def test_negative_m(self):
        # "Assertion on 'm' failed" (:142-153)
        with pytest.raises(ValueError, match="m must be an integer"):
            pmmh(**pmmh_args(m=-5))

    def test_negative_burn_in(self):
        # "Assertion on 'burn_in' failed" (:155-166)
        with pytest.raises(ValueError, match="burn_in"):
            pmmh(**pmmh_args(burn_in=-1))

    def test_burn_in_not_less_than_m(self):
        # burn_in = m rejected (:168-179)
        with pytest.raises(ValueError, match="burn_in"):
            pmmh(**pmmh_args(burn_in=10))

    def test_zero_chains(self):
        # "Assertion on 'num_chains' failed" (:181-192)
        with pytest.raises(ValueError, match="num_chains"):
            pmmh(**pmmh_args(num_chains=0))

    def test_loglik_missing_y(self):
        # "log_likelihood_fn does not contain 'y' as an argument" (:194-205)
        with pytest.raises(ValueError, match="log_likelihood_fn does not contain 'y'"):
            pmmh(**pmmh_args(log_likelihood_fn=lambda particles: particles))

    def test_empty_pilot_init_params(self):
        # "Assertion on 'pilot_init_params' failed" (:207-254)
        with pytest.raises(ValueError, match="at least one parameter"):
            pmmh(**pmmh_args(pilot_init_params={}))

    def test_pilot_init_params_wrong_count(self):
        with pytest.raises(ValueError, match="one entry per chain"):
            pmmh(**pmmh_args(pilot_init_params=[{"a": 0.5}] * 3))

    def test_pilot_init_params_mismatched_names(self):
        with pytest.raises(ValueError, match="share the same parameter names"):
            pmmh(**pmmh_args(pilot_init_params=[{"a": 0.5}, {"b": 0.5}]))

    def test_init_missing_num_particles(self):
        # ":275-289"
        with pytest.raises(
            ValueError, match="init_fn does not contain 'num_particles'"
        ):
            pmmh(**pmmh_args(init_fn=lambda key: jnp.zeros(8)))

    def test_transition_missing_particles(self):
        # ":291-302"
        with pytest.raises(
            ValueError, match="transition_fn does not contain 'particles'"
        ):
            pmmh(**pmmh_args(transition_fn=lambda key: 0.0))

    def test_loglik_missing_particles(self):
        # ":304-315"
        with pytest.raises(
            ValueError, match="log_likelihood_fn does not contain 'particles'"
        ):
            pmmh(**pmmh_args(log_likelihood_fn=lambda y: y))

    def test_params_not_in_pilot_init(self):
        # "Parameters in functions do not match the names in
        # pilot_init_params" (:335-347)
        def trans(key, particles, extra_param):
            return particles

        with pytest.raises(ValueError, match="names in pilot_init_params"):
            pmmh(**pmmh_args(transition_fn=trans))

    def test_params_not_in_log_priors(self):
        # "Parameters in functions do not match the names in log_priors"
        # (:349-360)
        def trans(key, particles, a):
            return particles

        with pytest.raises(ValueError, match="names in log_priors"):
            pmmh(**pmmh_args(
                transition_fn=trans,
                log_priors={"b": lambda v: 0.0},
            ))

    def test_out_of_support_init(self):
        # "Initial parameter values are invalid" (R/pmmh_tuning.R:135-143)
        with pytest.raises(ValueError, match="Initial parameter values are invalid"):
            pmmh(**pmmh_args(
                log_priors={
                    "a": lambda v: jnp.where(v > 0, 0.0, -jnp.inf)
                },
                pilot_init_params={"a": -1.0},
            ))


class TestDiagnosticsValidation:
    """test-ESS.R:35-75 / test-rhat.R:29-82 input-shape paths; the
    matrix-size, zero-variance, and unequal-length paths are pinned in
    tests/test_diagnostics.py."""

    def test_ess_rejects_list(self):
        with pytest.raises(
            ValueError, match="matrix or a (data frame|DataFrame)"
        ):
            ess([1, 2, 3])

    def test_rhat_rejects_list(self):
        with pytest.raises(
            ValueError, match="matrix or a (data frame|DataFrame)"
        ):
            rhat([1, 2, 3])

    def test_ess_dataframe_without_chain_column(self):
        pd = pytest.importorskip("pandas")
        df = pd.DataFrame({"a": [1.0, 2, 3], "b": [4.0, 5, 6]})
        with pytest.raises(ValueError, match="'chain' column"):
            ess(df)

    def test_rhat_dataframe_without_chain_column(self):
        pd = pytest.importorskip("pandas")
        df = pd.DataFrame({"a": [1.0, 2, 3], "b": [4.0, 5, 6]})
        with pytest.raises(ValueError, match="'chain' column"):
            rhat(df)
