"""Pilot-tuning tests mirroring test-pmmh_tuning.R and the
default_tune_control contracts of test-pmmh.R:5-83."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesssm_tpu.models.distributions import norm_logpdf
from bayesssm_tpu.models.lgss import lgss_model, simulate_lgss
from bayesssm_tpu.pmmh.tuning import (
    TuneControl,
    default_tune_control,
    run_pilot_chain,
)

(MODEL_FNS, LOG_PRIORS, TRANSFORM) = lgss_model()
INIT_FN, TRANSITION_FN, LOGLIK_FN = MODEL_FNS
PARAM_NAMES = list(LOG_PRIORS)
PRIOR_FNS = [LOG_PRIORS[p] for p in PARAM_NAMES]
TRANSFORMS = tuple(TRANSFORM[p] for p in PARAM_NAMES)


class TestDefaultTuneControl:
    def test_defaults(self):
        # test-pmmh.R:5-26 — exact reference defaults.
        tc = default_tune_control()
        assert tc == TuneControl(
            pilot_proposal_sd=0.5, pilot_n=100, pilot_m=2000,
            pilot_target_var=1.0, pilot_burn_in=500, pilot_reps=100,
            pilot_resample_algorithm="SISAR", pilot_resample_fn="stratified",
        )

    def test_valid_overrides(self):
        tc = default_tune_control(pilot_m=100, pilot_resample_fn="systematic")
        assert tc.pilot_m == 100
        assert tc.pilot_resample_fn == "systematic"

    @pytest.mark.parametrize("kw", [
        {"pilot_proposal_sd": -1.0},
        {"pilot_n": 0},
        {"pilot_m": -5},
        {"pilot_reps": 0},
        {"pilot_resample_algorithm": "XX"},
        {"pilot_resample_fn": "bogus"},
    ])
    def test_invalid_inputs(self, kw):
        # test-pmmh.R:45-83.
        with pytest.raises(ValueError):
            default_tune_control(**kw)


def run_pilot(seed=0, algorithm="BPF", model_fns=None, **ctl):
    _, y = simulate_lgss(2, t_val=15)
    control = default_tune_control(
        pilot_m=ctl.pop("pilot_m", 120), pilot_reps=ctl.pop("pilot_reps", 15),
        pilot_n=ctl.pop("pilot_n", 50), **ctl,
    )
    fns = model_fns or (INIT_FN, TRANSITION_FN, LOGLIK_FN, None, None)
    return jax.jit(
        lambda k: run_pilot_chain(
            k, jnp.asarray(y), PARAM_NAMES, fns, PRIOR_FNS,
            jnp.array([0.5, 0.5, 0.5]), TRANSFORMS, control,
            algorithm=algorithm,
        )
    )(jax.random.key(seed))


class TestRunPilotChain:
    def test_outputs(self):
        out = run_pilot(0)
        assert out["pilot_theta_mean"].shape == (3,)
        assert out["pilot_theta_cov"].shape == (3, 3)
        assert out["pilot_theta_chain"].shape == (120, 3)
        assert out["pilot_loglike_chain"].shape == (120,)
        # Q10: target_n clamped into [50, 1000].
        tn = float(out["target_n"])
        assert 50 <= tn <= 1000
        # covariance symmetric PSD-ish
        cov = np.asarray(out["pilot_theta_cov"])
        np.testing.assert_allclose(cov, cov.T, atol=1e-6)
        assert np.all(np.linalg.eigvalsh(cov) > -1e-5)

    def test_apf_variant(self):
        def aux_fn(y, particles, a, sigma_y):
            return norm_logpdf(y, a * particles, sigma_y)

        out = run_pilot(
            1, algorithm="APF",
            model_fns=(INIT_FN, TRANSITION_FN, LOGLIK_FN, aux_fn, None),
        )
        assert np.isfinite(np.asarray(out["pilot_theta_mean"])).all()

    def test_rmpf_variant(self):
        def move_fn(key, particles, y, sigma_y):
            k1, k2 = jax.random.split(key)
            prop = particles + 0.1 * jax.random.normal(k1, particles.shape)
            la = norm_logpdf(y, prop, sigma_y) - norm_logpdf(y, particles, sigma_y)
            acc = jnp.log(jax.random.uniform(k2, particles.shape)) < la
            return jnp.where(acc, prop, particles)

        out = run_pilot(
            2, algorithm="RMPF",
            model_fns=(INIT_FN, TRANSITION_FN, LOGLIK_FN, None, move_fn),
        )
        assert np.isfinite(np.asarray(out["pilot_theta_mean"])).all()

    def test_recovers_truth_roughly(self):
        # test-pmmh_tuning.R:505-576 — pilot posterior mean within 0.5 of
        # the generating parameters on informative data.
        _, y = simulate_lgss(42, t_val=40, a=0.7, sigma_x=0.8, sigma_y=0.4)
        control = default_tune_control(pilot_m=400, pilot_reps=20, pilot_n=100)
        out = jax.jit(
            lambda k: run_pilot_chain(
                k, jnp.asarray(y), PARAM_NAMES,
                (INIT_FN, TRANSITION_FN, LOGLIK_FN, None, None), PRIOR_FNS,
                jnp.array([0.5, 0.5, 0.5]), TRANSFORMS, control,
            )
        )(jax.random.key(3))
        mean = np.asarray(out["pilot_theta_mean"])
        assert abs(mean[0] - 0.7) < 0.5
        assert abs(mean[1] - 0.8) < 0.5
        assert abs(mean[2] - 0.4) < 0.5

    def test_reproducible(self):
        o1 = run_pilot(5)
        o2 = run_pilot(5)
        np.testing.assert_array_equal(
            np.asarray(o1["pilot_theta_chain"]),
            np.asarray(o2["pilot_theta_chain"]),
        )
