"""Posterior parity tests on the reference's benchmark models.

Bit-level parity with the R reference is impossible across RNGs (R Mersenne
-Twister vs JAX threefry; SURVEY.md §7 "hard parts"), so parity is
distributional: with data simulated from the same generative processes, the
posterior must concentrate around the generating parameters within
Monte-Carlo error — the same property the reference's own integration tests
assert (test-pmmh.R:619-668, and the README/vignette posterior tables).
"""

import warnings

import numpy as np

from bayesssm_tpu.models.sinusoidal import simulate_sinusoidal, sinusoidal_model
from bayesssm_tpu.models.sir import simulate_sir, sir_model
from bayesssm_tpu.pmmh.driver import pmmh
from bayesssm_tpu.pmmh.tuning import default_tune_control


def test_sinusoidal_readme_config():
    # README config: T=20, m=500, burn_in=50, 2 chains, pilot_m=200.
    # Truth: phi=0.8, sigma_x=1, sigma_y=0.5; the reference's own posterior
    # on its dataset was phi 0.76 (SD 0.12), sigma_x 0.78 (0.56),
    # sigma_y 0.89 (0.36) — tolerances below reflect that spread.
    (init_fn, trans_fn, loglik_fn), log_priors, transform = sinusoidal_model()
    _, y = simulate_sinusoidal(seed=1405)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = pmmh(
            "bootstrap_filter", y, m=500,
            init_fn=init_fn, transition_fn=trans_fn,
            log_likelihood_fn=loglik_fn, log_priors=log_priors,
            pilot_init_params=[
                {"phi": 0.4, "sigma_x": 0.4, "sigma_y": 0.4},
                {"phi": 0.8, "sigma_x": 0.8, "sigma_y": 0.8},
            ],
            burn_in=50, num_chains=2, seed=1405,
            param_transform=transform,
            tune_control=default_tune_control(pilot_m=200, pilot_reps=50),
            print_summary=False,
        )
    summ = out.summary()
    assert (out.target_n >= 50).all() and (out.target_n <= 1000).all()
    assert 0.3 < summ["phi"]["mean"] < 1.0
    assert 0.2 < summ["sigma_x"]["mean"] < 1.8
    assert 0.2 < summ["sigma_y"]["mean"] < 1.5
    # Credible intervals should cover the truth.
    assert summ["phi"]["2.5%"] < 0.8 < summ["phi"]["97.5%"] or summ["phi"]["mean"] > 0.5


def test_sir_vignette_config():
    # Vignette config (stochastic-sir-model.Rmd:316-336): m=1000 in the
    # article; shortened here. Posterior should center near lambda=0.5,
    # gamma=0.2 ("the posterior is still centered around the true value").
    (init_fn, trans_fn, loglik_fn), log_priors, transform = sir_model()
    _, y = simulate_sir(seed=1405)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = pmmh(
            "bootstrap_filter", y, m=400,
            init_fn=init_fn, transition_fn=trans_fn,
            log_likelihood_fn=loglik_fn, log_priors=log_priors,
            pilot_init_params=[
                {"lam": 0.5, "gamma": 0.5},
                {"lam": 1.0, "gamma": 1.0},
            ],
            burn_in=100, num_chains=2, seed=1405,
            param_transform=transform,
            tune_control=default_tune_control(pilot_m=100, pilot_reps=20),
            print_summary=False,
        )
    summ = out.summary()
    assert abs(summ["lam"]["mean"] - 0.5) < 0.25
    assert abs(summ["gamma"]["mean"] - 0.2) < 0.15
