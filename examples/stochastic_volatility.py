"""Stochastic-volatility PMMH — the classic particle-MCMC showcase.

Fits the SV model (Andrieu, Doucet & Holenstein 2010, §3.2)

    x_t = mu + phi (x_{t-1} - mu) + sigma eta_t,   y_t ~ N(0, exp(x_t))

to a simulated volatility path with a bootstrap-filter PMMH: ``phi`` is
proposed in LOGIT space (quirk Q1 conventions, pmmh/transforms.py),
``sigma`` in log space. The reference package has no model zoo — this is
a beyond-reference example following its vignette pattern
(/root/reference/README.md:90-150).

Run: python examples/stochastic_volatility.py
"""

import numpy as np

from bayesssm_tpu.models.stochastic_volatility import simulate_sv, sv_model
from bayesssm_tpu.pmmh.driver import pmmh
from bayesssm_tpu.pmmh.tuning import default_tune_control


def main():
    (init_fn, transition_fn, log_likelihood_fn), log_priors, transform = (
        sv_model()
    )
    x, y = simulate_sv(seed=1405, t_val=100, phi=0.95, sigma=0.3, mu=-1.0)
    print(f"simulated T={len(y)} observations; "
          f"log-vol mean {x.mean():.2f}, sd {x.std():.2f}")

    result = pmmh(
        "bootstrap_filter",
        np.asarray(y, np.float32),
        m=500,
        init_fn=init_fn,
        transition_fn=transition_fn,
        log_likelihood_fn=log_likelihood_fn,
        log_priors=log_priors,
        pilot_init_params=[
            {"phi": 0.9, "sigma": 0.5, "mu": 0.0},
            {"phi": 0.8, "sigma": 0.2, "mu": -2.0},
        ],
        burn_in=100,
        num_chains=2,
        seed=7,
        param_transform=transform,
        tune_control=default_tune_control(pilot_m=500, pilot_burn_in=100,
                                          pilot_reps=20),
    )
    return result


if __name__ == "__main__":
    main()
