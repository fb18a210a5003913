"""Shared PMMH configuration for the cross-process invariance test.

Used by tests/_distributed_worker.py (2-process jax.distributed cluster)
and tests/test_distributed.py (same-seed single-process rerun): both build
the exact same pmmh() call over a 4-way chains mesh so their outputs can
be compared — the lift of the reference's cores-invariance contract
(/root/reference/tests/testthat/test-pmmh.R:468-503).
"""

from __future__ import annotations

import warnings

import numpy as np

import jax.numpy as jnp


def run_pmmh_dist(mesh):
    from bayesssm_tpu.models.lgss import lgss_model, simulate_lgss
    from bayesssm_tpu.pmmh.driver import pmmh
    from bayesssm_tpu.pmmh.tuning import default_tune_control

    (init_fn, trans_fn, loglik_fn), _, _ = lgss_model()
    _, y = simulate_lgss(1, t_val=4)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return pmmh(
            "bootstrap_filter", np.asarray(y, np.float32), 12,
            init_fn, trans_fn, loglik_fn,
            {
                "a": lambda v: jnp.where(jnp.abs(v) < 1, 0.0, -jnp.inf),
                "sigma_x": lambda v: jnp.where(v > 0, -v, -jnp.inf),
                "sigma_y": lambda v: jnp.where(v > 0, -v, -jnp.inf),
            },
            pilot_init_params={"a": 0.8, "sigma_x": 0.5, "sigma_y": 0.4},
            burn_in=2, num_chains=4, seed=7,
            param_transform={
                "a": "identity", "sigma_x": "log", "sigma_y": "log"
            },
            tune_control=default_tune_control(
                pilot_m=12, pilot_burn_in=4, pilot_reps=2
            ),
            mesh=mesh, print_summary=False,
        )


def run_pmmh_ck(mesh, m, **kw):
    """Same model/seed as :func:`run_pmmh_dist`, parameterized for the
    multi-process checkpoint/resume scenario (m and checkpoint args)."""
    from bayesssm_tpu.models.lgss import lgss_model, simulate_lgss
    from bayesssm_tpu.pmmh.driver import pmmh
    from bayesssm_tpu.pmmh.tuning import default_tune_control

    (init_fn, trans_fn, loglik_fn), _, _ = lgss_model()
    _, y = simulate_lgss(1, t_val=4)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return pmmh(
            "bootstrap_filter", np.asarray(y, np.float32), m,
            init_fn, trans_fn, loglik_fn,
            {
                "a": lambda v: jnp.where(jnp.abs(v) < 1, 0.0, -jnp.inf),
                "sigma_x": lambda v: jnp.where(v > 0, -v, -jnp.inf),
                "sigma_y": lambda v: jnp.where(v > 0, -v, -jnp.inf),
            },
            pilot_init_params={"a": 0.8, "sigma_x": 0.5, "sigma_y": 0.4},
            burn_in=2, num_chains=4, seed=7,
            param_transform={
                "a": "identity", "sigma_x": "log", "sigma_y": "log"
            },
            tune_control=default_tune_control(
                pilot_m=12, pilot_burn_in=4, pilot_reps=2
            ),
            mesh=mesh, print_summary=False, **kw,
        )


def digest(out) -> str:
    chains = np.stack(
        [out.theta_chain[p] for p in sorted(out.theta_chain)], axis=-1
    )
    assert chains.shape == (4, 10, 3), chains.shape
    assert np.isfinite(chains).all()
    s = np.array2string(
        chains.astype(np.float64), precision=6, separator=",",
        threshold=10_000, floatmode="fixed",
    ).replace("\n", "")
    return s + " target_n=" + np.array2string(np.asarray(out.target_n))
