"""Locate the public driver's residual vs the raw loop (round 5).

Hypothesis: the ~0.8 ms/step e2e-vs-raw-loop gap at the bench shape is
the per-chunk device->host SAMPLE TRANSFER through the axon tunnel (the
raw loop transfers nothing), not scan-output writes or chunk dispatch.

Test: the driver's burn-in chunks compile WITHOUT sample outputs
(emit=False) and transfer only a [C] accepts vector. Running the same
m=512 sampling phase with burn_in=510 (everything elided) vs burn_in=128
(standard) isolates the output-collection + transfer cost; tuning and
AOT compile sit outside the sampling timer either way.

Run SERIALLY: python scripts/probe_e2e_residual.py
"""

import pathlib
import sys
import warnings

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import _enable_compile_cache  # noqa: E402


def run(burn_in, m=512, chains=4096):
    from bayesssm_tpu.models.sir import simulate_sir, sir_model, sir_sweep_pf_impl
    from bayesssm_tpu.pmmh.driver import pmmh
    from bayesssm_tpu.pmmh.tuning import default_tune_control

    (init_fn, transition_fn, loglik_fn), log_priors, transform = sir_model(
        n_total=500, init_infected=70, transition="gillespie_pallas"
    )
    _, y = simulate_sir(seed=1405)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = pmmh(
            "bootstrap_filter", np.asarray(y, np.float32), m,
            init_fn, transition_fn, loglik_fn, log_priors,
            pilot_init_params={"lam": 0.5, "gamma": 0.2},
            burn_in=burn_in, num_chains=chains, seed=1405,
            param_transform=transform,
            tune_control=default_tune_control(
                pilot_m=200, pilot_burn_in=50, pilot_reps=20
            ),
            print_summary=False,
            pf_impl=sir_sweep_pf_impl(500, 70),
        )
    return out.timings


def main():
    _enable_compile_cache()
    m = 512
    for burn_in in (128, 510, 128, 510):
        t = run(burn_in, m=m)
        print(
            f"burn_in={burn_in}: sampling={t['sampling']:.3f}s "
            f"compile={t.get('compile', float('nan')):.2f}s "
            f"-> {4096 * (m - 1) / t['sampling'] / 1e3:.1f}k samples/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
