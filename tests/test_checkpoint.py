"""Checkpoint/resume tests: a run interrupted mid-sampling and resumed must
produce exactly the same chains as an uninterrupted run."""

import warnings

import numpy as np
import pytest

from bayesssm_tpu.models.lgss import lgss_model, simulate_lgss
from bayesssm_tpu.pmmh.driver import pmmh
from bayesssm_tpu.pmmh.tuning import default_tune_control
from bayesssm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

(MODEL_FNS, LOG_PRIORS, TRANSFORM) = lgss_model()
INIT_FN, TRANSITION_FN, LOGLIK_FN = MODEL_FNS
_, Y = simulate_lgss(21, t_val=10)

FAST_TUNE = default_tune_control(pilot_m=40, pilot_reps=8, pilot_n=50)
INIT_PARAMS = [{"a": 0.5, "sigma_x": 0.5, "sigma_y": 0.5}] * 2


def run(m=80, **kw):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return pmmh(
            "bootstrap_filter", Y, m=m,
            init_fn=INIT_FN, transition_fn=TRANSITION_FN,
            log_likelihood_fn=LOGLIK_FN, log_priors=LOG_PRIORS,
            pilot_init_params=INIT_PARAMS, burn_in=10, num_chains=2,
            seed=99, param_transform=TRANSFORM, tune_control=FAST_TUNE,
            print_summary=False, **kw,
        )


def test_checkpointing_equals_plain(tmp_path):
    ck = tmp_path / "state.npz"
    plain = run()
    chunked = run(checkpoint_every=25, checkpoint_path=str(ck))
    for p in plain.theta_chain:
        np.testing.assert_array_equal(
            plain.theta_chain[p], chunked.theta_chain[p]
        )
    assert ck.exists()
    state = load_checkpoint(ck)
    assert state["step"] == 80
    assert state["samples"].shape == (2, 80, 3)


def test_resume_continues_exactly(tmp_path):
    ck = tmp_path / "state.npz"
    # Run the first 30 steps with checkpointing.
    run(m=30, checkpoint_every=30, checkpoint_path=str(ck))
    # Resume to 80 total steps.
    resumed = run(m=80, checkpoint_path=str(ck), resume=True,
                  checkpoint_every=25)
    full = run(m=80)
    for p in full.theta_chain:
        np.testing.assert_array_equal(
            full.theta_chain[p], resumed.theta_chain[p]
        )


def test_resume_missing_file_raises(tmp_path):
    with pytest.raises(ValueError, match="existing checkpoint_path"):
        run(resume=True, checkpoint_path=str(tmp_path / "nope.npz"))


def test_checkpoint_roundtrip(tmp_path):
    import jax

    keys = jax.random.split(jax.random.key(0), 4)
    save_checkpoint(
        tmp_path / "x.npz",
        keys=keys,
        theta=np.ones((4, 2)),
        loglike=np.zeros(4),
        state_est=np.zeros((4, 11)),
        samples=np.zeros((4, 5, 2)),
        step=5,
        meta={"target_n": np.array([50, 60, 70, 80])},
    )
    state = load_checkpoint(tmp_path / "x.npz")
    assert state["step"] == 5
    np.testing.assert_array_equal(
        jax.random.key_data(state["keys"]), jax.random.key_data(keys)
    )
    np.testing.assert_array_equal(state["meta"]["target_n"], [50, 60, 70, 80])


def test_resume_latent_flag_flip_rejected(tmp_path):
    """A snapshot written without latent-state collection cannot seed a
    latent-collecting resume (the history would be missing); the driver
    rejects the flag flip with a clear message instead of failing in
    the scan trace."""
    ck = tmp_path / "state.npz"
    run(m=30, checkpoint_every=30, checkpoint_path=str(ck))
    with pytest.raises(ValueError, match="latent-state"):
        run(
            m=80, checkpoint_path=str(ck), resume=True,
            checkpoint_every=25, return_latent_state_est=True,
        )


def test_resume_false_from_latent_checkpoint_works(tmp_path):
    """The reverse flip (True-mode snapshot, False-mode resume) is
    sound — the full state_est is simply dropped for the scalar-dummy
    carry — and must bit-match an uninterrupted False-mode run? No:
    the RNG stream is identical either way (the latent flag never
    touches the chain), so theta chains match the True-mode resume."""
    ck = tmp_path / "state.npz"
    run(
        m=30, checkpoint_every=30, checkpoint_path=str(ck),
        return_latent_state_est=True,
    )
    resumed = run(
        m=80, checkpoint_path=str(ck), resume=True, checkpoint_every=25,
    )
    full = run(m=80)
    for p in full.theta_chain:
        np.testing.assert_array_equal(
            full.theta_chain[p], resumed.theta_chain[p]
        )
