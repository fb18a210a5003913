"""Distributional coverage of the Pallas Gillespie SIR kernel.

Runs under the Pallas interpreter (tests/conftest.py forces CPU), which
swaps the hardware PRNG for a counter-based software stream but executes
every other kernel line that runs on TPU — rate arithmetic, inverse-CDF
waiting times, event choice, per-block termination, chain blocking and
padding (see ops/gillespie_pallas.py module docstring). Parity with the
XLA path (models/sir.py::gillespie_step) is distributional, matching the
reference's exact jump-process semantics
(/root/reference/vignettes/articles/stochastic-sir-model.Rmd:152-176).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesssm_tpu.models.sir import gillespie_step, simulate_sir, sir_model
from bayesssm_tpu.ops.gillespie_pallas import gillespie_step_pallas

N_TOTAL, I0, LAM, GAM = 500.0, 70.0, 0.5, 0.2


def initial(n):
    return jnp.tile(
        jnp.array([N_TOTAL - I0, I0], jnp.float32), (int(n), 1)
    )


@pytest.fixture(scope="module")
def xla_reference():
    # Moment anchor from the XLA exact simulator (large lane count keeps
    # the Monte-Carlo SE of each mean ~ sd/sqrt(n) ~ 0.08).
    out = np.asarray(
        gillespie_step(jax.random.key(42), initial(8192), LAM, GAM, N_TOTAL)
    )
    return out


class TestDistribution:
    def test_moments_match_xla(self, xla_reference):
        out = np.asarray(
            gillespie_step_pallas(
                jax.random.key(7), initial(8192), LAM, GAM, N_TOTAL,
                interpret=True,
            )
        )
        ref = xla_reference
        n = out.shape[0]
        for col in (0, 1):
            se = np.sqrt(
                ref[:, col].var() / n + out[:, col].var() / n
            )
            assert abs(out[:, col].mean() - ref[:, col].mean()) < 5 * se
            # variances within 15% (chi-square spread at n=8192 is ~2%)
            assert out[:, col].std() == pytest.approx(
                ref[:, col].std(), rel=0.15
            )

    def test_population_conserved_and_bounded(self):
        out = np.asarray(
            gillespie_step_pallas(
                jax.random.key(3), initial(1024), LAM, GAM, N_TOTAL,
                interpret=True,
            )
        )
        s, i = out[:, 0], out[:, 1]
        assert (s >= 0).all() and (i >= 0).all()
        assert (s <= N_TOTAL - I0).all()          # S never increases
        assert (s + i <= N_TOTAL).all()
        # R = N - S - I never decreases from 0
        assert (N_TOTAL - s - i >= 0).all()

    def test_absorbing_state(self):
        # I = 0 is absorbing: no events can fire.
        state = jnp.tile(jnp.array([300.0, 0.0], jnp.float32), (256, 1))
        out = np.asarray(
            gillespie_step_pallas(
                jax.random.key(0), state, LAM, GAM, N_TOTAL, interpret=True
            )
        )
        np.testing.assert_array_equal(out, np.asarray(state))

    def test_deterministic_per_key(self):
        a = gillespie_step_pallas(
            jax.random.key(5), initial(512), LAM, GAM, N_TOTAL, interpret=True
        )
        b = gillespie_step_pallas(
            jax.random.key(5), initial(512), LAM, GAM, N_TOTAL, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = gillespie_step_pallas(
            jax.random.key(6), initial(512), LAM, GAM, N_TOTAL, interpret=True
        )
        assert (np.asarray(a) != np.asarray(c)).any()


class TestBatching:
    def test_vmap_lowers_to_one_kernel(self):
        # custom_vmap: a vmapped call must produce per-chain results with
        # per-chain parameters honoured (chain 1 has gamma so large the
        # epidemic dies fast -> far fewer infections than chain 0).
        keys = jax.random.split(jax.random.key(1), 2)
        states = jnp.stack([initial(256), initial(256)])
        lams = jnp.array([0.5, 0.01], jnp.float32)
        gams = jnp.array([0.2, 5.0], jnp.float32)
        out = jax.vmap(
            lambda k, s, l, g: gillespie_step_pallas(
                k, s, l, g, N_TOTAL, interpret=True
            )
        )(keys, states, lams, gams)
        out = np.asarray(out)
        assert out.shape == (2, 256, 2)
        assert out[0, :, 1].mean() > 40          # epidemic still alive
        assert out[1, :, 1].mean() < 20          # rapid removal

    def test_padding_path(self):
        # A chain count that does not divide the block size exercises the
        # pad-to-grid logic; padded chains must not perturb real ones.
        keys = jax.random.split(jax.random.key(2), 3)
        states = jnp.stack([initial(96)] * 3)
        out = jax.vmap(
            lambda k, s: gillespie_step_pallas(
                k, s, LAM, GAM, N_TOTAL, interpret=True
            )
        )(keys, states)
        out = np.asarray(out)
        assert out.shape == (3, 96, 2)
        assert (out[:, :, 0] + out[:, :, 1] <= N_TOTAL).all()


class TestModelIntegration:
    def test_sir_model_option_runs_bpf(self):
        from bayesssm_tpu.filters.bootstrap import bootstrap_filter

        _, y = simulate_sir(seed=1405, t_max=5)
        fns_p, priors, transform = sir_model(
            transition="gillespie_pallas", pallas_interpret=True
        )
        fns_x, _, _ = sir_model(transition="gillespie")
        theta = {"lam": LAM, "gamma": GAM}

        def ll(fns, key):
            return bootstrap_filter(
                key, jnp.asarray(y, jnp.float32), 256, *fns, theta=theta,
                return_particles=False, use_fused=False,
            ).loglike

        keys = jax.random.split(jax.random.key(0), 6)
        ll_p = np.asarray(jax.vmap(lambda k: ll(fns_p, k))(keys))
        ll_x = np.asarray(jax.vmap(lambda k: ll(fns_x, k))(keys))
        assert np.isfinite(ll_p).all()
        # Same model, same data: loglik estimates agree within a few times
        # the PF Monte-Carlo spread.
        spread = max(ll_p.std(), ll_x.std(), 0.2)
        assert abs(ll_p.mean() - ll_x.mean()) < 4 * spread

    def test_rejects_unknown_transition(self):
        with pytest.raises(ValueError, match="transition must be"):
            sir_model(transition="exact")
