"""Generic whole-sweep builder (ops/sweep_builder.py), interpret mode.

Validated on the stochastic-volatility model — a model with NO bespoke
kernel — against the portable engine: same sampling distribution for
BPF, APF (aux callback), and RMPF (move callback) days, plus masked
lanes, determinism, and the pmmh ``pf_impl`` hook.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesssm_tpu.filters.auxiliary import auxiliary_filter
from bayesssm_tpu.filters.bootstrap import bootstrap_filter
from bayesssm_tpu.filters.resample_move import resample_move_filter
from bayesssm_tpu.models.stochastic_volatility import simulate_sv, sv_model
from bayesssm_tpu.ops.sweep_builder import build_sweep_op, build_sweep_pf_impl

PHI, SIG, MU = 0.9, 0.4, -0.8
N = 128
PARAMS = ("phi", "sigma", "mu")

_HALF_LOG_2PI = 0.5 * np.log(2.0 * np.pi)


def sv_init(rng, th):
    phi, sigma, mu = th
    sd0 = sigma / jnp.sqrt(1.0 - phi * phi)
    return (mu + sd0 * rng.normal(),)


def sv_trans(rng, cols, th, t):
    phi, sigma, mu = th
    return (mu + phi * (cols[0] - mu) + sigma * rng.normal(),)


def sv_lw(cols, th, y_t):
    x = cols[0]
    return -_HALF_LOG_2PI - 0.5 * x - 0.5 * y_t * y_t * jnp.exp(-x)


def sv_move(rng, cols, th, y_t):
    x = cols[0]
    prop = x + 0.3 * rng.normal()
    log_ratio = sv_lw((prop,), th, y_t) - sv_lw((x,), th, y_t)
    accept = jnp.log(rng.uniform()) < log_ratio
    return (jnp.where(accept, prop, x),)


@pytest.fixture(scope="module")
def ys():
    _, y = simulate_sv(seed=3, t_val=10, phi=PHI, sigma=SIG, mu=MU)
    return jnp.asarray(y, jnp.float32)


def _builder_batch(ys, c, key=0, num_particles=N, max_particles=None,
                   **op_kw):
    op = build_sweep_op(
        1, sv_init, sv_trans, sv_lw, 3, interpret=True, **op_kw
    )
    theta = jnp.array([PHI, SIG, MU], jnp.float32)
    keys = jax.random.split(jax.random.key(key), c)
    max_particles = max_particles or num_particles

    def one(k, n_alive):
        return op(k, ys, theta, n_alive, max_particles=max_particles)

    n_arr = jnp.full((c,), float(num_particles))
    return jax.jit(jax.vmap(one))(keys, n_arr)


def _portable_batch(ys, c, key=1, algorithm="BPF"):
    (init_fn, trans_fn, loglik_fn), _, _ = sv_model()
    theta = {"phi": PHI, "sigma": SIG, "mu": MU}
    keys = jax.random.split(jax.random.key(key), c)

    def one(k):
        if algorithm == "APF":
            r = auxiliary_filter(
                k, ys, N, init_fn, trans_fn, loglik_fn,
                aux_log_likelihood_fn=loglik_fn, theta=theta,
                return_particles=False,
            )
        elif algorithm == "RMPF":
            def move_fn(key, particles, y):
                k1, k2 = jax.random.split(key)
                prop = particles + 0.3 * jax.random.normal(
                    k1, particles.shape
                )
                lr = loglik_fn(y, prop) - loglik_fn(y, particles)
                acc = jnp.log(
                    jax.random.uniform(k2, particles.shape)
                ) < lr
                return jnp.where(acc, prop, particles)

            r = resample_move_filter(
                k, ys, N, init_fn, trans_fn, loglik_fn, move_fn=move_fn,
                theta=theta, return_particles=False,
            )
        else:
            r = bootstrap_filter(
                k, ys, N, init_fn, trans_fn, loglik_fn, theta=theta,
                return_particles=False,
            )
        return r.loglike, r.state_est

    return jax.jit(jax.vmap(one))(keys)


def _match(ll_s, es_s, ll_c, es_c, c):
    assert bool(jnp.isfinite(ll_s).all())
    se_tol = 4.0 * float(
        np.hypot(np.std(np.asarray(ll_s)), np.std(np.asarray(ll_c)))
    ) / np.sqrt(c)
    assert abs(float(ll_s.mean() - ll_c.mean())) < se_tol
    np.testing.assert_allclose(
        np.asarray(es_s.mean(axis=0)), np.asarray(es_c.mean(axis=0)),
        atol=0.3,
    )


def test_bpf_matches_portable(ys):
    c = 160
    ll_s, es_s = _builder_batch(ys, c, key=2)
    ll_c, es_c = _portable_batch(ys, c, key=3)
    _match(ll_s, es_s, ll_c, es_c, c)


def test_apf_matches_portable(ys):
    c = 160
    ll_s, es_s = _builder_batch(
        ys, c, key=4, aux_log_weight_fn=sv_lw
    )
    ll_c, es_c = _portable_batch(ys, c, key=5, algorithm="APF")
    _match(ll_s, es_s, ll_c, es_c, c)


def test_rmpf_matches_portable(ys):
    c = 160
    ll_s, es_s = _builder_batch(
        ys, c, key=6, move_fn=sv_move, always_resample=True
    )
    ll_c, es_c = _portable_batch(ys, c, key=7, algorithm="RMPF")
    _match(ll_s, es_s, ll_c, es_c, c)


def test_masked_lanes(ys):
    c = 128
    ll_m, _ = _builder_batch(
        ys, c, key=8, num_particles=64, max_particles=N
    )
    (init_fn, trans_fn, loglik_fn), _, _ = sv_model()
    keys = jax.random.split(jax.random.key(9), c)
    ll_c = jax.jit(jax.vmap(
        lambda k: bootstrap_filter(
            k, ys, 64, init_fn, trans_fn, loglik_fn,
            theta={"phi": PHI, "sigma": SIG, "mu": MU},
            return_particles=False,
        ).loglike
    ))(keys)
    assert bool(jnp.isfinite(ll_m).all())
    se_tol = 4.0 * float(
        np.hypot(np.std(np.asarray(ll_m)), np.std(np.asarray(ll_c)))
    ) / np.sqrt(c)
    assert abs(float(ll_m.mean() - ll_c.mean())) < se_tol


def test_deterministic_per_key(ys):
    ll1, es1 = _builder_batch(ys, 8, key=10)
    ll2, es2 = _builder_batch(ys, 8, key=10)
    np.testing.assert_array_equal(np.asarray(ll1), np.asarray(ll2))
    np.testing.assert_array_equal(np.asarray(es1), np.asarray(es2))


def test_validation(ys):
    with pytest.raises(ValueError, match="sorted positions"):
        build_sweep_op(
            1, sv_init, sv_trans, sv_lw, 3, resample_fn="multinomial"
        )
    op = build_sweep_op(1, sv_init, sv_trans, sv_lw, 3, interpret=True)
    with pytest.raises(ValueError, match="power of two"):
        op(jax.random.key(0), ys, jnp.zeros(3), 100)
    with pytest.raises(ValueError, match="power of two"):
        op(jax.random.key(0), ys, jnp.zeros(3), 384)


def test_pmmh_pf_impl_hook(ys):
    from bayesssm_tpu import default_tune_control, pmmh

    (init_fn, trans_fn, loglik_fn), log_priors, transform = sv_model()
    pf_impl = build_sweep_pf_impl(
        1, sv_init, sv_trans, sv_lw, PARAMS, interpret=True
    )
    out = pmmh(
        "bootstrap_filter", np.asarray(ys), 16,
        init_fn, trans_fn, loglik_fn, log_priors,
        pilot_init_params=[{"phi": 0.9, "sigma": 0.4, "mu": -0.5}] * 2,
        burn_in=4, num_chains=2, param_transform=transform, seed=17,
        tune_control=default_tune_control(
            pilot_m=16, pilot_burn_in=4, pilot_reps=3
        ),
        print_summary=False, pf_impl=pf_impl,
    )
    for pname, chain in out.theta_chain.items():
        assert chain.shape == (2, 12), (pname, chain.shape)
        assert np.isfinite(chain).all(), pname


def test_pf_impl_validation(ys):
    pf_impl = build_sweep_pf_impl(
        1, sv_init, sv_trans, sv_lw, PARAMS, interpret=True
    )
    kw = dict(
        y=ys, num_particles=N, param_names=list(PARAMS),
        model_fns=None, obs_times=None, algorithm="BPF",
        resample_algorithm="SISAR", resample_fn="stratified",
        carry_weights=False,
    )
    pf_impl(**kw)
    with pytest.raises(ValueError, match="aux_log_weight_fn"):
        pf_impl(**{**kw, "algorithm": "APF"})
    with pytest.raises(ValueError, match="built for parameters"):
        pf_impl(**{**kw, "param_names": ["x", "y", "z"]})
    # obs_times are supported (static gap counts) but still validated
    # with the portable core's contract.
    with pytest.raises(ValueError, match="one entry per observation"):
        pf_impl(**{**kw, "obs_times": [1, 3]})
    with pytest.raises(ValueError, match="strictly increasing"):
        pf_impl(
            **{**kw, "obs_times": list(range(len(ys), 0, -1))}
        )


def test_gap_times_are_absolute_transition_indices():
    """The gapped day loop must call transition_fn with the absolute
    0-based transition index (times[t] - gap + s), reducing to the day
    index on a contiguous grid. A deterministic transition x += t makes
    the state estimate reveal exactly which times were used."""

    def init(rng, th):
        return (jnp.zeros_like(th[0]),)

    def trans(rng, cols, th, t):
        return (cols[0] + jnp.asarray(t, jnp.float32),)

    def lw(cols, th, y_t):
        return jnp.zeros_like(cols[0])  # flat weights: no resampling

    op = build_sweep_op(
        1, init, trans, lw, 1, interpret=True,
        obs_gaps=(2, 3),  # obs_times (2, 5): transitions at t=0,1 | 2,3,4
    )
    _, est = op(
        jax.random.key(0), np.zeros(2, np.float32),
        jnp.zeros(1), 128,
    )
    # est[0] = init state 0; est[1] = 0+1 = 1; est[2] = 1+2+3+4 = 10.
    np.testing.assert_allclose(np.asarray(est), [0.0, 1.0, 10.0], atol=1e-5)
