"""Whole-sweep LGSS kernel (ops/lgss_sweep_pallas.py), interpret mode.

The second instance of the whole-sweep ``pf_impl`` pattern, and the one
with an ANALYTIC anchor: the linear-Gaussian model's log-marginal
likelihood is exactly computable (utils/kalman.py), so the fused kernel's
estimator is validated against ground truth — not merely against another
Monte-Carlo implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesssm_tpu.filters.bootstrap import bootstrap_filter
from bayesssm_tpu.models.lgss import lgss_model, simulate_lgss
from bayesssm_tpu.ops.lgss_sweep_pallas import lgss_bpf_sweep
from bayesssm_tpu.utils.kalman import kalman_loglik

A, SX, SY = 0.9, 0.6, 0.4
N = 128


@pytest.fixture(scope="module")
def ys():
    _, y = simulate_lgss(11, t_val=12, a=A, sigma_x=SX, sigma_y=SY)
    return jnp.asarray(y, jnp.float32)


def _sweep_batch(ys, c, key=0, **kw):
    keys = jax.random.split(jax.random.key(key), c)

    def one(k):
        return lgss_bpf_sweep(
            k, ys, kw.pop("num_particles", N), A, SX, SY,
            interpret=True, **kw,
        )

    return jax.jit(jax.vmap(one))(keys)


def test_loglike_matches_kalman(ys):
    """The whole-sweep kernel's estimator is unbiased against the EXACT
    Kalman log-marginal likelihood (SISR => standard unbiased bootstrap
    estimator)."""
    truth = kalman_loglik(np.asarray(ys), A, 1.0, SX, SY, p0=1.0)
    c = 96
    ll, xs = _sweep_batch(
        ys, c, key=1, num_particles=256, resample_algorithm="SISR"
    )
    lls = np.asarray(ll, dtype=np.float64)
    assert np.isfinite(lls).all()
    se = lls.std() / np.sqrt(c)
    assert abs(lls.mean() - truth) < max(5 * se, 0.15), (
        lls.mean(), truth
    )


def test_matches_portable_filter_distributionally(ys):
    c = 160
    ll_s, xs_s = _sweep_batch(ys, c, key=3)
    (init_fn, trans_fn, loglik_fn), _, _ = lgss_model()
    keys = jax.random.split(jax.random.key(4), c)

    def one(k):
        r = bootstrap_filter(
            k, ys, N, init_fn, trans_fn, loglik_fn,
            theta={"a": A, "sigma_x": SX, "sigma_y": SY},
            return_particles=False,
        )
        return r.loglike, r.state_est

    ll_c, xs_c = jax.jit(jax.vmap(one))(keys)
    se_tol = 4.0 * float(
        np.hypot(np.std(np.asarray(ll_s)), np.std(np.asarray(ll_c)))
    ) / np.sqrt(c)
    assert abs(float(ll_s.mean() - ll_c.mean())) < se_tol
    np.testing.assert_allclose(
        np.asarray(xs_s.mean(axis=0)), np.asarray(xs_c.mean(axis=0)),
        atol=0.35,
    )


def test_masked_lanes(ys):
    c = 96
    keys = jax.random.split(jax.random.key(5), c)

    def one(k, n_alive):
        # SISR: the unbiased estimator (the default fresh-weight SISAR
        # is biased at small n — the replicated reference quirk), so the
        # Kalman anchor applies at n = 64 too.
        return lgss_bpf_sweep(
            k, ys, n_alive, A, SX, SY, max_particles=N,
            resample_algorithm="SISR", interpret=True,
        )

    ll, _ = jax.jit(jax.vmap(one))(keys, jnp.full((c,), 64.0))
    truth = kalman_loglik(np.asarray(ys), A, 1.0, SX, SY, p0=1.0)
    lls = np.asarray(ll, dtype=np.float64)
    assert np.isfinite(lls).all()
    se = lls.std() / np.sqrt(c)
    assert abs(lls.mean() - truth) < max(5 * se, 0.2)


def test_deterministic_per_key(ys):
    ll1, xs1 = _sweep_batch(ys, 8, key=7)
    ll2, xs2 = _sweep_batch(ys, 8, key=7)
    np.testing.assert_array_equal(np.asarray(ll1), np.asarray(ll2))
    np.testing.assert_array_equal(np.asarray(xs1), np.asarray(xs2))


def test_validation(ys):
    with pytest.raises(ValueError, match="sorted positions"):
        lgss_bpf_sweep(jax.random.key(0), ys, N, A, SX, SY,
                       resample_fn="multinomial", interpret=True)
    with pytest.raises(ValueError, match="SIS, SISR or SISAR"):
        lgss_bpf_sweep(jax.random.key(0), ys, N, A, SX, SY,
                       resample_algorithm="bogus", interpret=True)
    with pytest.raises(ValueError, match="power of two"):
        lgss_bpf_sweep(jax.random.key(0), ys, 100, A, SX, SY,
                       interpret=True)
    with pytest.raises(ValueError, match="power of two"):
        lgss_bpf_sweep(jax.random.key(0), ys, 384, A, SX, SY,
                       interpret=True)


def test_pmmh_pf_impl_hook(ys):
    from bayesssm_tpu import default_tune_control, pmmh
    from bayesssm_tpu.ops.lgss_sweep_pallas import lgss_sweep_pf_impl

    (init_fn, trans_fn, loglik_fn), log_priors, transform = lgss_model()
    out = pmmh(
        "bootstrap_filter", np.asarray(ys), 24,
        init_fn, trans_fn, loglik_fn, log_priors,
        pilot_init_params=[{"a": 0.8, "sigma_x": 0.5, "sigma_y": 0.5}] * 2,
        burn_in=6, num_chains=2, param_transform=transform, seed=13,
        tune_control=default_tune_control(
            pilot_m=24, pilot_burn_in=6, pilot_reps=3
        ),
        print_summary=False,
        pf_impl=lgss_sweep_pf_impl(interpret=True),
    )
    for p, chain in out.theta_chain.items():
        assert chain.shape == (2, 18), (p, chain.shape)
        assert np.isfinite(chain).all(), p


def test_pf_impl_validation(ys):
    from bayesssm_tpu.ops.lgss_sweep_pallas import lgss_sweep_pf_impl

    factory = lgss_sweep_pf_impl(interpret=True)
    kw = dict(
        y=ys, num_particles=N, param_names=["a", "sigma_x", "sigma_y"],
        model_fns=None, obs_times=None, algorithm="BPF",
        resample_algorithm="SISAR", resample_fn="stratified",
        carry_weights=False,
    )
    factory(**kw)
    with pytest.raises(ValueError, match="BPF only"):
        factory(**{**kw, "algorithm": "APF"})
    with pytest.raises(ValueError, match="sigma_x"):
        factory(**{**kw, "param_names": ["x", "y", "z"]})


# ---------------- multivariate observations + obs_times gaps ----------------
# The builder's round-5 extensions, anchored EXACTLY: vector observation
# rows (/root/reference/R/particle_filter_core.R:176-183) against the
# multivariate Kalman filter, and irregular observation grids (:122-137)
# against a gap-aware Kalman recursion.

CV = (1.0, 0.5)
SYV = (0.4, 0.7)


def _simulate_mv(seed, t_val, obs_times=None):
    rng = np.random.default_rng(seed)
    times = (
        np.arange(1, t_val + 1) if obs_times is None
        else np.asarray(obs_times)
    )
    x = rng.normal()  # p0 = 1
    ys = []
    tprev = 0
    for t in times:
        for _ in range(int(t - tprev)):
            x = A * x + SX * rng.normal()
        tprev = t
        ys.append([
            CV[0] * x + SYV[0] * rng.normal(),
            CV[1] * x + SYV[1] * rng.normal(),
        ])
    return np.asarray(ys, dtype=np.float64)


def _kalman_mv_gaps(y, gaps):
    """Float64 Kalman recursion with `gaps[i]` predicts per observation."""
    m, p = 0.0, 1.0
    qx, cv = SX**2, np.asarray(CV)
    rv = np.asarray(SYV) ** 2
    ll = 0.0
    for obs, gap in zip(np.asarray(y, np.float64), gaps):
        for _ in range(int(gap)):
            m = A * m
            p = A * A * p + qx
        s = np.outer(cv, cv) * p + np.diag(rv)
        resid = obs - cv * m
        sign, logdet = np.linalg.slogdet(2.0 * np.pi * s)
        ll += -0.5 * (logdet + resid @ np.linalg.solve(s, resid))
        gain = p * (cv @ np.linalg.inv(s))
        m = m + float(gain @ resid)
        p = float((1.0 - gain @ cv) * p)
    return float(ll)


def _mv_batch(y, c, key=0, obs_times=None, num_particles=256):
    from bayesssm_tpu.ops.lgss_sweep_pallas import lgss_mv_bpf_sweep

    keys = jax.random.split(jax.random.key(key), c)

    def one(k):
        return lgss_mv_bpf_sweep(
            k, jnp.asarray(y, jnp.float32), num_particles, A, SX, SYV,
            c_vec=CV, obs_times=obs_times,
            resample_algorithm="SISR", interpret=True,
        )

    return jax.jit(jax.vmap(one))(keys)


def test_mv_loglike_matches_kalman():
    from bayesssm_tpu.utils.kalman import kalman_loglik_mv

    y = _simulate_mv(21, 10)
    truth = kalman_loglik_mv(y, A, CV, SX, SYV, p0=1.0)
    c = 96
    ll, _ = _mv_batch(y, c, key=22)
    lls = np.asarray(ll, dtype=np.float64)
    assert np.isfinite(lls).all()
    se = lls.std() / np.sqrt(c)
    assert abs(lls.mean() - truth) < max(5 * se, 0.15), (lls.mean(), truth)


def test_gapped_loglike_matches_kalman():
    obs_times = (1, 3, 4, 7, 8, 10)
    gaps = (1, 2, 1, 3, 1, 2)
    y = _simulate_mv(31, None, obs_times=obs_times)
    truth = _kalman_mv_gaps(y, gaps)
    c = 96
    ll, _ = _mv_batch(y, c, key=23, obs_times=obs_times)
    lls = np.asarray(ll, dtype=np.float64)
    assert np.isfinite(lls).all()
    se = lls.std() / np.sqrt(c)
    assert abs(lls.mean() - truth) < max(5 * se, 0.2), (lls.mean(), truth)


def test_gapped_state_est_shape():
    obs_times = (2, 5, 6)
    y = _simulate_mv(41, None, obs_times=obs_times)
    ll, est = _mv_batch(y, 4, key=24, obs_times=obs_times)
    assert est.shape == (4, len(obs_times) + 1)
    assert bool(jnp.isfinite(est).all())


def test_sis_never_resamples_matches_portable(ys):
    """SIS through the whole-sweep builder (round 5: a static
    never-resample day that skips selection entirely) vs the portable
    engine's SIS branch — same fresh-weight sampling distribution."""
    c = 160
    keys = jax.random.split(jax.random.key(61), c)
    ll_s, _ = jax.jit(jax.vmap(
        lambda k: lgss_bpf_sweep(
            k, ys, N, A, SX, SY, resample_algorithm="SIS",
            interpret=True,
        )
    ))(keys)

    (init_fn, trans_fn, loglik_fn), _, _ = lgss_model()
    keys2 = jax.random.split(jax.random.key(62), c)
    ll_c = jax.jit(jax.vmap(
        lambda k: bootstrap_filter(
            k, ys, N, init_fn, trans_fn, loglik_fn,
            theta={"a": A, "sigma_x": SX, "sigma_y": SY},
            resample_algorithm="SIS", return_particles=False,
        ).loglike
    ))(keys2)
    assert bool(jnp.isfinite(ll_s).all())
    se_tol = 4.0 * float(
        np.hypot(np.std(np.asarray(ll_s)), np.std(np.asarray(ll_c)))
    ) / np.sqrt(c)
    assert abs(float(ll_s.mean() - ll_c.mean())) < max(se_tol, 0.1)
