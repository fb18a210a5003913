"""Hardware-only kernel contracts (skipped on CPU CI).

These tests run only when a real TPU backend is attached (`jax.devices()`
platform "tpu"/"axon"). They exist because the Pallas interpreter cannot
emulate two hardware behaviors that have already bitten once:

  * ``pltpu.prng_random_bits`` returns SIGNED int32 on TPU Mosaic — a
    sign-extending shift produced negative "uniforms" and silently garbage
    epidemic dynamics while every interpret-mode test stayed green (fixed
    in ops/gillespie_pallas.py; this file is the regression net).
  * the fused weight/resample kernel's Mosaic lowering (tiling, roll-based
    cumsum, masked-reduce gather) differs from the interpreter path.

Run manually on the TPU box:
``BAYESSSM_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py``
(without the env var conftest.py pins the suite to CPU and these skip;
with it, ONLY run this file — the rest of the suite assumes the 8-device
CPU mesh).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesssm_tpu.ops.resampling_pallas import pallas_available

pytestmark = pytest.mark.skipif(
    not pallas_available(),
    reason="requires a real TPU backend (conftest pins CI to CPU)",
)


def test_gillespie_hardware_prng_moments():
    # The hardware-PRNG path must match the XLA exact simulator's moments.
    # Regression: signed prng_random_bits made S go NEGATIVE on hardware.
    from bayesssm_tpu.models.sir import gillespie_step
    from bayesssm_tpu.ops.gillespie_pallas import gillespie_step_pallas

    state = jnp.tile(jnp.array([430.0, 70.0], jnp.float32), (8192, 1))
    out_p = np.asarray(
        gillespie_step_pallas(jax.random.key(0), state, 0.5, 0.2, 500.0)
    )
    out_x = np.asarray(
        gillespie_step(jax.random.key(1), state, 0.5, 0.2, 500.0)
    )
    assert (out_p >= 0).all()
    n = out_p.shape[0]
    for col in (0, 1):
        se = np.sqrt(out_p[:, col].var() / n + out_x[:, col].var() / n)
        assert abs(out_p[:, col].mean() - out_x[:, col].mean()) < 5 * se
        assert out_p[:, col].std() == pytest.approx(
            out_x[:, col].std(), rel=0.2
        )


def test_fused_filter_matches_portable_on_device():
    from bayesssm_tpu.filters.core import particle_filter_core

    A, C, SX, SY = 0.9, 1.0, 0.6, 0.4

    def init(key, num_particles):
        return jax.random.normal(key, (num_particles,))

    def trans(key, particles, t):
        return A * particles + SX * jax.random.normal(key, particles.shape)

    def ll(y, particles, t):
        return -0.5 * (jnp.log(2 * jnp.pi * SY**2)
                       + ((y - C * particles) / SY) ** 2)

    def move(key, particles, y, t):
        prop = particles + 0.3 * jax.random.normal(key, particles.shape)
        acc = jnp.log(jax.random.uniform(key, particles.shape)) < (
            ll(y, prop, t) - ll(y, particles, t)
        )
        return jnp.where(acc, prop, particles)

    rng = np.random.default_rng(1405)
    x = rng.normal()
    ys = []
    for _ in range(12):
        x = A * x + SX * rng.normal()
        ys.append(C * x + SY * rng.normal())
    ys = np.asarray(ys, np.float32)

    kw = dict(init_fn=init, transition_fn=trans, weight_fn=ll)
    for extra in (
        {},
        dict(algorithm="APF", aux_weight_fn=ll),
        dict(algorithm="RMPF", move_fn=move, resample_algorithm="SISR"),
    ):
        key = jax.random.key(7)
        f = particle_filter_core(
            key, ys, 128, use_fused=True, return_particles=False, **kw, **extra
        )
        p = particle_filter_core(
            key, ys, 128, use_fused=False, return_particles=False, **kw, **extra
        )
        np.testing.assert_allclose(
            float(f.loglike), float(p.loglike), rtol=2e-5, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(f.state_est), np.asarray(p.state_est),
            rtol=1e-4, atol=5e-4,
        )


def test_inkernel_positions_on_device():
    # The seeded fused kernel ("auto" mode) draws stratum positions from
    # the HARDWARE PRNG — the interpreter covers the logic with a software
    # stream, so the signed-int32-bits handling and per-chain XOR mix must
    # be certified on device: finite loglikes, determinism per key, chain
    # decorrelation, and distributional agreement with the portable path.
    from bayesssm_tpu.filters.core import particle_filter_core

    A, C, SX, SY = 0.9, 1.0, 0.6, 0.4

    def init(key, num_particles):
        return jax.random.normal(key, (num_particles,))

    def trans(key, particles, t):
        return A * particles + SX * jax.random.normal(key, particles.shape)

    def ll(y, particles, t):
        return -0.5 * (jnp.log(2 * jnp.pi * SY**2)
                       + ((y - C * particles) / SY) ** 2)

    rng = np.random.default_rng(7)
    x = rng.normal()
    ys = []
    for _ in range(10):
        x = A * x + SX * rng.normal()
        ys.append(C * x + SY * rng.normal())
    ys = np.asarray(ys, np.float32)
    kw = dict(init_fn=init, transition_fn=trans, weight_fn=ll,
              return_particles=False)

    keys = jax.random.split(jax.random.key(0), 64)

    def batch(use_fused):
        return jax.jit(jax.vmap(
            lambda k: particle_filter_core(
                k, ys, 128, use_fused=use_fused, **kw
            ).loglike
        ))(keys)

    ll_seeded = np.asarray(batch("auto"))
    ll_port = np.asarray(batch(False))
    assert np.isfinite(ll_seeded).all()
    assert len(np.unique(ll_seeded)) > 32  # chains decorrelated
    np.testing.assert_array_equal(np.asarray(batch("auto")), ll_seeded)
    se = ll_port.std() / np.sqrt(len(keys))
    assert abs(ll_seeded.mean() - ll_port.mean()) < 5 * se + 0.5


def test_whole_sweep_kernel_on_device():
    # The whole-sweep SIR kernel is the flagship path and has already
    # broken ONCE in a hardware-only way while CPU CI stayed green: a
    # dynamic-lane-index vector store inside the day fori_loop failed
    # Mosaic lowering (round 3; fixed by register-accumulated estimate
    # columns). Certify on device: compiles+runs, finite loglikes,
    # deterministic per key, chains decorrelated, and distributional
    # agreement with the per-day gillespie_pallas bootstrap filter.
    from bayesssm_tpu.filters.bootstrap import bootstrap_filter
    from bayesssm_tpu.models.sir import simulate_sir, sir_model
    from bayesssm_tpu.ops.sir_sweep_pallas import sir_bpf_sweep

    _, y = simulate_sir(seed=1405)
    ys = jnp.asarray(y, jnp.float32)
    keys = jax.random.split(jax.random.key(0), 256)

    sweep = jax.jit(jax.vmap(
        lambda k: sir_bpf_sweep(k, ys, 128, 0.5, 0.2, 500, 70)[0]
    ))
    ll_sweep = np.asarray(sweep(keys))
    assert np.isfinite(ll_sweep).all()
    assert len(np.unique(ll_sweep)) > 128          # chains decorrelated
    np.testing.assert_array_equal(np.asarray(sweep(keys)), ll_sweep)

    (init_fn, trans_fn, loglik_fn), _, _ = sir_model(
        n_total=500, init_infected=70, transition="gillespie_pallas"
    )
    per_day = jax.jit(jax.vmap(
        lambda k: bootstrap_filter(
            k, ys, 128, init_fn, trans_fn, loglik_fn,
            theta={"lam": 0.5, "gamma": 0.2}, return_particles=False,
        ).loglike
    ))
    ll_day = np.asarray(per_day(jax.random.split(jax.random.key(1), 256)))
    se = np.sqrt(ll_sweep.var() / 256 + ll_day.var() / 256)
    assert abs(ll_sweep.mean() - ll_day.mean()) < 5 * se + 0.1


def test_merge_selection_bit_identical_on_device():
    """selection='merge' vs 'quadratic' on hardware through the per-day
    fused kernel with HOST-drawn positions: identical inputs, and the
    selections are exact algorithms for the same inverse-CDF lookup, so
    the outputs must be BIT-identical. Catches any Mosaic lowering
    divergence in the merge network (rolls, bitcasts, int-key compares)
    that interpret mode cannot see. (The whole-sweep comparison this
    test originally ran died with the bespoke SIR kernel — the sweep
    path is merge-only since round 5.)"""
    from bayesssm_tpu.ops.resampling import _positions
    from bayesssm_tpu.ops.resampling_pallas import fused_weight_resample

    n = 128
    rng = np.random.default_rng(3)

    def one_case(seed):
        key = jax.random.key(seed)
        lw = jnp.asarray(
            rng.normal(size=n) * 3.0, jnp.float32
        )
        pts = jnp.asarray(
            rng.normal(size=(n, 2)).astype(np.float32)
        )
        pos = _positions(
            key, "stratified", (), n, jnp.float32(n), jnp.float32
        )
        uw = jnp.full((n,), np.float32(1.0 / n))
        outs = {}
        for sel in ("quadratic", "merge"):
            outs[sel] = fused_weight_resample(
                lw, pts, pos, uw, jnp.float32(0.0),
                always_resample=True, selection=sel,
            )
        for a, b in zip(outs["quadratic"], outs["merge"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    for seed in range(5):
        one_case(seed)


def test_merge_selection_large_n_on_device():
    """N = 1024 (the Q10-clamp regime) through the merge path: finite,
    reproducible, and masked lanes behave."""
    from bayesssm_tpu.models.sir import simulate_sir
    from bayesssm_tpu.ops.sir_sweep_pallas import sir_filter_sweep

    _, y = simulate_sir(seed=1405)
    ys = jnp.asarray(y, jnp.float32)
    keys = jax.random.split(jax.random.key(5), 32)
    fn = jax.jit(jax.vmap(
        lambda k: sir_filter_sweep(
            k, ys, 1000.0, 0.5, 0.2, 500, 70, max_particles=1024,
            selection="merge",
        )[0]
    ))
    ll = np.asarray(fn(keys))
    assert np.isfinite(ll).all()
    np.testing.assert_array_equal(np.asarray(fn(keys)), ll)


def test_lgss_sweep_kalman_anchor_on_device():
    """The LGSS whole-sweep kernel's log-marginal likelihood matches the
    EXACT Kalman value on hardware (SISR => unbiased estimator). The one
    whole-sweep kernel with an analytic anchor — validates the in-kernel
    Box-Muller normals, Gaussian weights, and merge-selection resample
    end-to-end against ground truth."""
    from bayesssm_tpu.models.lgss import simulate_lgss
    from bayesssm_tpu.ops.lgss_sweep_pallas import lgss_bpf_sweep
    from bayesssm_tpu.utils.kalman import kalman_loglik

    A, SX, SY = 0.9, 0.6, 0.4
    _, y = simulate_lgss(11, t_val=20, a=A, sigma_x=SX, sigma_y=SY)
    ys = jnp.asarray(y, jnp.float32)
    truth = kalman_loglik(y, A, 1.0, SX, SY, p0=1.0)
    C = 512
    fn = jax.jit(jax.vmap(
        lambda k: lgss_bpf_sweep(
            k, ys, 1024, A, SX, SY, resample_algorithm="SISR"
        )[0]
    ))
    ll = np.asarray(fn(jax.random.split(jax.random.key(0), C)), np.float64)
    assert np.isfinite(ll).all()
    se = ll.std() / np.sqrt(C)
    assert abs(ll.mean() - truth) < max(5 * se, 0.1), (ll.mean(), truth)


def test_sweep_builder_on_device():
    """The GENERIC whole-sweep builder (user callbacks traced into the
    kernel) must lower and agree with the portable engine on hardware —
    certifies the callback-in-Mosaic contract (Box-Muller normals,
    merge-selection, SweepRng) beyond the interpreter."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_sweep_builder import PHI, SIG, MU, sv_init, sv_lw, sv_trans

    from bayesssm_tpu.filters.bootstrap import bootstrap_filter
    from bayesssm_tpu.models.stochastic_volatility import (
        simulate_sv,
        sv_model,
    )
    from bayesssm_tpu.ops.sweep_builder import build_sweep_op

    _, y = simulate_sv(seed=3, t_val=10, phi=PHI, sigma=SIG, mu=MU)
    ys = jnp.asarray(y, jnp.float32)
    theta = jnp.array([PHI, SIG, MU], jnp.float32)
    C = 256
    op = build_sweep_op(1, sv_init, sv_trans, sv_lw, 3)
    fn = jax.jit(jax.vmap(lambda k: op(k, ys, theta, 128)[0]))
    ll = np.asarray(fn(jax.random.split(jax.random.key(0), C)), np.float64)
    assert np.isfinite(ll).all()
    np.testing.assert_array_equal(
        np.asarray(fn(jax.random.split(jax.random.key(0), C))), ll
    )
    (init_fn, trans_fn, loglik_fn), _, _ = sv_model()
    fp = jax.jit(jax.vmap(lambda k: bootstrap_filter(
        k, ys, 128, init_fn, trans_fn, loglik_fn,
        theta={"phi": PHI, "sigma": SIG, "mu": MU},
        return_particles=False).loglike))
    llp = np.asarray(
        fp(jax.random.split(jax.random.key(1), C)), np.float64
    )
    se = np.hypot(ll.std(), llp.std()) / np.sqrt(C)
    assert abs(ll.mean() - llp.mean()) < 4 * se + 0.05


def test_mv_gapped_sweep_kalman_anchor_on_device():
    """Round-5 builder extensions on hardware: multivariate observation
    rows (SMEM scalar reads of y[t, :]) AND the in-kernel obs_times
    gap-propagation loop, anchored against an exact gap-aware
    multivariate Kalman recursion — certifies the new kernel codepaths
    (flat y SMEM layout, per-day inner fori_loop over the transition)
    beyond the interpreter."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_lgss_sweep import _kalman_mv_gaps, _simulate_mv, CV, SYV, A, SX

    from bayesssm_tpu.ops.lgss_sweep_pallas import lgss_mv_bpf_sweep

    obs_times = (1, 3, 4, 7, 8, 10, 13, 15)
    gaps = (1, 2, 1, 3, 1, 2, 3, 2)
    y = _simulate_mv(31, None, obs_times=obs_times)
    truth = _kalman_mv_gaps(y, gaps)
    C = 384
    fn = jax.jit(jax.vmap(
        lambda k: lgss_mv_bpf_sweep(
            k, jnp.asarray(y, jnp.float32), 512, A, SX, SYV,
            c_vec=CV, obs_times=obs_times, resample_algorithm="SISR",
        )[0]
    ))
    ll = np.asarray(fn(jax.random.split(jax.random.key(2), C)), np.float64)
    assert np.isfinite(ll).all()
    se = ll.std() / np.sqrt(C)
    assert abs(ll.mean() - truth) < max(5 * se, 0.15), (ll.mean(), truth)


def test_sir_builder_matches_portable_on_device():
    """The SIR builder instance (Gillespie while_loop INSIDE a builder
    callback with counter-threaded RNG + packed (S, I) selection + the
    two-column observation rows) on hardware vs the portable engine."""
    from bayesssm_tpu.models.sir import (
        simulate_sir,
        sir_builder_pf_impl,
        sir_model,
    )
    from bayesssm_tpu.filters.bootstrap import bootstrap_filter

    _, y = simulate_sir(1405, 500, 70, t_max=8)
    ys = jnp.asarray(y, jnp.float32)
    pf = sir_builder_pf_impl(500, 70)(
        y=ys, num_particles=128, param_names=["lam", "gamma"],
        model_fns=None, obs_times=None, algorithm="BPF",
        resample_algorithm="SISAR", resample_fn="stratified",
        carry_weights=False,
    )
    theta = jnp.array([0.5, 0.2], jnp.float32)
    C = 512
    fn = jax.jit(jax.vmap(lambda k: pf(k, theta)[0]))
    ll = np.asarray(fn(jax.random.split(jax.random.key(3), C)), np.float64)
    assert np.isfinite(ll).all()
    # determinism per key on hardware
    np.testing.assert_array_equal(
        np.asarray(fn(jax.random.split(jax.random.key(3), C))), ll
    )
    (init_fn, trans_fn, loglik_fn), _, _ = sir_model(
        500, 70, transition="gillespie_pallas"
    )
    fp = jax.jit(jax.vmap(lambda k: bootstrap_filter(
        k, ys, 128, init_fn, trans_fn, loglik_fn,
        theta={"lam": 0.5, "gamma": 0.2},
        return_particles=False).loglike))
    llp = np.asarray(fp(jax.random.split(jax.random.key(4), C)), np.float64)
    se = np.hypot(ll.std(), llp.std()) / np.sqrt(C)
    assert abs(ll.mean() - llp.mean()) < 4 * se + 0.1
