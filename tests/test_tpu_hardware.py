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
    """selection='merge' vs 'quadratic' on hardware: at N = 128 both
    modes run the same chain blocking (B = 128), hence identical
    in-kernel PRNG streams — the selections are exact algorithms for the
    same lookup, so the outputs must be BIT-identical. Catches any
    Mosaic lowering divergence in the merge network (rolls, bitcasts,
    int-key compares) that interpret mode cannot see."""
    from bayesssm_tpu.models.sir import simulate_sir
    from bayesssm_tpu.ops.sir_sweep_pallas import (
        _chains_per_program,
        sir_filter_sweep,
    )

    import bayesssm_tpu.ops.sir_sweep_pallas as sw

    _, y = simulate_sir(seed=1405)
    ys = jnp.asarray(y, jnp.float32)
    keys = jax.random.split(jax.random.key(3), 256)
    # Equal blocking is the precondition for identical PRNG streams; the
    # merge default block cap (256) is larger than the quadratic path's
    # N=128 blocking, so pin it for this comparison.
    cap = sw._MERGE_BLOCK_CAP
    sw._MERGE_BLOCK_CAP = 128
    sw._make_op.cache_clear()
    try:
        assert _chains_per_program(256, 128, "quadratic") == \
            sw._chains_per_program(256, 128, "merge")
        outs = {}
        for sel in ("quadratic", "merge"):
            fn = jax.jit(jax.vmap(
                lambda k, sel=sel: sir_filter_sweep(
                    k, ys, 128, 0.5, 0.2, 500, 70, selection=sel
                )
            ))
            ll, se = fn(keys)
            outs[sel] = (np.asarray(ll), np.asarray(se))
    finally:
        sw._MERGE_BLOCK_CAP = cap
        sw._make_op.cache_clear()
    np.testing.assert_array_equal(outs["quadratic"][0], outs["merge"][0])
    np.testing.assert_array_equal(outs["quadratic"][1], outs["merge"][1])


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
