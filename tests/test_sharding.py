"""Mesh-sharding tests on the 8-device virtual CPU mesh.

The reference's strongest execution-model contract is that results are
identical whether chains run on 1 or 2 cores (test-pmmh.R:468-503). The
TPU-native analogue, in two tiers:

  * bit-exact reproducibility for a fixed (key, mesh layout) — chain RNG
    derives from fold_in(key, chain_index), never from device placement;
  * statistical equivalence across mesh layouts: XLA compiles different
    partitionings to different (but each deterministic) reduction orders,
    so individual MH accept decisions can flip at the ULP level; the
    tuning outputs and posterior distributions must still agree.
"""

import warnings

import jax
import numpy as np
import pytest

from bayesssm_tpu.models.lgss import lgss_model, simulate_lgss
from bayesssm_tpu.parallel.mesh import make_chain_mesh, shard_chain_tree
from bayesssm_tpu.pmmh.driver import pmmh
from bayesssm_tpu.pmmh.tuning import default_tune_control

(MODEL_FNS, LOG_PRIORS, TRANSFORM) = lgss_model()
INIT_FN, TRANSITION_FN, LOGLIK_FN = MODEL_FNS
_, Y = simulate_lgss(3, t_val=12)

FAST_TUNE = default_tune_control(pilot_m=40, pilot_reps=8, pilot_n=50)


def run(mesh=None, num_chains=8, seed=77):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return pmmh(
            "bootstrap_filter", Y, m=60,
            init_fn=INIT_FN, transition_fn=TRANSITION_FN,
            log_likelihood_fn=LOGLIK_FN, log_priors=LOG_PRIORS,
            pilot_init_params=[{"a": 0.5, "sigma_x": 0.5, "sigma_y": 0.5}]
            * num_chains,
            burn_in=20, num_chains=num_chains, seed=seed,
            param_transform=TRANSFORM, tune_control=FAST_TUNE,
            mesh=mesh, print_summary=False,
        )


def test_devices_available():
    assert len(jax.devices()) == 8
    assert jax.devices()[0].platform == "cpu"


@pytest.fixture(scope="module")
def m8_result():
    # Shared across the bit-exactness and layout-invariance tests (one
    # fewer full PMMH pipeline compile per suite run).
    return run(mesh=make_chain_mesh(8))


def test_fixed_layout_bit_exact(m8_result):
    o1 = m8_result
    o2 = run(mesh=make_chain_mesh(8))
    for p in o1.theta_chain:
        np.testing.assert_array_equal(o1.theta_chain[p], o2.theta_chain[p])
    np.testing.assert_array_equal(o1.target_n, o2.target_n)


def test_mesh_layout_statistical_invariance(m8_result):
    # No mesh vs 8-way chain sharding vs 4x2 chains-by-particles mesh.
    # The repo's invariance contract (CLAUDE.md) is bit-exactness for a
    # FIXED layout and STATISTICAL invariance across layouts: different
    # partitionings compile to different reduction orders, a ULP flip can
    # swing a pilot-phase MH accept, and a flipped accept moves that
    # chain's Var(loglik) estimate (and so its tuned target_n) wholesale.
    # So: posteriors agree within MC noise, and the per-chain tuning/first
    # samples agree on all but a couple of knife-edge chains.
    # m42 has a REAL particles axis (size 2): since round 3 that routes
    # pmmh through the collective sharded filter whose per-shard model RNG
    # derives from fold_in(key, shard_index) — a different (equally valid)
    # noise realization, so only the distributional checks apply to it.
    base = run(mesh=None)
    m8 = m8_result
    m42 = run(mesh=make_chain_mesh(8, particle_axis_size=2))
    for other in (m8, m42):
        assert other.target_n.min() >= 50 and other.target_n.max() <= 1000
        for p in base.theta_chain:
            assert abs(
                base.theta_chain[p].mean() - other.theta_chain[p].mean()
            ) < 0.25
    # ps=1 layouts additionally run the SAME program modulo partitioning:
    # per-chain tuning and first kept samples agree on all but the odd
    # knife-edge chain (a ULP flip in a pilot accept moves that chain's
    # Var(loglik) and so its target_n wholesale).
    eq = np.asarray(base.target_n) == np.asarray(m8.target_n)
    assert eq.sum() >= len(eq) - 2, (base.target_n, m8.target_n)
    for p in base.theta_chain:
        a = base.theta_chain[p][:, 0]
        b = m8.theta_chain[p][:, 0]
        close = np.isclose(a, b, rtol=1e-4)
        assert close.sum() >= len(close) - 2, (p, a, b)


def test_pmmh_particle_sharded_matches_unsharded():
    # Round-2 VERDICT item 1: pmmh(mesh) with a particles axis > 1 must
    # route every filter evaluation (tuning AND sampling) through the
    # collective sharded core. 2 chains-axis x 4 particles-axis layout vs
    # the unsharded run: per-shard model RNG differs by construction
    # (fold_in(key, shard_index)), so the comparison is distributional.
    mesh24 = make_chain_mesh(8, particle_axis_size=4)
    sharded = run(mesh=mesh24, num_chains=4, seed=11)
    base = run(mesh=None, num_chains=4, seed=11)
    for p in base.theta_chain:
        assert np.isfinite(sharded.theta_chain[p]).all()
        assert abs(
            base.theta_chain[p].mean() - sharded.theta_chain[p].mean()
        ) < 0.3, p
        assert sharded.theta_chain[p].shape == base.theta_chain[p].shape
    # Tuned particle counts come from the same clamp rule on both paths.
    assert sharded.target_n.min() >= 50 and sharded.target_n.max() <= 1000
    # Sampling moved: at least one chain accepted something.
    assert np.asarray(sharded.acceptance_rate).max() > 0.0


def test_pmmh_particle_sharded_rejects_pf_impl():
    mesh24 = make_chain_mesh(8, particle_axis_size=4)
    with pytest.raises(ValueError, match="single-shard"):
        pmmh(
            "bootstrap_filter", Y, m=4,
            init_fn=INIT_FN, transition_fn=TRANSITION_FN,
            log_likelihood_fn=LOGLIK_FN, log_priors=LOG_PRIORS,
            pilot_init_params={"a": 0.5, "sigma_x": 0.5, "sigma_y": 0.5},
            burn_in=1, num_chains=2, seed=1,
            param_transform=TRANSFORM, tune_control=FAST_TUNE,
            mesh=mesh24, print_summary=False,
            pf_impl=lambda *a, **k: None,
        )


def test_sharded_filter_matches_unsharded():
    from jax.sharding import NamedSharding, PartitionSpec as P
    import jax.numpy as jnp
    from bayesssm_tpu.filters.bootstrap import bootstrap_filter

    mesh = make_chain_mesh(8)
    keys = jax.random.split(jax.random.key(5), 16)

    def batched(ks):
        def one(k):
            return bootstrap_filter(
                k, Y, 64, INIT_FN, TRANSITION_FN, LOGLIK_FN,
                theta={"a": 0.8, "sigma_x": 0.5, "sigma_y": 0.4},
                return_particles=False,
            ).loglike
        return jax.vmap(one)(ks)

    plain = jax.jit(batched)(keys)
    sharded = jax.jit(
        batched, in_shardings=NamedSharding(mesh, P("chains"))
    )(jax.device_put(keys, NamedSharding(mesh, P("chains"))))
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(sharded), rtol=1e-6
    )


def test_graft_dryrun_runs():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)
    graft.dryrun_multichip(2)


def test_shard_chain_tree():
    mesh = make_chain_mesh(8)
    import jax.numpy as jnp

    tree = {"a": jnp.zeros((16, 3)), "b": jnp.ones((16,))}
    sharded = shard_chain_tree(tree, mesh)
    assert sharded["a"].sharding.spec == jax.sharding.PartitionSpec("chains")
