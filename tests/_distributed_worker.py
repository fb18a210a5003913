"""Worker process for the 2-process jax.distributed smoke test.

Run by tests/test_distributed.py as ``python _distributed_worker.py
<process_id> <port>`` with XLA_FLAGS forcing 2 virtual CPU devices per
process. Exercises parallel/distributed.py end-to-end: initialize() ->
global_chain_mesh() -> a cross-process collective -> one particle-sharded
filter step over the global (chains, particles) mesh.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from bayesssm_tpu.parallel.distributed import (  # noqa: E402
    global_chain_mesh,
    initialize,
)


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2
    assert len(jax.devices()) == 4

    mesh = global_chain_mesh(particle_axis_size=2)
    assert dict(mesh.shape) == {"chains": 2, "particles": 2}, mesh.shape

    # Cross-process collective through the global mesh: sum of a
    # chains-sharded array, returned replicated.
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("chains"))
    x = jax.make_array_from_callback(
        (8,), sh, lambda idx: np.arange(8.0, dtype=np.float32)[idx]
    )
    total = jax.jit(
        jnp.sum, out_shardings=NamedSharding(mesh, P())
    )(x)
    assert float(total) == 28.0, float(total)

    # One particle-sharded filter step over the DCN+ICI mesh: chains over
    # processes, particles over each process's devices.
    from bayesssm_tpu.models.lgss import lgss_model, simulate_lgss
    from bayesssm_tpu.parallel.sharded import sharded_bootstrap_filter

    (init_fn, trans_fn, loglik_fn), _, _ = lgss_model()
    _, y = simulate_lgss(1, t_val=4)
    theta = {
        "a": np.full(2, 0.8, np.float32),
        "sigma_x": np.full(2, 0.5, np.float32),
        "sigma_y": np.full(2, 0.4, np.float32),
    }
    ll, se = sharded_bootstrap_filter(
        jax.random.key(0), np.asarray(y, np.float32), 64, init_fn,
        trans_fn, loglik_fn, theta, num_chains=2, mesh=mesh,
    )
    ll_sum = jax.jit(
        jnp.sum, out_shardings=NamedSharding(mesh, P())
    )(ll)
    assert np.isfinite(float(ll_sum)), float(ll_sum)

    # ---- the FULL public pmmh() across the 2-process mesh ----
    # The lift of the reference's cores-invariance contract
    # (/root/reference/tests/testthat/test-pmmh.R:468-503): the tuned
    # two-phase driver (pilot tuning, host sync, chunked sampling) runs
    # end-to-end on a process-spanning chains mesh; every process gathers
    # the identical full chain array. The parent test asserts both
    # workers' digests agree, and compares them against the same-seed
    # single-process run.
    from _pmmh_dist_config import digest, run_pmmh_dist

    pmmh_mesh = global_chain_mesh(particle_axis_size=1)
    assert dict(pmmh_mesh.shape)["chains"] == 4
    out = run_pmmh_dist(pmmh_mesh)
    print(f"PMMH DIGEST {digest(out)}", flush=True)

    # ---- pmmh() with the PARTICLE axis sharded across processes ----
    # Both phases then run inside shard_map over the 2x2 process-spanning
    # mesh: weight normalization/ESS complete over pmax/psum and
    # resampling goes through the distributed inverse-CDF path, with
    # per-shard model streams — the deepest multi-host execution mode.
    import warnings

    from bayesssm_tpu.pmmh.driver import pmmh as _pmmh
    from bayesssm_tpu.pmmh.tuning import default_tune_control

    ps_mesh = global_chain_mesh(particle_axis_size=2)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out_ps = _pmmh(
            "bootstrap_filter", np.asarray(y, np.float32), 8,
            init_fn, trans_fn, loglik_fn,
            {
                "a": lambda v: jnp.where(jnp.abs(v) < 1, 0.0, -jnp.inf),
                "sigma_x": lambda v: jnp.where(v > 0, -v, -jnp.inf),
                "sigma_y": lambda v: jnp.where(v > 0, -v, -jnp.inf),
            },
            pilot_init_params={"a": 0.8, "sigma_x": 0.5, "sigma_y": 0.4},
            burn_in=2, num_chains=2, seed=11,
            tune_control=default_tune_control(
                pilot_m=8, pilot_burn_in=2, pilot_reps=2
            ),
            mesh=ps_mesh, print_summary=False,
        )
    chains_ps = np.stack(
        [out_ps.theta_chain[p] for p in sorted(out_ps.theta_chain)],
        axis=-1,
    )
    assert chains_ps.shape == (2, 6, 3), chains_ps.shape
    assert np.isfinite(chains_ps).all()
    print(
        "PMMH PS-DIGEST "
        + np.array2string(
            chains_ps.astype(np.float64), precision=6, separator=",",
            threshold=10_000, floatmode="fixed",
        ).replace("\n", ""),
        flush=True,
    )

    # ---- multi-process checkpoint/resume (SURVEY §5 checkpoint row) ----
    # A preempted multi-host run must resume and bit-match an
    # uninterrupted run with the same chunking: run 6 of 12 steps with a
    # checkpoint (the simulated preemption point), resume to 12, and
    # compare against a straight-through 12-step run chunked identically.
    # Every process writes/reads the same full snapshot (identical
    # content; per-process tmp names make the shared-FS renames safe).
    import os

    ck_dir = os.environ.get("BSSM_CK_DIR")
    if ck_dir:
        from _pmmh_dist_config import run_pmmh_ck

        ck_a = os.path.join(ck_dir, "dist_interrupted.npz")
        ck_b = os.path.join(ck_dir, "dist_plain.npz")
        run_pmmh_ck(
            pmmh_mesh, m=6, checkpoint_every=6, checkpoint_path=ck_a
        )
        resumed = run_pmmh_ck(
            pmmh_mesh, m=12, checkpoint_path=ck_a, resume=True,
            checkpoint_every=6,
        )
        plain = run_pmmh_ck(
            pmmh_mesh, m=12, checkpoint_every=6, checkpoint_path=ck_b
        )
        for p in plain.theta_chain:
            np.testing.assert_array_equal(
                plain.theta_chain[p], resumed.theta_chain[p]
            )
        print("PMMH CK-RESUME BIT-MATCH OK", flush=True)

    jax.distributed.shutdown()
    print(f"WORKER {pid} OK", flush=True)


if __name__ == "__main__":
    main()
