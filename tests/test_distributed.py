"""2-process jax.distributed smoke test (subprocess harness).

The reference is strictly single-machine; the framework's multi-host entry
point (parallel/distributed.py) was previously exercised by no test. Here
two OS processes form a real jax.distributed cluster over localhost (2
virtual CPU devices each -> a global 4-device (2 chains x 2 particles)
mesh) and run a cross-process collective plus one particle-sharded filter
step — the minimal end-to-end pass through initialize() +
global_chain_mesh() + the collective filter core.
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

_HERE = pathlib.Path(__file__).parent
_REPO = _HERE.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(_REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # Shared checkpoint dir: both processes write/rename the same
    # snapshot paths (the shared-filesystem multi-writer case) and the
    # worker asserts kill-at-step-6 -> resume bit-matches uninterrupted.
    env["BSSM_CK_DIR"] = str(tmp_path)
    # The coordinator service and per-process backends are isolated from
    # the parent's (this pytest process never initializes distributed).
    procs = [
        subprocess.Popen(
            [sys.executable, str(_HERE / "_distributed_worker.py"),
             str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=str(_REPO),
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER {pid} OK" in out, out
        assert "PMMH CK-RESUME BIT-MATCH OK" in out, out

    # Full-run cross-process contract (test-pmmh.R:468-503 lift): every
    # process gathers the identical full chain array — for the plain
    # chains mesh AND the particle-sharded (shard_map) mesh.
    for tag in ("PMMH DIGEST ", "PMMH PS-DIGEST "):
        digests = []
        for out in outs:
            lines = [ln for ln in out.splitlines() if ln.startswith(tag)]
            assert len(lines) == 1, (tag, out)
            digests.append(lines[0])
        assert digests[0] == digests[1], "\n--- vs ---\n".join(digests)


@pytest.mark.slow
def test_two_process_pmmh_matches_single_process():
    """Same seed, same 4-way chains mesh: a 2-process pmmh() run and a
    single-process run produce the same chains.

    Per-chain RNG is fold_in(root_key, chain_id) and no cross-chain
    reduction exists in the sampling phases, so the result is invariant
    to how chains are laid out over processes (CLAUDE.md notes ULP-level
    reduction differences can in principle flip MH accepts across
    layouts; this test pins the common case with a loose fallback).
    """
    import numpy as np

    sys.path.insert(0, str(_HERE))
    from _pmmh_dist_config import digest, run_pmmh_dist

    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:4]).reshape(4, 1)
    out_single = run_pmmh_dist(Mesh(devices, ("chains", "particles")))
    single_digest = "PMMH DIGEST " + digest(out_single)

    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(_REPO) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(_HERE / "_distributed_worker.py"),
             str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=str(_REPO),
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    worker_digests = [
        ln for out in outs for ln in out.splitlines()
        if ln.startswith("PMMH DIGEST ")
    ]
    assert len(worker_digests) == 2
    assert worker_digests[0] == worker_digests[1]
    assert worker_digests[0] == single_digest, (
        "2-process pmmh() diverged from the single-process run:\n"
        f"{worker_digests[0]}\n--- vs ---\n{single_digest}"
    )
