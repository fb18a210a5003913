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
def test_two_process_distributed_smoke():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(_REPO) + os.pathsep + env.get("PYTHONPATH", "")
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
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER {pid} OK" in out, out
