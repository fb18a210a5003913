"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices (the real environment
has a single TPU chip). The interpreter in this environment preimports JAX
with a TPU platform pinned via env, so the override must go through
``jax.config`` (env vars alone are latched too late), and XLA_FLAGS must be
set before the CPU backend initializes.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib  # noqa: E402

import jax  # noqa: E402

# BAYESSSM_TPU_TESTS=1 leaves the real TPU backend attached so
# tests/test_tpu_hardware.py can exercise hardware-only kernel contracts;
# everything else in the suite assumes the 8-device CPU mesh and should
# not be run in that mode.
_TPU_MODE = os.environ.get("BAYESSSM_TPU_TESTS") == "1"
if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles many near-identical
# XLA programs (PMMH pipelines, shard_map filters); caching them on disk
# cuts repeat-run wall time sharply and lets xdist workers share work
# across runs. Safe to delete the directory at any time.
_cache_dir = pathlib.Path(__file__).parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

if not _TPU_MODE:
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8
