"""Device-mesh helpers for chain-parallel PMMH.

The reference's only parallelism is one OS process per MCMC chain
(/root/reference/R/pmmh.R:512-531, `future_lapply`). The TPU-native
equivalent: chains are the leading axis of every per-chain array, and that
axis is sharded over a ``jax.sharding.Mesh`` axis named ``"chains"`` —
no communication during sampling, collectives only at the diagnostics
boundary (SURVEY.md §5). A second mesh axis ``"particles"`` is reserved for
sharding the particle dimension of very large filters.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_chain_mesh", "shard_chain_tree", "chain_sharding"]


def make_chain_mesh(
    n_devices: int | None = None,
    particle_axis_size: int = 1,
    devices=None,
) -> Mesh:
    """Create a ``("chains", "particles")`` mesh.

    By default all local devices go on the chains axis (the embarrassingly
    parallel direction); ``particle_axis_size`` > 1 carves devices off for
    particle-axis sharding.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if n_devices % particle_axis_size != 0:
        raise ValueError("n_devices must be divisible by particle_axis_size")
    shape = (n_devices // particle_axis_size, particle_axis_size)
    return Mesh(devices.reshape(shape), ("chains", "particles"))


def chain_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that splits axis 0 (chains) across the chains mesh axis."""
    return NamedSharding(mesh, P("chains"))


def shard_chain_tree(tree, mesh: Mesh):
    """Device-put every array in a pytree with its axis 0 sharded on chains."""
    sh = chain_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
