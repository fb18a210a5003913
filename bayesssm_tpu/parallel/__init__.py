from bayesssm_tpu.parallel.mesh import make_chain_mesh, shard_chain_tree

__all__ = ["make_chain_mesh", "shard_chain_tree"]
