from .mesh import grid_mesh, replicate, shard_axis, sharded_mu_beta_sweep

__all__ = ["grid_mesh", "replicate", "shard_axis", "sharded_mu_beta_sweep"]
