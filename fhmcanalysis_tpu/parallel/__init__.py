from .mesh import (
    grid_mesh,
    replicate,
    shard_axis,
    shard_map_mu_sweep,
    sharded_make_grid,
    sharded_mu_beta_sweep,
    sharded_trace_coexistence,
)

__all__ = [
    "grid_mesh",
    "replicate",
    "shard_axis",
    "shard_map_mu_sweep",
    "sharded_make_grid",
    "sharded_mu_beta_sweep",
    "sharded_trace_coexistence",
]
