from .mesh import (
    grid_mesh,
    replicate,
    shard_axis,
    shard_map_mu_sweep,
    sharded_make_grid,
    sharded_mu_beta_sweep,
    sharded_joint_state_sweep,
    sharded_pore_state_sweep,
    sharded_trace_coexistence,
)
from .surface import (
    sharded_normalize_2d,
    sharded_normalize_long,
    sharded_relextrema,
    sharded_stencil_flags,
)

__all__ = [
    "grid_mesh",
    "replicate",
    "shard_axis",
    "shard_map_mu_sweep",
    "sharded_make_grid",
    "sharded_mu_beta_sweep",
    "sharded_joint_state_sweep",
    "sharded_pore_state_sweep",
    "sharded_trace_coexistence",
    "sharded_normalize_2d",
    "sharded_normalize_long",
    "sharded_relextrema",
    "sharded_stencil_flags",
]
