from .mesh import MeshConfig, make_mesh
from .sharding import (
    batch_sharding,
    param_shardings,
    replicated,
    shard_params,
)

__all__ = [
    "MeshConfig", "make_mesh",
    "batch_sharding", "param_shardings", "replicated", "shard_params",
]
