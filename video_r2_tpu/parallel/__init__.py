from .mesh import MeshConfig, make_mesh
from .pipeline import pipeline_decoder_forward
from .sharding import (
    batch_sharding,
    param_shardings,
    replicated,
    shard_params,
)

__all__ = [
    "MeshConfig", "make_mesh", "pipeline_decoder_forward",
    "batch_sharding", "param_shardings", "replicated", "shard_params",
]
