from .mesh import make_mesh, local_mesh
from .sharding import (
    decoder_param_sharding,
    encoder_param_sharding,
    kv_cache_sharding,
    replicated,
    shard_params,
)

__all__ = [
    "make_mesh",
    "local_mesh",
    "decoder_param_sharding",
    "encoder_param_sharding",
    "kv_cache_sharding",
    "replicated",
    "shard_params",
]
