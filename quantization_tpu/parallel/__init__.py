from .mesh import (
    batch_only_sharding,
    data_sharding,
    init_distributed,
    make_mesh,
    quantizer_param_sharding,
    replicated_sharding,
    shard_batch,
    shard_params,
)

__all__ = [
    "batch_only_sharding",
    "data_sharding",
    "init_distributed",
    "make_mesh",
    "quantizer_param_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_params",
]
