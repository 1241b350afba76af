from .bulk import decode_sharded, encode_sharded
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
    "decode_sharded",
    "encode_sharded",
    "data_sharding",
    "init_distributed",
    "make_mesh",
    "quantizer_param_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_params",
]
