from llama32mm_tpu.parallel.mesh import create_mesh
from llama32mm_tpu.parallel.sharding import (
    data_sharding,
    kv_cache_sharding,
    lora_shardings,
    param_shardings,
    seq_data_sharding,
    shard_params,
    zero1_shardings,
)

__all__ = [
    "create_mesh",
    "data_sharding",
    "kv_cache_sharding",
    "lora_shardings",
    "param_shardings",
    "seq_data_sharding",
    "shard_params",
    "zero1_shardings",
]
