from llama32mm_tpu.parallel.mesh import create_mesh
from llama32mm_tpu.parallel.pipeline import (
    make_pipeline_lora_train_step,
    make_pipeline_train_step,
    pipeline_causal_lm_loss,
    pipeline_decoder_hidden,
    pipeline_shard_lora,
    pipeline_shard_params,
)
from llama32mm_tpu.parallel.sharding import (
    data_sharding,
    kv_cache_sharding,
    lora_shardings,
    param_shardings,
    seq_data_sharding,
    shard_params,
    vision_block_shardings,
    zero1_shardings,
)

__all__ = [
    "create_mesh",
    "data_sharding",
    "kv_cache_sharding",
    "lora_shardings",
    "make_pipeline_lora_train_step",
    "make_pipeline_train_step",
    "pipeline_shard_lora",
    "param_shardings",
    "pipeline_causal_lm_loss",
    "pipeline_decoder_hidden",
    "pipeline_shard_params",
    "seq_data_sharding",
    "shard_params",
    "vision_block_shardings",
    "zero1_shardings",
]
