from llama32mm_tpu.train.accum import accumulate_grads, valid_target_count
from llama32mm_tpu.train.data import (
    DataState,
    PackedBatchIterator,
    pack_documents,
    prefetch_to_device,
)
from llama32mm_tpu.train.full import (
    FullTrainState,
    load_full_train_state,
    make_optimizer,
    make_train_step,
    save_full_train_state,
    split_trainable,
)
from llama32mm_tpu.train.lora import (
    Linear_LORA,
    init_lora_params,
    lora_train_step,
    make_lora_train_step,
    merge_lora_into_params,
    save_lora_adapters,
    load_lora_adapters,
    stack_adapter_bank,
    gather_adapter_bank,
    zero_lora_params,
)

__all__ = [
    "DataState",
    "PackedBatchIterator",
    "accumulate_grads",
    "pack_documents",
    "prefetch_to_device",
    "valid_target_count",
    "FullTrainState",
    "load_full_train_state",
    "make_optimizer",
    "make_train_step",
    "save_full_train_state",
    "split_trainable",
    "Linear_LORA",
    "init_lora_params",
    "lora_train_step",
    "make_lora_train_step",
    "merge_lora_into_params",
    "save_lora_adapters",
    "load_lora_adapters",
    "stack_adapter_bank",
    "gather_adapter_bank",
    "zero_lora_params",
]
