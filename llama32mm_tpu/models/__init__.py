from llama32mm_tpu.models.language import (
    causal_lm_forward,
    init_causal_lm_params,
    init_llama_params,
    llama_forward,
    lm_head_apply,
    prepare_attention_mask,
    prepare_position_ids,
)
from llama32mm_tpu.models.vision import init_vision_params, patchify, vision_encoder_forward
from llama32mm_tpu.models.vlm import (
    VLMOutput,
    encode_image,
    init_vlm_params,
    merge_input_ids_with_image_features,
    shifted_cross_entropy,
    vlm_forward,
)

__all__ = [
    "causal_lm_forward",
    "init_causal_lm_params",
    "init_llama_params",
    "llama_forward",
    "lm_head_apply",
    "prepare_attention_mask",
    "prepare_position_ids",
    "init_vision_params",
    "patchify",
    "vision_encoder_forward",
    "VLMOutput",
    "encode_image",
    "init_vlm_params",
    "merge_input_ids_with_image_features",
    "shifted_cross_entropy",
    "vlm_forward",
]
