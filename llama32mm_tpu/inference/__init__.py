from llama32mm_tpu.inference.engine import (
    InferenceEngine,
    build_decode_mask,
    build_prefill_mask,
    structured_decode_mask,
    structured_prefill_mask,
)

__all__ = [
    "InferenceEngine",
    "build_decode_mask",
    "build_prefill_mask",
    "structured_decode_mask",
    "structured_prefill_mask",
]
