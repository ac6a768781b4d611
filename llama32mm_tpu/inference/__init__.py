from llama32mm_tpu.inference.engine import (
    InferenceEngine,
    build_decode_mask,
    build_prefill_mask,
    structured_decode_mask,
    structured_prefill_mask,
)
from llama32mm_tpu.inference.server import ContinuousBatchingServer

__all__ = [
    "InferenceEngine",
    "ContinuousBatchingServer",
    "build_decode_mask",
    "build_prefill_mask",
    "structured_decode_mask",
    "structured_prefill_mask",
]
