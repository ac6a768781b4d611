from llama32mm_tpu.inference.engine import (
    InferenceEngine,
    build_decode_mask,
    build_prefill_mask,
    structured_decode_mask,
    structured_prefill_mask,
)
from llama32mm_tpu.inference.server import ContinuousBatchingServer


def __getattr__(name):
    # http front-end imported lazily (pulls in http.server/threading only
    # when actually serving)
    if name == "ServingFrontend":
        from llama32mm_tpu.inference.http_server import ServingFrontend

        return ServingFrontend
    raise AttributeError(name)


__all__ = [
    "InferenceEngine",
    "ContinuousBatchingServer",
    "ServingFrontend",
    "build_decode_mask",
    "build_prefill_mask",
    "structured_decode_mask",
    "structured_prefill_mask",
]
