from llama32mm_tpu.inference.engine import InferenceEngine, build_prefill_mask, build_decode_mask

__all__ = ["InferenceEngine", "build_prefill_mask", "build_decode_mask"]
