"""llama32mm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) LLaMA-3.2 multimodal
framework with the capabilities of emmanuelalo52/LLaMA-3.2-Multimodal.

Public API parity surface (north star): ``MLLAMAConfig``,
``MllamaForConditionalGeneration`` (functional: ``init_vlm_params`` +
``vlm_forward``, plus an object wrapper), ``load_hf_model``, ``Linear_LORA``
(functional: ``llama32mm_tpu.train.lora``).
"""

from llama32mm_tpu.configs import (
    LLAMA32Config,
    MLLAMAConfig,
    VisionEncoderConfig,
    llama32_11b_vision_config,
    llama32_90b_vision_config,
    tiny_mllama_config,
)
from llama32mm_tpu.models import init_vlm_params, vlm_forward
from llama32mm_tpu.utils.kvcache import KVCache, init_kv_cache

__version__ = "0.1.0"

# Lazy top-level re-exports for reference-API ergonomics (the heavy deps —
# transformers, PIL — load only when the symbol is touched).
_LAZY_EXPORTS = {
    "MllamaForConditionalGeneration": "llama32mm_tpu.models.wrapper",
    "Llama3ForCausalLM": "llama32mm_tpu.models.wrapper",
    "Llama3Model": "llama32mm_tpu.models.wrapper",
    "LLAMARMSNorm": "llama32mm_tpu.ops.rmsnorm",
    "FusedSwiGLU": "llama32mm_tpu.ops.swiglu",
    "load_hf_model": "llama32mm_tpu.io.checkpoint",
    "MllamaImageProcessor": "llama32mm_tpu.preprocess.processor",
    "Linear_LORA": "llama32mm_tpu.train.lora",
    "InferenceEngine": "llama32mm_tpu.inference.engine",
    "ContinuousBatchingServer": "llama32mm_tpu.inference.server",
    "ServingFrontend": "llama32mm_tpu.inference.http_server",
    "perplexity": "llama32mm_tpu.evaluate",
    "agreement": "llama32mm_tpu.evaluate",
}


def __getattr__(name: str):
    mod = _LAZY_EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module 'llama32mm_tpu' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod), name)


__all__ = [
    *_LAZY_EXPORTS,
    "LLAMA32Config",
    "MLLAMAConfig",
    "VisionEncoderConfig",
    "llama32_11b_vision_config",
    "llama32_90b_vision_config",
    "tiny_mllama_config",
    "init_vlm_params",
    "vlm_forward",
    "KVCache",
    "init_kv_cache",
    "__version__",
]
