"""TPU-native compute ops.

Each op exposes a single public entry point with a platform-dispatch seam:
the pure-jnp fallback reproduces the reference's PyTorch CPU-fallback math
bit-for-bit in fp32 (SURVEY.md §2.9 items 1-6), while the Pallas path targets
the TPU MXU/VPU with fp32 accumulation matching the reference CUDA kernels'
semantics (rmsnorm.cuh:36,60; swiglu.cu silu-in-compute-dtype).

Selection: ``impl="auto"`` uses Pallas on TPU, XLA elsewhere; override with the
``LLAMA32MM_OPS_IMPL`` env var (``pallas`` | ``xla``) or per-call.
"""

from llama32mm_tpu.ops.dispatch import default_impl, resolve_impl
from llama32mm_tpu.ops.rmsnorm import fused_add_rmsnorm
from llama32mm_tpu.ops.swiglu import fused_swiglu, swiglu_down
from llama32mm_tpu.ops.rope import rope_cos_sin, apply_rotary_pos_emb, rotate_half
from llama32mm_tpu.ops.attention import gqa_attention

__all__ = [
    "default_impl",
    "resolve_impl",
    "fused_add_rmsnorm",
    "fused_swiglu",
    "swiglu_down",
    "rope_cos_sin",
    "apply_rotary_pos_emb",
    "rotate_half",
    "gqa_attention",
]
