"""Pallas TPU kernels — the TPU-native equivalents of the reference's CUDA
kernels (Tools/rmsnorm/rmsnorm.cuh, Tools/swiglu/swiglu.cu) plus the blockwise
GQA attention the reference lacks (it materializes the full T² score matrix,
Model/model.py:249-253).

Kernels run compiled on TPU and in interpreter mode elsewhere (the
sanitizer-equivalent for kernel logic, SURVEY §5 'Race detection')."""

from llama32mm_tpu.ops.pallas.common import use_interpret

__all__ = ["use_interpret"]
