"""Platform dispatch for fused ops: Pallas on TPU, pure-XLA elsewhere.

This is the TPU-native analogue of the reference's extension gate
(``Model/model.py:8-10,165`` — use the CUDA kernel iff it imported and the
tensor is CUDA fp16/bf16; otherwise fall back to plain ops).
"""

from __future__ import annotations

import os

import jax

_VALID = ("auto", "pallas", "xla")


def _pallas_available() -> bool:
    try:
        import llama32mm_tpu.ops.pallas  # noqa: F401

        return True
    except ImportError:
        return False


def default_impl() -> str:
    env = os.environ.get("LLAMA32MM_OPS_IMPL", "").strip().lower()
    if env in ("pallas", "xla"):
        return env
    return "pallas" if (jax.default_backend() == "tpu" and _pallas_available()) else "xla"


def resolve_impl(impl: str = "auto") -> str:
    if impl not in _VALID:
        raise ValueError(f"impl must be one of {_VALID}, got {impl!r}")
    return default_impl() if impl == "auto" else impl


def resolve_impl_prefer_xla(impl: str = "auto") -> str:
    """Per-op resolver for ops where XLA's fusion beats the standalone Pallas
    kernel at every measured shape (swiglu, add-rmsnorm — v5e): ``auto``
    resolves to XLA; an explicit argument or the LLAMA32MM_OPS_IMPL env var
    still forces either backend."""
    if impl not in _VALID:
        raise ValueError(f"impl must be one of {_VALID}, got {impl!r}")
    if impl != "auto":
        return impl
    env = os.environ.get("LLAMA32MM_OPS_IMPL", "").strip().lower()
    if env in ("pallas", "xla"):
        return env
    return "xla"
