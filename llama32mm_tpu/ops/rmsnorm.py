"""Fused Add-RMSNorm.

TPU-native replacement for the reference CUDA kernel
(``Tools/rmsnorm/rmsnorm.cuh:13-108`` forward, ``:110-154`` backward) and its
PyTorch fallback (``Model/model.py:158-171``).

Semantics:

- **xla fallback** (parity path): matches the reference CPU fallback exactly —
  optional ``x = x + residual``, variance computed **in the input dtype** (no
  fp32 upcast; ``Model/model.py:169-171``), ``x * rsqrt(var + eps) * weight``.
- **pallas path**: one VMEM pass computing the residual add, an fp32
  sum-of-squares reduction (matching the CUDA kernel's fp32 accumulators,
  ``rmsnorm.cuh:36,60``), and the scaled write-out; a ``jax.custom_vjp``
  mirrors ``rmsnorm_backward_kernel`` with the (x, residual) gradients treated
  symmetrically (SURVEY §2.9 #13) and without the CUDA backward's extra
  ``+1e-6`` fudge (SURVEY §2.9 #16 — we implement the exact gradient).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from llama32mm_tpu.ops.dispatch import resolve_impl, resolve_impl_prefer_xla


def _rmsnorm_xla(x, weight, eps, residual):
    if residual is not None:
        x = x + residual
    variance = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(variance + jnp.asarray(eps, x.dtype))
    return x * weight


def fused_add_rmsnorm(
    x: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
    residual: Optional[jax.Array] = None,
    impl: str = "auto",
) -> jax.Array:
    """RMS-normalize ``x`` (optionally first adding ``residual``) and scale.

    Args:
      x: ``[..., C]`` activations.
      weight: ``[C]`` scale.
      eps: variance epsilon.
      residual: optional ``[..., C]`` added to ``x`` before normalization
        (the reference's fused "residual highway", ``Model/model.py:271``).
      impl: ``auto`` | ``pallas`` | ``xla``.
    """
    # "auto" routes to XLA at every shape: rmsnorm is pure bandwidth and XLA
    # fuses it into the neighboring matmul prologues; the standalone kernel
    # only re-streams the activations (measured v5e — see ops/swiglu.py note).
    # Explicit impl="pallas" / LLAMA32MM_OPS_IMPL still force the kernel.
    if resolve_impl_prefer_xla(impl) != "pallas":
        return _rmsnorm_xla(x, weight, eps, residual)
    from llama32mm_tpu.ops.pallas.rmsnorm import fused_add_rmsnorm_pallas

    if residual is None:
        residual = jnp.zeros_like(x)  # mirrors RMSNormFunction (Model/model.py:141)
    return fused_add_rmsnorm_pallas(x, weight, residual, eps)


class LLAMARMSNorm:
    """Module-style parity with the reference ``LLAMARMSNorm``
    (``Model/model.py:158-171``): holds the ``[emb_dim]`` scale weight and
    dispatches to the fused op. ``__call__(x, residual=None)`` matches the
    reference forward signature."""

    def __init__(self, emb_dim: int, eps: float = 1e-5, dtype=jnp.float32, impl: str = "auto"):
        self.eps = eps
        self.impl = impl
        self.weight = jnp.ones((emb_dim,), dtype=dtype)

    def __call__(self, x: jax.Array, residual: Optional[jax.Array] = None) -> jax.Array:
        return fused_add_rmsnorm(x, self.weight, self.eps, residual=residual, impl=self.impl)

    forward = __call__
