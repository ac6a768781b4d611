"""GQA attention.

Parity target: ``GroupQueryAttention.forward`` core math
(reference ``Model/model.py:238-254``):

- grouped-query head expansion (``repeat_kv``, ``Model/model.py:124-132``) —
  implemented here as a grouped einsum (numerically identical, no materialized
  head replication);
- **mask-then-scale softmax**: ``softmax((q@kᵀ + mask) / √head_dim)`` — the
  additive mask is applied *before* the √d division (``Model/model.py:249-252``,
  SURVEY §2.9 #3). This deviates from standard scaled-dot-product attention and
  must be preserved for logits parity.

The xla fallback materializes the [Tq, Tk] score matrix (like the reference);
the pallas path is a blockwise flash-style kernel with online softmax that
preserves the same mask-then-scale semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from llama32mm_tpu.ops.dispatch import resolve_impl


def _gqa_attention_xla(q, k, v, mask):
    b, n_q, t_q, hd = q.shape
    n_kv = k.shape[1]
    group = n_q // n_kv
    qg = q.reshape(b, n_kv, group, t_q, hd)
    # scores[b, kv, g, tq, tk]
    scores = jnp.einsum("bkgqd,bkTd->bkgqT", qg, k)
    if mask is not None:
        scores = scores + mask[:, :, None, :, :]
    scale = jnp.asarray(hd, scores.dtype) ** 0.5
    weights = jax.nn.softmax(scores / scale, axis=-1)
    ctx = jnp.einsum("bkgqT,bkTd->bkgqd", weights, v)
    return ctx.reshape(b, n_q, t_q, hd)


def gqa_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    impl: str = "auto",
) -> jax.Array:
    """Grouped-query attention with mask-then-scale softmax.

    Args:
      q: ``[B, n_heads, Tq, head_dim]`` (RoPE already applied).
      k, v: ``[B, n_kv_heads, Tk, head_dim]``.
      mask: optional additive mask ``[B, 1, Tq, Tk]`` (0 = attend,
        -inf / finfo.min = blocked), added to raw scores before scaling.
    Returns: ``[B, n_heads, Tq, head_dim]``.
    """
    impl = resolve_impl(impl)
    if impl == "xla":
        return _gqa_attention_xla(q, k, v, mask)
    from llama32mm_tpu.ops.pallas.attention import gqa_attention_pallas

    return gqa_attention_pallas(q, k, v, mask)
