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

Masks come in two forms:

- **dense** additive ``[B, 1, Tq, Tk]`` (reference semantics, parity path);
- **structured**: ``AttnMask(kv_valid [B, Tk], q_offset)`` — per-key validity
  plus the absolute position of query row 0, from which causal masking is
  derived. The Pallas flash kernel requires the structured form (a dense mask
  would be re-streamed per head and dominate HBM traffic); both forms produce
  identical probabilities (blocked positions underflow to exactly 0 in fp32).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from llama32mm_tpu.ops.dispatch import resolve_impl


class AttnMask(NamedTuple):
    """Structured attention mask: which key slots are valid, and the absolute
    position of the first query row (for causal masking)."""

    kv_valid: jax.Array  # [B, Tk] bool/int
    q_offset: jax.Array  # scalar int32


def dense_from_structured(
    mask: AttnMask, tq: int, tk: int, dtype, causal: bool = True
) -> jax.Array:
    """Materialize the additive ``[B, 1, Tq, Tk]`` mask with reference
    semantics: ``finfo.min`` on invalid keys (padding term,
    Model/model.py:319) + ``-inf`` on acausal positions (:315-318)."""
    add = jnp.where(
        mask.kv_valid.astype(bool), jnp.asarray(0.0, dtype), jnp.finfo(dtype).min
    )[:, None, None, :]
    if causal:
        qoff = jnp.asarray(mask.q_offset, jnp.int32)
        kpos = jnp.arange(tk)[None, :]
        if qoff.ndim == 0:
            qpos = qoff + jnp.arange(tq)[:, None]
            c = jnp.where(kpos > qpos, -jnp.inf, 0.0).astype(dtype)[None, None]
        else:
            # per-row query offsets (ragged batch): [B, tq, tk] causal term
            qpos = qoff[:, None, None] + jnp.arange(tq)[None, :, None]
            c = jnp.where(kpos[None] > qpos, -jnp.inf, 0.0).astype(dtype)[:, None]
        add = add + c
    return add


def _gqa_attention_xla(q, k, v, mask, k_scale=None, v_scale=None):
    b, n_q, t_q, hd = q.shape
    n_kv = k.shape[1]
    group = n_q // n_kv
    qg = q.reshape(b, n_kv, group, t_q, hd)
    scores = jnp.einsum("bkgqd,bkTd->bkgqT", qg, k.astype(q.dtype))
    if k_scale is not None:
        # int8 KV: per-position key scale commutes out of the dot —
        # q·(k_q·s) == (q·k_q)·s; applied BEFORE the additive mask so masked
        # slots keep the reference's exact -inf/finfo.min semantics.
        scores = (scores.astype(jnp.float32) * k_scale[:, :, None, None, :]).astype(scores.dtype)
    if mask is not None:
        scores = scores + mask[:, :, None, :, :]
    scale = jnp.asarray(hd, scores.dtype) ** 0.5
    weights = jax.nn.softmax(scores / scale, axis=-1)
    if v_scale is not None:
        # fold the per-position value scale into the attention weights:
        # Σ w·(v_q·s) == Σ (w·s)·v_q
        weights = (weights.astype(jnp.float32) * v_scale[:, :, None, None, :]).astype(weights.dtype)
    ctx = jnp.einsum("bkgqT,bkTd->bkgqd", weights, v.astype(q.dtype))
    return ctx.reshape(b, n_q, t_q, hd)


def gqa_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    structured: Optional[AttnMask] = None,
    causal: bool = True,
    impl: str = "auto",
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Grouped-query attention with mask-then-scale softmax.

    Args:
      q: ``[B, n_heads, Tq, head_dim]`` (RoPE already applied).
      k, v: ``[B, n_kv_heads, Tk, head_dim]``.
      mask: optional dense additive mask ``[B, 1, Tq, Tk]``.
      structured: optional ``AttnMask``; preferred on the Pallas path.
        When both are given, ``mask`` wins on the XLA path and ``structured``
        on the Pallas path (they must describe the same constraint).
    Returns: ``[B, n_heads, Tq, head_dim]``.
    """
    tq, tk = q.shape[2], k.shape[2]

    # Measured on v5e (28-layer 3B tower): XLA's dense attention beats the
    # flash kernel at short context (1.8k: 56.5 vs 82.4 ms; 4.6k: 298 vs
    # 331 ms), they tie at 8k (757 vs 747 ms), and beyond that the O(Tq·Tk)
    # fp32 score materialization stops fitting HBM next to the weights — so
    # "auto" switches to flash from 8k. An EXPLICIT impl="pallas" always
    # forces the flash kernel (debug/parity contract, same as the other
    # ops). Decode (Tq == 1) is a pure-bandwidth matvec either way and stays
    # on XLA. int8-KV per-position scales fold in on both paths.
    forced_pallas = impl == "pallas"
    impl = resolve_impl(impl)
    use_flash = impl == "pallas" and tq > 1 and (forced_pallas or tk >= 8192)
    if structured is not None and jnp.asarray(structured.q_offset).ndim != 0:
        # per-row query offsets (ragged batch) — the flash kernel takes one
        # scalar q_offset per call; densify instead
        use_flash = False

    if not use_flash:
        if mask is None and structured is not None:
            mask = dense_from_structured(structured, tq, tk, q.dtype, causal)
        return _gqa_attention_xla(q, k, v, mask, k_scale, v_scale)

    if structured is None:
        if mask is not None:
            # Dense-only mask: no structure to exploit — XLA fallback.
            return _gqa_attention_xla(q, k, v, mask, k_scale, v_scale)
        structured = AttnMask(
            kv_valid=jnp.ones((q.shape[0], tk), jnp.int32),
            q_offset=jnp.asarray(0, jnp.int32),
        )

    from llama32mm_tpu.ops.pallas.attention import flash_gqa_attention

    return flash_gqa_attention(
        q, k, v, structured.kv_valid, structured.q_offset, causal=causal,
        k_scale=k_scale, v_scale=v_scale,
    )
