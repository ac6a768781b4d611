"""Rotary position embeddings.

Parity target: ``LLAMARotaryEmbedding`` + ``rotate_half`` +
``apply_rotary_pos_emb`` (reference ``Model/model.py:174-207``):

- inverse frequencies ``base ** (-2i/d)`` computed in fp32;
- ``freqs = position_ids · inv_freq`` in fp32 (the reference wraps this in an
  autocast-disabled region), ``emb = concat(freqs, freqs)``;
- ``cos``/``sin`` cast back to the activation dtype;
- half-split ``rotate_half`` convention.

The reference *stores* the llama-3 frequency-scaling dict but never applies it
(``Model/model.py:61-64`` vs ``:180-183``); ``apply_scaling=True`` implements
the documented intent (standard llama-3.1 wavelength-dependent scaling).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rope_inv_freq(
    head_dim: int,
    base: float,
    scaling: Optional[dict] = None,
) -> jax.Array:
    """fp32 ``[head_dim // 2]`` inverse frequencies."""
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.int64 if jax.config.x64_enabled else jnp.int32)
    inv_freq = 1.0 / (base ** (exponents.astype(jnp.float32) / head_dim))
    if scaling:
        factor = scaling["factor"]
        low = scaling["low_freq_factor"]
        high = scaling["high_freq_factor"]
        orig_ctx = scaling["original_context_length"]
        wavelen = 2.0 * math.pi / inv_freq
        low_wavelen = orig_ctx / low
        high_wavelen = orig_ctx / high
        # llama-3.1 scaling: long wavelengths scaled down by `factor`, short
        # wavelengths untouched, smooth ramp in between.
        smooth = (orig_ctx / wavelen - low) / (high - low)
        scaled = jnp.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
        mid = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
        is_mid = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
        inv_freq = jnp.where(is_mid, mid, scaled)
    return inv_freq


def rope_cos_sin(
    position_ids: jax.Array,
    head_dim: int,
    base: float,
    dtype=jnp.float32,
    scaling: Optional[dict] = None,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for the given positions.

    Args:
      position_ids: ``[B, T]`` int positions.
      head_dim: per-head dimension (rotary dim == head_dim).
    Returns:
      ``(cos, sin)`` each ``[B, T, head_dim]`` in ``dtype``.
    """
    inv_freq = rope_inv_freq(head_dim, base, scaling)
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rotary_pos_emb(
    q: jax.Array,
    k: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Apply RoPE to q/k of shape ``[B, heads, T, head_dim]`` given
    cos/sin ``[B, T, head_dim]`` (broadcast over the head axis, mirroring the
    reference's ``unsqueeze_dim=1``)."""
    cos = cos[:, None, :, :]
    sin = sin[:, None, :, :]
    q_rot = q * cos + rotate_half(q) * sin
    k_rot = k * cos + rotate_half(k) * sin
    return q_rot, k_rot
