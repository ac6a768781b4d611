"""Preallocated HBM KV cache.

TPU-native replacement for the reference ``KVCache``
(``Model/model.py:12-29``), which grows python lists by ``torch.cat`` every
decode step (an O(T) copy per step per layer). Here the cache is a pair of
fixed-capacity stacked arrays updated in place with
``lax.dynamic_update_slice`` — static shapes, so the decode step compiles once
and the update is a pure HBM slot write.

Layout: ``[n_layers, batch, n_kv_heads, max_len, head_dim]``. ``pos`` is the
number of valid entries (the equivalent of ``KVCache.num_items()``,
``Model/model.py:17-20``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from llama32mm_tpu.configs import LLAMA32Config


class KVCache(NamedTuple):
    k: jax.Array  # [L, B, n_kv, S_max, hd] — float, or int8 (quantized mode)
    v: jax.Array  # [L, B, n_kv, S_max, hd]
    pos: jax.Array  # int32 scalar: number of valid entries
    # int8 serving mode: per-(layer, batch, head, position) fp32 scales.
    # The scale algebra folds into attention without materializing a
    # dequantized cache: scores ← (q·k_q) · k_scale[pos] (the per-position
    # scale commutes out of the dot), and v_scale folds into the attention
    # weights before the PV product.
    k_scale: Optional[jax.Array] = None  # [L, B, n_kv, S_max] fp32
    v_scale: Optional[jax.Array] = None

    @property
    def max_length(self) -> int:
        return self.k.shape[-2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    def num_items(self) -> jax.Array:
        """Number of valid cached positions (parity: KVCache.num_items)."""
        return self.pos

    def advance(self, n: int) -> "KVCache":
        return self._replace(pos=self.pos + n)

    def update(self, k: jax.Array, v: jax.Array, layer_idx) -> tuple:
        """Object-API parity with the reference ``KVCache.update(k, v,
        layer_idx)`` (``Model/model.py:22-29``): write the new entries for one
        layer and return that layer's full key/value buffers. Functional
        variant: also returns the updated cache (the reference mutates in
        place; position advance stays with :meth:`advance`, called once per
        step across all layers).

        Returns ``(k_layer [B, n_kv, S_max, hd], v_layer, new_cache)``.
        """
        layer_idx = jnp.asarray(layer_idx, jnp.int32)
        new_k, new_v = update_stacked(self.k, self.v, k, v, layer_idx, self.pos)
        k_layer = jax.lax.dynamic_index_in_dim(new_k, layer_idx, 0, keepdims=False)
        v_layer = jax.lax.dynamic_index_in_dim(new_v, layer_idx, 0, keepdims=False)
        return k_layer, v_layer, self._replace(k=new_k, v=new_v)


def init_kv_cache(
    config: LLAMA32Config,
    batch_size: int,
    max_length: Optional[int] = None,
    dtype=None,
) -> KVCache:
    """``dtype=jnp.int8`` allocates the quantized serving cache (int8 slots +
    fp32 per-position scales — halves cache HBM traffic and capacity)."""
    max_length = max_length or config.max_cache_length
    dtype = dtype or config.jnp_dtype
    shape = (config.n_layers, batch_size, config.n_kv_groups, max_length, config.head_dim)
    quantized = jnp.dtype(dtype) == jnp.int8
    return KVCache(
        k=jnp.zeros(shape, dtype=dtype),
        v=jnp.zeros(shape, dtype=dtype),
        pos=jnp.zeros((), dtype=jnp.int32),
        k_scale=jnp.zeros(shape[:-1], jnp.float32) if quantized else None,
        v_scale=jnp.zeros(shape[:-1], jnp.float32) if quantized else None,
    )


def quantize_kv(x: jax.Array):
    """[..., hd] float → (int8 [..., hd], fp32 scale [...]) — symmetric
    per-position absmax."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1)
    scale = jnp.maximum(absmax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x32 / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def update_layer_cache(
    k_layer: jax.Array,  # [B, n_kv, S_max, hd]
    v_layer: jax.Array,
    k_new: jax.Array,  # [B, n_kv, T, hd]
    v_new: jax.Array,
    pos: jax.Array,  # int32 scalar: write offset
):
    """Write T new entries at ``pos`` (the equivalent of ``KVCache.update``,
    ``Model/model.py:22-29``, minus the concat)."""
    k_layer = jax.lax.dynamic_update_slice(k_layer, k_new.astype(k_layer.dtype), (0, 0, pos, 0))
    v_layer = jax.lax.dynamic_update_slice(v_layer, v_new.astype(v_layer.dtype), (0, 0, pos, 0))
    return k_layer, v_layer


def update_stacked(
    k_all: jax.Array,  # [L, B, n_kv, S_max, hd] stacked cache
    v_all: jax.Array,
    k_new: jax.Array,  # [B, n_kv, T, hd]
    v_new: jax.Array,
    layer_idx: jax.Array,  # int32 scalar
    pos: jax.Array,  # int32 scalar write offset, or [B] per-row offsets (T=1)
):
    """One layer's slot write into the stacked cache — the single code path
    shared by ``KVCache.update`` and the decoder's layer scan
    (``models/language.py::_block_forward``).

    ``pos`` may be a ``[B]`` vector (continuous-batching decode: every slot
    sits at its own fill level); row ``b``'s ``T`` entries land at
    ``pos[b] .. pos[b]+T-1`` via one XLA scatter per layer instead of a
    contiguous slice write (T > 1 is the batched speculative-verify path).
    """
    pos = jnp.asarray(pos)
    if pos.ndim == 1:
        b, _, t, _ = k_new.shape
        b_idx = jnp.arange(b)[:, None]  # [B, 1]
        t_idx = pos[:, None] + jnp.arange(t)[None, :]  # [B, T]
        # advanced indices separated by ':' move to the front: target slice is
        # [B, T, n_kv, hd] — transpose the update to match
        k_all = k_all.at[layer_idx, b_idx, :, t_idx, :].set(
            k_new.astype(k_all.dtype).transpose(0, 2, 1, 3)
        )
        v_all = v_all.at[layer_idx, b_idx, :, t_idx, :].set(
            v_new.astype(v_all.dtype).transpose(0, 2, 1, 3)
        )
        return k_all, v_all
    k_all = jax.lax.dynamic_update_slice(
        k_all, k_new[None].astype(k_all.dtype), (layer_idx, 0, 0, pos, 0)
    )
    v_all = jax.lax.dynamic_update_slice(
        v_all, v_new[None].astype(v_all.dtype), (layer_idx, 0, 0, pos, 0)
    )
    return k_all, v_all


def update_stacked_scales(
    s_all: jax.Array,  # [L, B, n_kv, S_max] fp32 per-position scales
    s_new: jax.Array,  # [B, n_kv, T]
    layer_idx: jax.Array,
    pos: jax.Array,  # int32 scalar, or [B] per-row offsets (T=1)
):
    """int8-KV scale write mirroring :func:`update_stacked`."""
    pos = jnp.asarray(pos)
    if pos.ndim == 1:
        b, _, t = s_new.shape
        b_idx = jnp.arange(b)[:, None]
        t_idx = pos[:, None] + jnp.arange(t)[None, :]
        return s_all.at[layer_idx, b_idx, :, t_idx].set(s_new.transpose(0, 2, 1))
    return jax.lax.dynamic_update_slice(s_all, s_new[None], (layer_idx, 0, 0, pos))
