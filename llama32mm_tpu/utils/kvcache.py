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
    k: jax.Array  # [L, B, n_kv, S_max, hd]
    v: jax.Array  # [L, B, n_kv, S_max, hd]
    pos: jax.Array  # int32 scalar: number of valid entries

    @property
    def max_length(self) -> int:
        return self.k.shape[-2]

    def num_items(self) -> jax.Array:
        """Number of valid cached positions (parity: KVCache.num_items)."""
        return self.pos

    def advance(self, n: int) -> "KVCache":
        return self._replace(pos=self.pos + n)


def init_kv_cache(
    config: LLAMA32Config,
    batch_size: int,
    max_length: Optional[int] = None,
    dtype=None,
) -> KVCache:
    max_length = max_length or config.max_cache_length
    dtype = dtype or config.jnp_dtype
    shape = (config.n_layers, batch_size, config.n_kv_groups, max_length, config.head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype=dtype),
        v=jnp.zeros(shape, dtype=dtype),
        pos=jnp.zeros((), dtype=jnp.int32),
    )


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
